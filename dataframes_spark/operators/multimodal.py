"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media payloads are ``binary`` columns with a struct of metadata
(mime, width/height/duration, codec). Decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas`` —
the one place Python is the right tool, because the work is per-blob CPU,
not relational. Batches stream through Arrow, so executor memory holds a
batch of blobs, never a partition of decoded frames.

The decode step itself is STUBBED here (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (hash-derived
dimensions) exercises the full Spark plumbing — schema, batching,
partitioning — end to end.

Scale notes:
- blobs ride in the same parquet row-group as their metadata; filters on
  metadata prune row groups WITHOUT reading blob bytes (parquet column
  pruning), so "select 224x224 jpegs" never touches pixels;
- ``maxRecordsPerBatch`` bounds Arrow batch memory when blobs are large;
- repartition by a size-aware key before heavy decode so AQE can balance
  skewed blob sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def media_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    """Canonical multimodal table schema: (id, payload, meta)."""
    return T.StructType(
        [
            T.StructField("media_id", id_type, False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META, True),
        ]
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", *, fake: bool = False) -> DataFrame:
    """Decode image blobs to (dimensions, feature vector) via mapInPandas.

    Real decoding requires an image library not present in this container —
    pass ``fake=True`` to run the deterministic stand-in decoder (derives
    dimensions and an 8-dim feature from the blob hash), which exercises
    the identical Spark plan: Arrow batch in, Arrow batch out.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding needs PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stand-in decoder"
        )

    def _decode(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_pixels": [], "feature": []}
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                if blob is None:
                    out["media_id"].append(mid)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_pixels"].append(None)
                    out["feature"].append(None)
                    continue
                h = hashlib.sha256(bytes(blob)).digest()
                w = 64 + h[0] % 192
                ht = 64 + h[1] % 192
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(ht)
                out["n_pixels"].append(w * ht)
                out["feature"].append([float(b) / 255.0 for b in h[:8]])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_DECODE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    target: int = 224,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    fake: bool = False,
) -> DataFrame:
    """Resize image blobs to ``target`` x ``target`` via mapInPandas.

    Real resizing needs PIL/opencv (not in this container); ``fake=True``
    runs a deterministic stand-in (payload truncated/cycled to a
    target-derived length) that exercises the identical Arrow-batched
    plan — binary in, binary out, bounded batch memory."""
    if not fake:
        raise NotImplementedError(
            "image resize needs PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stand-in"
        )

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        n_bytes = target * 4  # stand-in: side-proportional payload
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                if blob is None:
                    out["payload"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    continue
                b = bytes(blob)
                scaled = (b * (n_bytes // max(len(b), 1) + 1))[:n_bytes]
                out["payload"].append(scaled)
                out["width"].append(target)
                out["height"].append(target)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(_resize, schema=_RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: compute target frame timestamps from
    metadata only (no payload read), ready to feed a decoder. Shows the
    prune-before-decode pattern: the explode runs on metadata; payloads
    join back only for rows that survived."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 37 + j * 11) % 256 for j in range(128 + i))
        rows.append((i, payload, ("image/png", None, None, 5000 + i * 250, "png")))
    return spark.createDataFrame(rows, media_schema())


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    fake: bool = False,
) -> DataFrame:
    """Decode audio blobs to (sample_rate, n_samples, duration, RMS
    energy) via mapInPandas — the audio lane of the multimodal family,
    same Arrow-batched plumbing as ``decode_image``.

    Real decoding needs soundfile/librosa (not in this container);
    ``fake=True`` runs the deterministic stand-in: the payload bytes ARE
    the 8-bit PCM signal (sample rate from the blob hash), so n_samples,
    duration and RMS are exact arithmetic any engine could replicate —
    the plan (binary in, numeric batch out, bounded memory) is identical
    to the real decoder's."""
    if not fake:
        raise NotImplementedError(
            "audio decoding needs soundfile/librosa (not in this "
            "container); pass fake=True for the deterministic stand-in"
        )

    def _decode(batches: Iterator) -> Iterator:
        import hashlib
        import math

        import pandas as pd

        rates = (8000, 16000, 22050, 44100)
        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "rms": [],
            }
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                if blob is None:
                    for k in ("sample_rate", "n_samples", "duration_ms", "rms"):
                        out[k].append(None)
                    continue
                b = bytes(blob)
                sr = rates[hashlib.sha256(b).digest()[0] % 4]
                n = len(b)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_ms"].append(1000.0 * n / sr)
                out["rms"].append(
                    math.sqrt(sum((x - 128.0) ** 2 for x in b) / n) / 128.0
                    if n
                    else 0.0
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_AUDIO_SCHEMA)
