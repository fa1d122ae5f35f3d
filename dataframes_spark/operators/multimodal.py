"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media payloads are ``binary`` columns with a struct of metadata
(mime, width/height/duration, codec). Decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas`` —
the one place Python is the right tool, because the work is per-blob CPU,
not relational. Batches stream through Arrow, so executor memory holds a
batch of blobs, never a partition of decoded frames.

Decoder resolution (per call, on the driver, so errors are early and
actionable): ``fake=True`` always runs the deterministic stand-in
decoder (hash-derived dimensions) that exercises the full Spark
plumbing — schema, batching, partitioning — end to end. Otherwise the
REAL lane is used when its library imports (Pillow for images,
soundfile for audio); when neither is possible, NotImplementedError
names the missing library and the ``fake=True`` escape hatch. In the
real lanes a blob that fails to decode yields NULL outputs for that row
rather than failing the job — at corpus scale some payloads are always
corrupt, and a decode task retry cannot fix a bad blob.

Scale notes:
- blobs ride in the same parquet row-group as their metadata; filters on
  metadata prune row groups WITHOUT reading blob bytes (parquet column
  pruning), so "select 224x224 jpegs" never touches pixels;
- ``maxRecordsPerBatch`` bounds Arrow batch memory when blobs are large;
- repartition by a size-aware key before heavy decode so AQE can balance
  skewed blob sizes.
"""

from __future__ import annotations

import importlib.util
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


def _has(module: str) -> bool:
    """True when ``module`` is importable (checked on the driver so the
    user gets an immediate, named error instead of a task-time failure;
    local and cluster Python envs are assumed to match, the standard
    PySpark deployment contract)."""
    try:
        return importlib.util.find_spec(module) is not None
    except (ImportError, ValueError):
        return False


def decode_image(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", *, fake: bool = False) -> DataFrame:
    """Decode image blobs to (dimensions, feature vector) via mapInPandas.

    Real lane (used when Pillow imports): decodes each blob with
    ``PIL.Image``, returning true width/height/n_pixels and an 8-dim
    feature — per-channel RGB mean and std (scaled to [0,1]), aspect
    ratio, and log10(n_pixels) — enough for downstream similarity /
    quality gates without shipping pixels. Undecodable blobs yield NULLs.

    ``fake=True`` forces the deterministic stand-in decoder (derives
    dimensions and an 8-dim feature from the blob hash), which exercises
    the identical Spark plan: Arrow batch in, Arrow batch out.
    """
    if not fake:
        if not _has("PIL"):
            raise NotImplementedError(
                "image decoding needs Pillow (pip install pillow) or "
                "opencv; pass fake=True for the deterministic stand-in "
                "decoder"
            )

        def _decode_real(batches: Iterator) -> Iterator:
            import io
            import math

            import numpy as np
            import pandas as pd
            from PIL import Image

            for pdf in batches:
                out = {"media_id": [], "width": [], "height": [], "n_pixels": [], "feature": []}
                for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                    out["media_id"].append(mid)
                    try:
                        if blob is None:
                            raise ValueError("null payload")
                        with Image.open(io.BytesIO(bytes(blob))) as img:
                            w, ht = img.size
                            arr = np.asarray(img.convert("RGB"), dtype=np.float64) / 255.0
                        means = arr.mean(axis=(0, 1))
                        stds = arr.std(axis=(0, 1))
                        out["width"].append(w)
                        out["height"].append(ht)
                        out["n_pixels"].append(w * ht)
                        out["feature"].append(
                            [float(x) for x in means]
                            + [float(x) for x in stds]
                            + [w / ht if ht else 0.0, math.log10(max(w * ht, 1))]
                        )
                    except Exception:
                        out["width"].append(None)
                        out["height"].append(None)
                        out["n_pixels"].append(None)
                        out["feature"].append(None)
                yield pd.DataFrame(out)

        return df.select(id_col, payload_col).mapInPandas(_decode_real, schema=_DECODE_SCHEMA)

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

    Real lane (used when Pillow imports): decode, bilinear-resize to
    ``target`` square, re-encode as PNG. Undecodable blobs yield NULLs.
    ``fake=True`` forces a deterministic stand-in (payload truncated/
    cycled to a target-derived length) that exercises the identical
    Arrow-batched plan — binary in, binary out, bounded batch memory."""
    if not fake:
        if not _has("PIL"):
            raise NotImplementedError(
                "image resize needs Pillow (pip install pillow) or "
                "opencv; pass fake=True for the deterministic stand-in"
            )

        def _resize_real(batches: Iterator) -> Iterator:
            import io

            import pandas as pd
            from PIL import Image

            for pdf in batches:
                out = {"media_id": [], "payload": [], "width": [], "height": []}
                for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                    out["media_id"].append(mid)
                    try:
                        if blob is None:
                            raise ValueError("null payload")
                        with Image.open(io.BytesIO(bytes(blob))) as img:
                            resized = img.convert("RGB").resize(
                                (target, target), Image.BILINEAR
                            )
                        buf = io.BytesIO()
                        resized.save(buf, format="PNG")
                        out["payload"].append(buf.getvalue())
                        out["width"].append(target)
                        out["height"].append(target)
                    except Exception:
                        out["payload"].append(None)
                        out["width"].append(None)
                        out["height"].append(None)
                yield pd.DataFrame(out)

        return df.select(id_col, payload_col).mapInPandas(_resize_real, schema=_RESIZE_SCHEMA)

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

    Real lane (used when soundfile imports): reads each blob with
    ``soundfile`` (WAV/FLAC/OGG...), returning the true sample rate,
    frame count, duration, and RMS over all channels (soundfile decodes
    to float in [-1, 1], so RMS is already normalized). Undecodable
    blobs yield NULLs.

    ``fake=True`` forces the deterministic stand-in: the payload bytes
    ARE the 8-bit PCM signal (sample rate from the blob hash), so
    n_samples, duration and RMS are exact arithmetic any engine could
    replicate — the plan (binary in, numeric batch out, bounded memory)
    is identical to the real decoder's."""
    if not fake:
        if not _has("soundfile"):
            raise NotImplementedError(
                "audio decoding needs soundfile (pip install soundfile) "
                "or librosa; pass fake=True for the deterministic "
                "stand-in"
            )

        def _decode_real(batches: Iterator) -> Iterator:
            import io
            import math

            import numpy as np
            import pandas as pd
            import soundfile as sf

            for pdf in batches:
                out = {
                    "media_id": [], "sample_rate": [], "n_samples": [],
                    "duration_ms": [], "rms": [],
                }
                for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                    out["media_id"].append(mid)
                    try:
                        if blob is None:
                            raise ValueError("null payload")
                        data, sr = sf.read(io.BytesIO(bytes(blob)), dtype="float64")
                        frames = int(data.shape[0])
                        out["sample_rate"].append(int(sr))
                        out["n_samples"].append(frames)
                        out["duration_ms"].append(1000.0 * frames / sr)
                        out["rms"].append(
                            float(math.sqrt(np.mean(np.square(data)))) if frames else 0.0
                        )
                    except Exception:
                        for k in ("sample_rate", "n_samples", "duration_ms", "rms"):
                            out[k].append(None)
                yield pd.DataFrame(out)

        return df.select(id_col, payload_col).mapInPandas(_decode_real, schema=_AUDIO_SCHEMA)

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
