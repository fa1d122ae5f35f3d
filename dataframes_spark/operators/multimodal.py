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


_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp", T.ArrayType(T.IntegerType()), True),
    ]
)

#: perceptual fingerprints are 64 bits carried as 8 byte-values — the
#: byte IS the Hamming band (see `phash_bands`), and byte-array form
#: sidesteps signed-64-bit pitfalls in cross-engine replay.
PHASH_BYTES = 8


def image_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    fake: bool = False,
    method: str = "dhash",
) -> DataFrame:
    """Model-free perceptual image fingerprints — the near-exact image
    dedup key of the published multimodal pipelines (LAION-5B dedups
    crawled images by perceptual hash before any embedding pass;
    Schuhmann et al. 2022): ``(media_id, fp)`` where ``fp`` is the
    64-bit hash as 8 byte-values.

    Real lane (used when Pillow imports):

    - ``dhash`` (difference hash, Krawetz 2013): grayscale, bilinear
      9x8 resize, bit = left pixel brighter than its right neighbour,
      one byte per row — robust to rescale/recompress, the standard
      near-exact key;
    - ``ahash`` (average hash): 8x8 resize, bit = pixel above mean.

    Undecodable blobs yield NULL fingerprints (corpus-scale corruption
    is data, not an error). ``fake=True`` forces the deterministic
    stand-in (digest bytes 8..16 of sha256(payload)) that exercises
    the identical Arrow-batched mapInPandas plan and is exactly
    replayable in SQL (the `decode_image` fake-lane contract) — used
    by the hash-verified driver row.

    Scale: map-only over the blob scan; downstream dedup never touches
    payloads again (8 bytes/image ride the shuffles)."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"method must be dhash|ahash, got {method!r}")
    if not fake:
        if not _has("PIL"):
            raise NotImplementedError(
                "perceptual hashing needs Pillow (pip install pillow); "
                "pass fake=True for the deterministic stand-in"
            )

        def _hash_real(batches: Iterator) -> Iterator:
            import io

            import pandas as pd
            from PIL import Image

            for pdf in batches:
                out = {"media_id": [], "fp": []}
                for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                    out["media_id"].append(mid)
                    try:
                        if blob is None:
                            raise ValueError("null payload")
                        with Image.open(io.BytesIO(bytes(blob))) as img:
                            if method == "dhash":
                                g = img.convert("L").resize(
                                    (9, 8), Image.BILINEAR
                                )
                                px = g.load()
                                fp = [
                                    sum(
                                        (px[x, y] > px[x + 1, y]) << (7 - x)
                                        for x in range(8)
                                    )
                                    for y in range(8)
                                ]
                            else:
                                g = img.convert("L").resize(
                                    (8, 8), Image.BILINEAR
                                )
                                px = g.load()
                                vals = [
                                    px[x, y]
                                    for y in range(8)
                                    for x in range(8)
                                ]
                                mean = sum(vals) / 64.0
                                fp = [
                                    sum(
                                        (px[x, y] > mean) << (7 - x)
                                        for x in range(8)
                                    )
                                    for y in range(8)
                                ]
                        out["fp"].append(fp)
                    except Exception:
                        out["fp"].append(None)
                yield pd.DataFrame(out)

        return df.select(id_col, payload_col).mapInPandas(
            _hash_real, schema=_HASH_SCHEMA
        )

    def _hash_fake(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "fp": []}
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                if blob is None:
                    out["fp"].append(None)
                    continue
                h = hashlib.sha256(bytes(blob)).digest()
                out["fp"].append([int(b) for b in h[8:16]])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        _hash_fake, schema=_HASH_SCHEMA
    )


def hamming_distance(a, b):
    """Hamming distance between two byte-array fingerprints as one JVM
    expression: per-byte XOR popcount, summed."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def phash_bands(
    fps: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "fp",
    band_bytes: int = 2,
) -> DataFrame:
    """``(id, band, bucket, fp)`` Hamming banding of a fingerprint
    relation: the 8 fingerprint bytes split into ``8 // band_bytes``
    bands, the band's bytes concatenated into one integer bucket.
    Pigeonhole recall guarantee: two fingerprints within Hamming
    distance ``d < 8 / band_bytes`` touch at most d bytes, hence at
    most d bands, leaving at least one band they AGREE on — banded
    candidate generation misses nothing up to that distance.

    ``band_bytes`` is the standard LSH width/recall dial, and it is
    what keeps candidate volume sane as the corpus grows — bucket
    POPULATIONS scale with N / #buckets, so candidate pairs scale with
    N^2 / #buckets:

    - ``1`` — 8 bands of 256 buckets: recall to d <= 7, but each bucket
      holds ~N/256 images — quadratic candidate blowup beyond small
      corpora (the sf1 spot-bench measured it); verification lanes
      and small batches only;
    - ``2`` (default) — 4 bands of 65 536 buckets: recall to d <= 3,
      the near-exact band production image dedup uses;
    - ``4`` — 2 bands of 2^32 buckets: recall to d <= 1,
      the web-scale exact/near-exact setting.

    NULL fingerprints (undecodable blobs) produce no bands: an
    unhashable image can never be anyone's duplicate (fail-closed, the
    zero-norm screening precedent). Carrying ``fp`` on every band row
    is what lets the incremental join verify distance INLINE — no
    fetch-back join against the corpus (cheaper than the LSH-store
    contract, where verification needs the text)."""
    if band_bytes not in (1, 2, 4):
        raise ValueError(f"band_bytes must be 1, 2 or 4, got {band_bytes}")
    n_bands = PHASH_BYTES // band_bytes

    def bucket_of(i):
        b = F.col(fp_col)[(i * band_bytes).cast("int")].cast("long")
        for j in range(1, band_bytes):
            b = b * 256 + F.col(fp_col)[(i * band_bytes + j).cast("int")]
        return b

    return fps.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    bucket_of(i).alias("bucket"),
                ),
            )
        ).alias("bb"),
        F.col(fp_col).alias("fp"),
    ).select("id", "bb.band", "bb.bucket", "fp")


def phash_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "fp",
    max_distance: int = 3,
    band_bytes: int = 2,
) -> DataFrame:
    """Near-duplicate image pairs: banded candidate generation (ONE
    shuffle — the `_bucket_pair_expand` machinery the minhash/simhash
    lanes share), then exact Hamming verification on the 8-byte
    fingerprints joined back. Returns ``(id_a, id_b, distance)`` with
    ``id_a < id_b`` and ``distance <= max_distance``.

    ``max_distance`` must stay below ``8 / band_bytes`` — that is the
    banding's recall guarantee (see `phash_bands`, including the
    width-vs-candidate-volume dial); beyond it candidates would
    silently miss pairs, so the bound is enforced, not documented
    away."""
    limit = PHASH_BYTES // band_bytes if band_bytes in (1, 2, 4) else 0
    if not 0 <= max_distance < limit:
        raise ValueError(
            f"max_distance must be in [0, {max(limit - 1, 0)}] for the "
            f"{limit}-band pigeonhole guarantee at band_bytes="
            f"{band_bytes}, got {max_distance}"
        )
    from dataframes_spark.operators.dedup import _bucket_pair_expand

    slim = fps.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
    )
    cand = _bucket_pair_expand(
        phash_bands(slim, "id", "fp", band_bytes).select(
            "id", "band", "bucket"
        )
    )
    return (
        cand.join(slim.select(F.col("id").alias("id_a"), F.col("fp").alias("__fa")), "id_a")
        .join(slim.select(F.col("id").alias("id_b"), F.col("fp").alias("__fb")), "id_b")
        .select(
            "id_a",
            "id_b",
            hamming_distance(F.col("__fa"), F.col("__fb")).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def phash_incremental(
    new_fps: DataFrame,
    store: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "fp",
    max_distance: int = 3,
    band_bytes: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Incremental perceptual near-dup detection: which arriving images
    look like something already seen — without re-banding history.
    ``store`` is a persisted `phash_bands` relation. Returns
    ``(candidates, updated_store)``: ``candidates`` are VERIFIED
    ``(id_new, id_seen, distance)`` pairs (distance <= max_distance;
    ``id_seen`` is a stored image sharing a band bucket, or an earlier
    smaller-id batch image — the in-batch rule mirrors `exact_dedup`'s
    min-id representative); ``updated_store`` adds the batch's bands.

    Scale shape (the `near_dup_incremental` contract): the batch bands
    map-only, then ONE equi-join on ``(band, bucket)`` against the
    store — persisted bucketed on those keys, history never reshuffles;
    per-batch cost is O(batch + colliding buckets) regardless of store
    size. Because the store rows carry the 8-byte fingerprint,
    verification happens INSIDE the join — no corpus fetch-back.
    ``band_bytes`` must match the persisted store's banding (the
    caller owns keeping it constant across increments — the LSH-store
    configuration contract)."""
    limit = PHASH_BYTES // band_bytes if band_bytes in (1, 2, 4) else 0
    if not 0 <= max_distance < limit:
        raise ValueError(
            f"max_distance must be in [0, {max(limit - 1, 0)}] for the "
            f"{limit}-band pigeonhole guarantee at band_bytes="
            f"{band_bytes}, got {max_distance}"
        )
    from dataframes_spark.operators.dedup import _bucket_pair_expand

    slim = new_fps.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
    )
    fresh = phash_bands(slim, "id", "fp", band_bytes)
    in_batch = (
        _bucket_pair_expand(fresh.select("id", "band", "bucket"))
        .join(slim.select(F.col("id").alias("id_a"), F.col("fp").alias("__fa")), "id_a")
        .join(slim.select(F.col("id").alias("id_b"), F.col("fp").alias("__fb")), "id_b")
        .select(
            F.col("id_b").alias("id_new"),
            F.col("id_a").alias("id_seen"),
            hamming_distance(F.col("__fa"), F.col("__fb")).alias("distance"),
        )
    )
    vs_store = (
        fresh.alias("n")
        .join(store.alias("s"), ["band", "bucket"])
        .filter(F.col("n.id") != F.col("s.id"))
        .select(
            F.col("n.id").alias("id_new"),
            F.col("s.id").alias("id_seen"),
            hamming_distance(F.col("n.fp"), F.col("s.fp")).alias("distance"),
        )
    )
    candidates = (
        in_batch.unionByName(vs_store)
        .filter(F.col("distance") <= max_distance)
        # candidate-pair-sized distinct: collapses multi-band collisions
        .distinct()
    )
    return candidates, store.unionByName(fresh)


def image_dedup_report(
    fps: DataFrame,
    quality: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "fp",
    quality_col: str = "n_pixels",
    max_distance: int = 3,
    band_bytes: int = 2,
) -> DataFrame:
    """Near-exact image dedup end-to-end (the LAION-style pass):
    Hamming-banded candidate pairs (`phash_pairs`), connected
    components over the verified pairs (duplicate closures — A~B and
    B~C must resolve together, the text near-dup contract), and the
    QUALITY-AWARE keep rule: within each cluster the highest-quality
    image survives (``quality_col`` descending — pixel count by
    default, the `dedup_best_quality` precedent), ties to the smallest
    id. Returns every CLUSTERED image as ``(id, cluster, quality,
    keep)``; unclustered images are not duplicates of anything and
    are implicitly kept (join the report back `left` and treat NULL
    as keep — the slim report never carries the whole corpus).

    Scale shape: pairs are banded (one shuffle) + verified; the
    closure runs on the pair-sized edge relation
    (`graph.connected_components` — cap-gated driver union-find for
    small edge sets, label-propagation beyond); the keep rank is one
    window over the cluster-sized relation. Quality joins by id —
    fingerprints never carry payload bytes."""
    from pyspark.sql import Window as W

    from dataframes_spark.operators.graph import connected_components

    pairs = phash_pairs(fps, id_col, fp_col, max_distance, band_bytes)
    comp = connected_components(pairs, "id_a", "id_b")
    scored = comp.join(
        quality.select(
            F.col(id_col).alias("id"), F.col(quality_col).alias("__q")
        ),
        "id",
        "left",
    )
    w = W.partitionBy("component").orderBy(
        F.col("__q").desc_nulls_last(), F.col("id").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("cluster"),
            F.col("__q").alias(quality_col),
            (F.col("__rk") == 1).cast("int").alias("keep"),
        )
    )
