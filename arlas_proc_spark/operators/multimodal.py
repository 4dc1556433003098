"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side contract (real and tested): media rows are
``(id, media_type, payload binary, meta struct)``; decode / feature
extraction run as Arrow-batched ``mapInPandas`` so each task streams
record batches and never materializes a partition of blobs. Codec calls
go through ``decoder=``/``resizer=`` hooks: ``real_decoder`` /
``real_resizer`` use Pillow when importable (env-gated tests — Pillow is
not bundled in this container), ``deterministic_fake_*`` keep the
pipeline runnable + exactly testable everywhere; swapping the callable
never changes the plan shape.

Partitioning guidance at 100 TB: blobs dominate bytes — repartition by a
size-balanced key (e.g. pmod(hash(id), N)) BEFORE the decode stage,
keep maxPartitionBytes low for blob tables, and project metadata columns
without touching payload (Parquet column pruning keeps blob IO zero for
metadata-only queries — verified in tests via ReadSchema).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
])

FEATURE_DIM = 8


def pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def real_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Real image decode when Pillow is importable (it is not bundled in
    this container — tests env-gate on ``pillow_available()``, the same
    pattern as the protobuf-gated transformWithStateInPandas twin):
    decode → grayscale → mean-pool FEATURE_DIM horizontal strips into a
    fixed-dim feature. Audio/video codecs (torchaudio/pyav) are not
    bundled anywhere this runs; those media types raise — callers that
    need the pipeline runnable without codecs pass
    ``decoder=deterministic_fake_decoder``."""
    if media_type != "image":
        raise NotImplementedError(
            f"no {media_type} codec is bundled (torchaudio/pyav); pass "
            f"decoder=deterministic_fake_decoder or a real codec")
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "Pillow is not installed in this environment; pass "
            "decoder=deterministic_fake_decoder or install Pillow") from None
    img = Image.open(io.BytesIO(bytes(payload or b""))).convert("L")
    a = np.asarray(img, dtype=np.float64) / 255.0
    if a.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    strips = np.array_split(a, FEATURE_DIM, axis=0)
    return np.array([s.mean() if s.size else 0.0 for s in strips],
                    dtype=np.float64)


def deterministic_fake_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Stands in for decode+embed: an 8-dim feature derived from the blob's
    sha256 — deterministic, so tests can assert exact values."""
    h = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(h[:FEATURE_DIM * 4], dtype=np.uint32)
            .astype(np.float64) / 2**32)


def make_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 8
        rows.append((i, mt, bytearray(payload),
                     64 + i % 8 if mt == "image" else None,
                     48 + i % 8 if mt == "image" else None,
                     float(i % 30) if mt != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame,
                     decoder: Callable[[bytes, str], np.ndarray] = real_decoder,
                     batch_hint: int = 256) -> DataFrame:
    """payload → fixed-dim feature vector via mapInPandas (Arrow batches).

    Output: media_id, media_type, feature array<double>, payload_sha256.
    The kernel sees pandas batches — one Python call per ~batch_hint rows,
    never per row."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("payload_sha256", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, t).tolist()
                     for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
                "payload_sha256": [
                    hashlib.sha256(bytes(p or b"")).hexdigest()
                    for p in pdf["payload"]],
            })

    return df.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema=out_schema)


def real_resizer(payload: bytes, w0: int | None, h0: int | None,
                 w: int, h: int) -> bytes:
    """Real image resize when Pillow is importable (env-gated like
    ``real_decoder``): decode → bilinear resize to (w, h) → re-encode
    PNG. PNG encoding is deterministic for a given Pillow version, so
    replays produce identical bytes."""
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "Pillow is not installed in this environment; pass "
            "resizer=deterministic_fake_resizer or install "
            "Pillow") from None
    img = Image.open(io.BytesIO(bytes(payload or b"")))
    out = io.BytesIO()
    img.resize((w, h), Image.BILINEAR).save(out, format="PNG")
    return out.getvalue()


def deterministic_fake_resizer(payload: bytes, w0: int | None,
                               h0: int | None, w: int, h: int) -> bytes:
    """Stands in for decode→resize→re-encode: output bytes derived from
    (payload sha256, target dims), length scaled to the target area —
    deterministic so tests can assert exact bytes and realistic in that
    output size tracks target resolution."""
    seed = hashlib.sha256(
        (payload or b"") + f"|{w}x{h}".encode()).digest()
    n = max(w * h // 64, 32)
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  resizer: Callable[..., bytes] = real_resizer) -> DataFrame:
    """Resize the image rows' payloads to (target_w, target_h) via
    Arrow-batched ``mapInPandas``; non-image rows pass through untouched
    with their original payload and metadata. Width/height metadata are
    updated to the target on image rows — the plan/schema/partitioning is
    the production shape, only the codec callable is stubbed."""
    out_schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            payloads = []
            for img, p, w0, h0 in zip(is_img, pdf["payload"],
                                      pdf["width"], pdf["height"]):
                if img:
                    payloads.append(bytearray(resizer(
                        bytes(p or b""),
                        None if pd.isna(w0) else int(w0),
                        None if pd.isna(h0) else int(h0),
                        target_w, target_h)))
                else:
                    payloads.append(p)
            pdf = pdf.assign(payload=payloads)
            pdf.loc[is_img, "width"] = target_w
            pdf.loc[is_img, "height"] = target_h
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to extract
    (media_id, frame_t). The decode itself is the stubbed kernel; the plan
    is pure expressions (sequence + explode)."""
    frames = F.sequence(F.lit(0),
                        F.floor(F.col("duration_s") / F.lit(every_s)).cast("int"))
    return (df.where(F.col("media_type") == "video")
            .select("media_id",
                    F.explode(frames).alias("frame_idx"))
            .withColumn("frame_t", F.col("frame_idx") * F.lit(every_s)))
