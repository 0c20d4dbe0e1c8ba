"""Multimodal (image/audio/video) column plumbing for training pipelines.

Design: media lives as opaque ``binary`` columns plus a typed metadata
struct — the lakehouse-standard layout (same shape as Spark's built-in
``binaryFile`` source: path/length/content). Everything Spark-side is real
and tested: schemas, Arrow batch flow through ``mapInPandas``, partition
sizing, deterministic frame sampling. The codec step itself is STUBBED —
this container has no image/audio libraries — behind ``_decode_bytes``,
which (a) raises ``NotImplementedError`` when a real codec is requested,
or (b) produces a deterministic fake (hash-derived) payload for plumbing
tests. Swap ``_decode_bytes`` for PIL/ffmpeg in a real deployment; nothing
else changes.

Scale notes: media rows are large — ``mapInPandas`` keeps memory bounded
per Arrow batch (tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down for big blobs); decode parallelism is partition parallelism, so
``repartition`` by size-bucket before decoding to avoid stragglers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def _decode_bytes(content: bytes, fake: bool) -> tuple[int, int, str]:
    """The codec boundary. Real decoding needs PIL/libav — not in this
    container; ``fake=True`` yields a deterministic hash-derived result so
    the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires an image/audio library (PIL, "
            "torchaudio, pyav); install one and replace _decode_bytes"
        )
    h = hashlib.md5(content or b"").hexdigest()
    return int(h[:4], 16) % 4096, int(h[4:8], 16) % 4096, h


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary content → (media_id, width, height, checksum) via
    ``mapInPandas`` — per-partition Arrow batch iterator, bounded memory,
    no per-row serialization."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, c = _decode_bytes(content, fake)
                rows.append((mid, w, h, c))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "checksum"]
            )

    return df.select("media_id", "content").mapInPandas(run, _DECODED_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction: binary → fixed-dim float vector. Same Arrow
    batch shape a real vision/audio encoder would use (batched inference
    inside the iterator — load the model once per partition, not per row).
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # model init would go here, once per partition
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if not fake:
                    raise NotImplementedError("real encoder not available here")
                seed_bytes = hashlib.md5(content or b"").digest()
                rng = np.frombuffer(seed_bytes, dtype=np.uint8).astype(np.float32)
                v = np.resize(rng, FEATURE_DIM) / 255.0
                feats.append(v.tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.select("media_id", "content").mapInPandas(run, _FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize image rows to (width, height): binary in → binary out, the
    same mapInPandas batch shape as decode_media. Stub codec: the fake
    payload is a deterministic function of (content, width, height) so
    re-runs and retries produce identical bytes — idempotent-sink safe."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                if not fake:
                    raise NotImplementedError(
                        "real resize requires an image library (PIL); "
                        "install one and replace this branch"
                    )
                h = hashlib.md5(
                    (content or b"") + f"{width}x{height}".encode()
                ).digest()
                out.append(h * ((width * height * 3) // len(h) + 1))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "content").mapInPandas(run, _RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    n: int = 4,
    id_col: str = "media_id",
    frames_col: str = "meta.n_frames",
) -> DataFrame:
    """Deterministic frame-index sampling for video rows: n evenly-spaced
    indices over [0, n_frames) — pure expressions, no UDF. The downstream
    decode step consumes (media_id, frame_idx) pairs."""
    total = F.col(frames_col)
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: (i * total / F.lit(n)).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.when(total.isNotNull() & (total > 0), F.array_distinct(idx)).otherwise(
                F.array()
            )
        ).alias("frame_idx"),
    )


def fake_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows for tests: content bytes derived
    from the portable hash, metadata populated per kind."""
    from ratatool_spark.functions.hashing import hash_cols

    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string")))).alias(
            "content"
        ),
        (hash_cols([F.col("id")], seed=seed) % 240 + 1).cast("int").alias("__nf"),
    )
    return base.select(
        "media_id",
        "kind",
        "content",
        F.struct(
            F.concat(F.lit("application/x-fake-"), F.col("kind")).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(F.col("kind") == "video", F.col("__nf")).alias("n_frames"),
            F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
        ).alias("meta"),
    )
