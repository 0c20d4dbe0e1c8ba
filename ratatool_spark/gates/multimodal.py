"""Multimodal plumbing gates (fake-codec path).

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


# ------------------------------------------------- multimodal plumbing
# The codec itself is stubbed (no image/audio libs in this container) but
# the distributed plumbing — binary columns through Arrow batches in
# mapInPandas, typed metadata, deterministic frame sampling — is real and
# here gets oracle rows, not just pytest: the fake decode is a
# deterministic md5-derived function both engines can compute. The binary
# content for the decode fixture is ASCII-hex bytes (DuckDB's md5() only
# accepts VARCHAR, not BLOB) — still a genuine BinaryType column through
# the Arrow path.


def _q_multimodal_decode(spark, sf_dir):
    """Multimodal decode: binary content → (width, height, checksum) via
    the mapInPandas Arrow kernel (operators/multimodal.decode_media).
    2000 synthetic media rows; the stub codec is hash-derived, so the
    oracle recomputes it exactly."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.multimodal import decode_media, fake_media_table

    media = fake_media_table(spark, n=2000, seed=42).withColumn(
        "content",
        F.md5(F.concat(F.lit("42"), F.col("media_id").cast("string"))).cast("binary"),
    )
    return decode_media(media, fake=True)

_SQL_MULTIMODAL_DECODE = """
WITH media AS (
  SELECT i AS media_id, md5(md5(concat('42', CAST(i AS VARCHAR)))) AS ck
  FROM range(2000) t(i)
)
SELECT media_id,
       CAST(('0x' || substr(ck, 1, 4))::BIGINT % 4096 AS INT) AS width,
       CAST(('0x' || substr(ck, 5, 4))::BIGINT % 4096 AS INT) AS height,
       ck AS checksum
FROM media
"""

def _q_multimodal_frames(spark, sf_dir):
    """Deterministic video frame-index sampling (multimodal.sample_frames):
    4 evenly-spaced indices over [0, n_frames), pure expressions, no UDF."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.multimodal import fake_media_table, sample_frames

    media = fake_media_table(spark, n=2000, seed=42)
    return sample_frames(media.where(F.col("kind") == "video"), n=4)

_SQL_MULTIMODAL_FRAMES = """
WITH v AS (
  SELECT i AS media_id,
         (('0x' || substr(md5(concat_ws(chr(1), '42', CAST(i AS VARCHAR))), 1, 15))
            ::BIGINT % 240) + 1 AS nf
  FROM range(2000) t(i) WHERE i % 3 = 2
)
SELECT media_id,
       unnest(list_distinct(list_value(
         0,
         CAST(FLOOR(1 * nf / 4.0) AS INT),
         CAST(FLOOR(2 * nf / 4.0) AS INT),
         CAST(FLOOR(3 * nf / 4.0) AS INT)))) AS frame_idx
FROM v
"""
