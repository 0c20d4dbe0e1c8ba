"""Event-stream analytics: windowed aggregation, sessionization, JSON props.

The reference is batch-only (SURVEY.md §2.11: Beam used strictly bounded,
no windows/watermarks/state anywhere) — this module is the Structured
Streaming extension the driver's ``events`` table exists for.

Every transformation here is *stream-batch agnostic*: it takes a DataFrame
that may come from ``spark.read`` (tests, oracles) or ``spark.readStream``
(production). That's the idiomatic Structured Streaming shape — one logical
plan, two execution modes — and it's what makes the semantics
oracle-checkable: the batch run of the same plan is the ground truth for
the streaming run's eventual output.

Watermarks are applied only in streaming mode (``withWatermark`` on a batch
frame is a no-op but kept uniform here for plan parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source stream over an events directory (parquet). At scale this
    is the replayable-backfill pattern: the same code attaches to Kafka by
    swapping the reader."""
    import os

    batch_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(batch_schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isfile(path):
        # FileStreamSource requires a directory path; for a single-file
        # table stream the parent dir restricted to this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    stream = reader.parquet(path)
    # Normalize ts to TimestampType (watermarks reject TIMESTAMP_NTZ):
    # TIMESTAMP(NANOS) parquet arrives as long under nanosAsLong — convert
    # (same rule as sources.io.load_tables; integer div keeps microseconds);
    # naive TIMESTAMP(MICROS) arrives as NTZ — attach the session TZ (UTC).
    if "ts" in stream.columns:
        if isinstance(stream.schema["ts"].dataType, T.LongType):
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(stream.schema["ts"].dataType, T.TimestampNTZType):
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def parse_props(df: DataFrame, col: str = "props") -> DataFrame:
    """JSON side-data extraction — ``from_json`` keeps it columnar."""
    return df.withColumn("props_k", F.from_json(F.col(col), PROPS_SCHEMA)["k"])


def windowed_event_stats(
    df: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding) event-time window stats per event_type:
    count, decimal-exact value sum, distinct users.

    Streaming: pass ``watermark`` (e.g. "2 hours") to bound state — late
    rows beyond it are dropped and windows finalize. approx_count_distinct
    is used instead of exact COUNT(DISTINCT) because exact distinct per
    window is unbounded state on a stream; batch oracles compare against
    the exact value with tolerance (rsd default 5%).
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge.

    Built on ``F.session_window`` — Spark's native dynamic-gap session
    operator (stateful on streams, exact on batch). Output is one row per
    (user, session): first/last event time, event count, value sum.

    Batch-oracle equivalence: a session break happens exactly when
    ts - lag(ts) > gap (per user), so the lag+cumulative-sum SQL form
    produces identical sessions — that equivalence is the correctness
    contract checked by the driver oracle.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
        )
        .select(user_col, "first_ts", "last_ts", "n_events", "sum_value")
    )


def write_stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = True,
):
    """Stream sink with checkpointing; ``trigger_once`` processes all
    available input then stops — the batch-like backfill trigger."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lag: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: for each left event, the right-side
    events of the SAME key whose timestamp falls in
    ``[left_ts - lag, left_ts]`` — the ad-impression⋈click / trigger⋈
    outcome enrichment shape. On streaming inputs both sides carry
    watermarks and the time-range predicate bounds the join state (Spark
    evicts right rows older than ``left_ts - lag`` past the watermark);
    without the range condition a stream-stream join would buffer
    forever. The SAME call works on batch frames (watermarks are a no-op
    there), which is the parity oracle.

    Output columns: the key, ``left_ts``/``right_ts`` as ``l_<ts>`` /
    ``r_<ts>``, and every other column prefixed ``l_``/``r_``.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lag}")
        )
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    # outer joins surface unmatched rows from either side — take the key
    # from whichever side is present, never NULL for a known row
    out_cols = [F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)]
    out_cols.append(F.col(f"l.{left_ts}").alias(f"l_{left_ts}"))
    out_cols.append(F.col(f"r.{right_ts}").alias(f"r_{right_ts}"))
    for c in left.columns:
        if c not in (key, left_ts):
            out_cols.append(F.col(f"l.{c}").alias(f"l_{c}"))
    for c in right.columns:
        if c not in (key, right_ts):
            out_cols.append(F.col(f"r.{c}").alias(f"r_{c}"))
    return lw.join(rw, cond, how).select(*out_cols)
