"""Structured Streaming gates (events, windows, watermarks).

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


# ----------------------------------------------------- events / streaming


def _q_events_windowed(spark, sf_dir):
    """Event-time tumbling-window stats (stream-batch agnostic plan; batch
    run is the oracle for the streaming run)."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.streaming.events import windowed_event_stats

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    out = windowed_event_stats(ev, window="1 hour")
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )

_SQL_EVENTS_WINDOWED = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

def _q_events_sessionize(spark, sf_dir):
    """Per-user session windows (30-min gap) via F.session_window; the
    lag+cumsum SQL formulation is the exact batch equivalent."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.streaming.events import sessionize

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    out = sessionize(ev, gap="30 minutes")
    return out.select(
        "user_id",
        "first_ts",
        "last_ts",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )

_SQL_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, session_id
"""

def _q_events_json_props(spark, sf_dir):
    """JSON props extraction + per-key rollup (from_json, columnar)."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.streaming.events import parse_props

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return (
        parse_props(ev)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("props_k").alias("sum_k"),
            F.min("props_k").alias("min_k"),
            F.max("props_k").alias("max_k"),
        )
    )

_SQL_EVENTS_JSON = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""

def _q_scd2_history(spark, sf_dir):
    """SCD Type-2 history (operators/scd2.scd2_history) from the events
    changelog: per-user event_type status versions, consecutive repeats
    collapsed, intervals closed by the next change. One exchange on
    user_id under both window passes."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.scd2 import scd2_history
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    out = scd2_history(
        ev.select("user_id", "ts", "event_type", "event_id"),
        "user_id",
        "ts",
        "event_type",
        change_id="event_id",
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("status"),
        "valid_from",
        "valid_to",
        "is_current",
    )

_SQL_SCD2_HISTORY = """
WITH ch AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
), kept AS (
  SELECT user_id, event_type, ts, event_id FROM ch
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS status, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM kept
"""

def _q_scd2_apply(spark, sf_dir):
    """Incremental SCD2 maintenance == full rebuild: history built from
    the first half-year of events (change ids kept for exact tie
    replay), then scd2_apply merges the second half — untouched keys
    pass through an anti-join against the broadcast affected-key set,
    only touched keys re-window. The oracle is the FULL-stream rebuild
    SQL, so green means incremental application is exactly rebuild."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.scd2 import scd2_apply, scd2_history
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"].select(
        "user_id", "ts", "event_type", "event_id"
    )
    cut = F.to_timestamp(F.lit("2024-07-01"))
    # persisted: scd2_apply reads `history` twice (anti pass-through +
    # semi replay). In production history is a STORED table — two cheap
    # scans; here it is derived from events, so materialize once rather
    # than re-windowing the changelog per branch.
    from ratatool_spark.cache import persist_tracked

    base = persist_tracked(
        scd2_history(
            ev.where(F.col("ts") < cut),
            "user_id",
            "ts",
            "event_type",
            change_id="event_id",
            keep_change_id=True,
        )
    )
    out = scd2_apply(
        base,
        ev.where(F.col("ts") >= cut),
        "user_id",
        "ts",
        "event_type",
        change_id="event_id",
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("status"),
        "valid_from",
        "valid_to",
        "is_current",
    )

def _q_stream_scd2(spark, sf_dir):
    """Streaming SCD2 maintenance (streaming/scd2.stream_scd2) run for
    real: the events changelog arrives as THREE time-range files
    processed one per micro-batch (maxFilesPerTrigger=1), each merged
    into the persisted history snapshot via scd2_apply. The oracle is
    the full-stream rebuild SQL — green means batch-at-a-time
    maintenance equals the rebuild no matter how the stream was cut."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.streaming.scd2 import read_scd2_table, stream_scd2

    ev = load_tables(spark, sf_dir, names=("events",))["events"].select(
        "user_id", "ts", "event_type", "event_id"
    )
    root = scratch_dir(prefix="rt_scd2_")
    in_dir = os.path.join(root, "incoming")
    # three time-ordered arrival files -> three micro-batches
    ev.repartitionByRange(3, F.col("ts")).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_scd2(
            stream,
            os.path.join(root, "history"),
            checkpoint=os.path.join(root, "ckpt"),
            key_cols="user_id",
            ts_col="ts",
            attr_cols="event_type",
            change_id="event_id",
            # gate-scale bucket count: ~10 users per bucket; the default
            # 64 is sized for real tables, here it just multiplies dir
            # listings
            n_buckets=16,
        )
        q.awaitTermination()
    back = read_scd2_table(spark, os.path.join(root, "history"))
    return back.select(
        "user_id",
        F.col("event_type").alias("status"),
        "valid_from",
        "valid_to",
        "is_current",
    )


def _q_stream_sessionize(spark, sf_dir):
    """Per-user session windows run AS A STREAM (streaming/events.
    sessionize — F.session_window + watermark, Spark's native stateful
    session operator): the events table arrives as three time-range
    files processed through a file-source stream, sessions emit in
    append mode once the watermark passes their close, and a far-future
    sentinel row advances the final watermark so every real session
    flushes (the no-data micro-batch evicts them). The oracle is the
    exact batch formulation (lag + cumulative-sum session ids over the
    whole table) — green means the incremental, state-backed run equals
    the global rebuild regardless of how the stream was cut."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.streaming.events import (
        read_event_stream,
        sessionize,
    )

    ev = (
        load_tables(spark, sf_dir, names=("events",))["events"]
        .select("user_id", "ts", "value")
        # fixture trim: a 1-in-16 user slice — session state and
        # shuffle scale with |users|, and the contract under test
        # (incremental watermarked run == global rebuild) is
        # user-count-independent
        .where(F.col("user_id") % 16 == 0)
    )
    root = scratch_dir(prefix="rt_sess_")
    in_dir = os.path.join(root, "incoming")
    ev.repartitionByRange(3, F.col("ts")).write.parquet(in_dir)
    # sentinel: one event far past the last real one — after its batch
    # the watermark clears every real session's close, so append mode
    # emits them all; the sentinel's own open session is filtered out
    hi = ev.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [(-1, hi + datetime.timedelta(days=2), 0.0)], ev.schema
    ).write.mode("append").parquet(in_dir)

    out_dir = os.path.join(root, "sessions")
    # state-store partition count is pinned at checkpoint creation;
    # 8 fits the gate's key cardinality (the session default 32 just
    # multiplies per-micro-batch state-store setup)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sessionize(
                read_event_stream(spark, in_dir, max_files_per_trigger=2),
                gap="30 minutes",
                watermark="1 minute",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(out_dir)
        .where(F.col("user_id") >= 0)
        .select(
            "user_id",
            "first_ts",
            "last_ts",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
        )
    )


_SQL_STREAM_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id % 16 = 0
), sessions AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, session_id
"""
