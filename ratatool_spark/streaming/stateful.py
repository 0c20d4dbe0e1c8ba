"""Custom stateful streaming operators — the applyInPandasWithState tier.

Spark's built-in streaming operators cover windowed/sessionized
aggregation (streaming/events.py); anything needing an *ordered running
computation per key* (EWMA, CUSUM, run-length state machines) is not
expressible as a streaming SQL aggregate and needs the arbitrary-state
API. This module holds those, written stream-batch dual like the rest of
the package:

  - streaming: ``applyInPandasWithState`` keeps one small state row per
    key (GroupState, survives across micro-batches, bounded by key
    cardinality — the same state envelope as any streaming agg).
  - batch: ``applyInPandas`` over the same per-key pandas function with
    empty initial state — identical code path, exact oracle for the
    streaming run.

State per key is O(1) (the running value + last timestamp), so unlike
per-window aggregations there is nothing for a watermark to evict; state
size is bounded by |keys| exactly like the reference's per-strata tables
(ratatool-sampling/README.md:118-120 documents the same envelope).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _ewma_schema(df: DataFrame, key_col: str, ts_col: str, value_col: str):
    """Output StructType built from the caller's column names (types copied
    from the input schema) — a hardcoded name set would silently rename
    non-default columns in the result."""
    return T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField(ts_col, df.schema[ts_col].dataType),
            T.StructField(value_col, df.schema[value_col].dataType),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)


def _ewma_rows(rows: pd.DataFrame, alpha: float, prev: float | None, ts_col: str, value_col: str):
    """Run the recurrence over one key's time-ordered rows."""
    rows = rows.sort_values(ts_col)
    out = []
    for v in rows[value_col]:
        v = float(v)
        prev = v if prev is None else alpha * v + (1.0 - alpha) * prev
        out.append(prev)
    rows = rows.copy()
    rows["ewma"] = out
    return rows, prev


def ewma_by_key(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key exponentially weighted moving average of ``value_col`` in
    event-time order: ewma_i = alpha * v_i + (1-alpha) * ewma_{i-1}.

    Streaming input → ``applyInPandasWithState`` (running value carried
    across micro-batches; rows within a batch are ordered by event time —
    exact total ordering per key additionally requires per-key ordered
    delivery, e.g. a keyed Kafka topic, the standard streaming contract).
    Batch input → ``applyInPandas`` with the same per-key function, which
    is the streaming run's oracle."""
    cols = df.select(key_col, ts_col, value_col)
    out_schema = _ewma_schema(df, key_col, ts_col, value_col)

    if df.isStreaming:

        def update(key, pdf_iter, state: GroupState):
            prev = state.get[0] if state.exists else None
            # whole group per micro-batch before sorting — Arrow chunks of
            # one key are not mutually time-ordered (see funnel_stream)
            chunks = list(pdf_iter)
            if chunks:
                pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                out, prev = _ewma_rows(pdf, alpha, prev, ts_col, value_col)
                yield out
            state.update((prev, 0.0))

        return cols.groupBy(key_col).applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _ewma_rows(pdf, alpha, None, ts_col, value_col)
        return out

    return cols.groupBy(key_col).applyInPandas(batch_fn, schema=out_schema)
