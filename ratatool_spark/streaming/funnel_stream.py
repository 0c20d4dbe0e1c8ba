"""Streaming funnel-stage tracker — a per-key ordered state machine on
the arbitrary-state tier (``applyInPandasWithState``), stream-batch dual
like ``streaming/stateful.py``.

The batch funnel (``operators/funnels.funnel``) answers "how far did each
user get" retrospectively; this operator answers it LIVE: one state row
per user carries (stage reached, timestamp of the last advance), each
micro-batch advances the machine over its time-ordered events, and every
advance is emitted as it happens. State is O(1) per key — two scalars —
so there is nothing for a watermark to evict and state size is bounded by
|users|, the same envelope as the stateful EWMA.

Ordering contract: rows within a batch are processed in event-time order;
exact cross-batch ordering additionally requires per-key ordered delivery
(e.g. a keyed Kafka topic) — the standard streaming contract, identical
to the EWMA's."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)


def _advance(
    pdf: pd.DataFrame,
    steps: list[str],
    stage: int,
    last_ts: float,
    ts_col: str,
    type_col: str,
):
    """Run the stage machine over one key's time-ordered rows; returns
    (advance events, new stage, new last_ts). Timestamps compare as epoch
    seconds (floats) so state stays schema-simple."""
    rows = pdf.sort_values(ts_col)
    advances = []
    for ts, et in zip(rows[ts_col], rows[type_col]):
        ts_s = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
        if stage < len(steps) and et == steps[stage] and ts_s > last_ts:
            stage += 1
            last_ts = ts_s
            advances.append((stage, ts))
    return advances, stage, last_ts


def funnel_stage_stream(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user live funnel progression: emits one row per stage ADVANCE
    — (user, stage 1..k, ts of the advance). ``stage`` = how many ordered
    steps the user has completed after that event; the max row per user
    equals the batch funnel's reached depth (parity-tested).

    The first event strictly after the previous advance whose type equals
    the next expected step advances the machine — the same
    sequential-first-match semantics as ``operators/funnels.funnel``
    (there via sequential conditional minima, here as a state machine,
    because a live stream can't re-aggregate history)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cols = df.select(user_col, ts_col, type_col)
    out_schema = T.StructType(
        [
            T.StructField(user_col, df.schema[user_col].dataType),
            T.StructField("stage", T.IntegerType()),
            T.StructField(ts_col, df.schema[ts_col].dataType),
        ]
    )

    def to_frame(key, advances):
        return pd.DataFrame(
            {
                user_col: [key[0]] * len(advances),
                "stage": [s for s, _ in advances],
                ts_col: [t for _, t in advances],
            }
        )

    if df.isStreaming:

        def update(key, pdf_iter, state: GroupState):
            stage, last_ts = state.get if state.exists else (0, float("-inf"))
            # Materialize the whole group before sorting: Arrow can split
            # one key's micro-batch into several chunks that are NOT
            # mutually time-ordered, so per-chunk sorting would silently
            # skip an earlier-timestamp event arriving in a later chunk.
            # One user's events per micro-batch always fit the executor
            # (the group already had to co-locate there).
            chunks = list(pdf_iter)
            if chunks:
                pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                adv, stage, last_ts = _advance(
                    pdf, steps, stage, last_ts, ts_col, type_col
                )
                if adv:
                    yield to_frame(key, adv)
            state.update((stage, last_ts))

        return cols.groupBy(user_col).applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        adv, _stage, _ts = _advance(
            pdf, steps, 0, float("-inf"), ts_col, type_col
        )
        return to_frame(key, adv)

    return cols.groupBy(user_col).applyInPandas(batch_fn, schema=out_schema)
