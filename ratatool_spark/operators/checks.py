"""Declarative data-quality checks — the validation gate a pipeline runs
before promoting a table (deequ-style constraints, restated as one-pass
DataFrame aggregations).

A check suite compiles into the cheapest plan that answers it:

* row-level predicates (``not_null``, ``in_range``, ``accepted_values``,
  ``matches``) fuse into ONE scan + ONE aggregation — each check is a
  conditional-sum column, so adding checks adds expressions, not passes;
* ``unique`` is one groupBy on the key columns counting keys seen twice;
* ``foreign_key`` is one left-anti join against the (deduped, usually
  broadcast) referenced keys.

Output: (``check_name``, ``kind``, ``n_violations``, ``passed``) — one row per
check, engine-portable (the oracle twin is plain SQL counts)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_KINDS = ("not_null", "in_range", "accepted_values", "matches")


def _row_violation(c: dict[str, Any]):
    """Violation indicator Column for one row-level check."""
    kind = c["kind"]
    col = F.col(c["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        ok = (col >= F.lit(c["lo"])) & (col <= F.lit(c["hi"]))
        return ~F.coalesce(ok, F.lit(False))
    if kind == "accepted_values":
        return ~F.coalesce(col.isin(*c["values"]), F.lit(False))
    if kind == "matches":
        return ~F.coalesce(col.rlike(c["pattern"]), F.lit(False))
    raise ValueError(f"{kind!r} is not a row-level check")


def observe_checks(df: DataFrame, checks: list[dict[str, Any]], name: str = "quality"):
    """Attach row-level checks as OBSERVABLE METRICS — violation counters
    computed as a side effect of whatever action the caller runs next, at
    ZERO extra scans (``df.observe`` rides the existing plan; this is the
    monitoring mode of :func:`run_checks`, which spends a pass to get a
    report table).

    Batch: returns ``(df, Observation)`` — run any action on ``df``, then
    ``observation.get`` yields ``{label: n_violations, ..., rows: n}``.
    Streaming: returns ``(df, None)`` with the metrics attached under
    ``name`` — read them per micro-batch from
    ``StreamingQueryProgress.observedMetrics`` (the standard streaming
    observability channel). Only row-level kinds are supported — unique /
    foreign_key need their own shuffle and belong to :func:`run_checks`."""
    if not checks:
        raise ValueError("checks must be non-empty")
    exprs = []
    seen: set[str] = set()
    for c in checks:
        if c["kind"] not in _ROW_KINDS:
            raise ValueError(
                f"observe_checks supports row-level kinds only, got {c['kind']!r}"
            )
        label = c.get("name") or f"{c['kind']}:{c['col']}"
        if label in seen:
            # two same-kind checks on one column (e.g. two in_range bands)
            # would collide in the Observation metrics map and silently
            # drop a violation counter — force distinct names instead
            raise ValueError(
                f"duplicate check label {label!r}; give one of the checks "
                "an explicit distinct 'name'"
            )
        seen.add(label)
        exprs.append(
            F.sum(_row_violation(c).cast("long")).alias(label)
        )
    exprs.append(F.count(F.lit(1)).alias("rows"))
    if df.isStreaming:
        return df.observe(name, *exprs), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def run_checks(df: DataFrame, checks: list[dict[str, Any]]) -> DataFrame:
    """Run a check suite. Each check is a dict with ``kind`` plus:

    - ``not_null``: ``col``
    - ``in_range``: ``col``, ``lo``, ``hi`` (inclusive; nulls violate)
    - ``accepted_values``: ``col``, ``values`` (nulls violate)
    - ``matches``: ``col``, ``pattern`` (regex full/partial per ``rlike``;
      nulls violate)
    - ``unique``: ``cols`` (list)
    - ``foreign_key``: ``col``, ``ref`` (DataFrame), ``ref_col``,
      optional ``broadcast`` (default True — dimension-sized refs; set
      False when the referenced key set is itself fact-sized and must
      shuffle-anti-join instead of broadcasting)

    ``name`` is optional (defaults to a kind:col label)."""
    if not checks:
        raise ValueError("checks must be non-empty")
    row_aggs, results = [], []
    for c in checks:
        kind = c["kind"]
        name = c.get("name") or f"{kind}:{c.get('col') or ','.join(c.get('cols', []))}"
        if kind in _ROW_KINDS:
            row_aggs.append(
                F.sum(_row_violation(c).cast("long")).alias(
                    f"__v_{len(row_aggs)}"
                )
            )
            results.append(("row", name, kind, len(row_aggs) - 1))
        elif kind == "unique":
            dups = (
                df.groupBy(*c["cols"])
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("__v"))
                .select(
                    F.lit(name).alias("check_name"),
                    F.lit(kind).alias("kind"),
                    F.col("__v").alias("n_violations"),
                )
            )
            results.append(("df", dups, None, None))
        elif kind == "foreign_key":
            refs = c["ref"].select(
                F.col(c["ref_col"]).alias(c["col"])
            ).distinct()
            if c.get("broadcast", True):
                refs = F.broadcast(refs)
            orphans = (
                df.where(F.col(c["col"]).isNotNull())
                .join(refs, c["col"], "left_anti")
                .agg(F.count(F.lit(1)).alias("__v"))
                .select(
                    F.lit(name).alias("check_name"),
                    F.lit(kind).alias("kind"),
                    F.col("__v").alias("n_violations"),
                )
            )
            results.append(("df", orphans, None, None))
        else:
            raise ValueError(f"unknown check kind {kind!r}")

    parts = []
    if row_aggs:
        wide = df.agg(*row_aggs)
        stack_args = []
        n_row = 0
        for tag, name, kind, idx in results:
            if tag == "row":
                stack_args.extend(
                    [F.lit(name), F.lit(kind), F.col(f"__v_{idx}")]
                )
                n_row += 1
        parts.append(
            wide.select(
                F.stack(F.lit(n_row), *stack_args).alias(
                    "check_name", "kind", "n_violations"
                )
            )
        )
    parts.extend(d for tag, d, _k, _i in results if tag == "df")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
