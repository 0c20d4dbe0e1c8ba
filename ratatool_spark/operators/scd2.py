"""SCD Type-2 history: changelog -> versioned dimension rows, plus
incremental maintenance of an existing history table.

The classic warehouse operator (Kimball slowly-changing-dimension
type 2): given a change stream where each row sets a key's attribute
values at a timestamp, produce one row per VERSION with
``valid_from`` / ``valid_to`` / ``is_current``, collapsing consecutive
no-op changes. The reference engine has no SCD surface; this is part of
the training-data/warehouse extension family (like ``timeagg`` and
``layout``), expressed as pure window functions.

Scale shape: ONE exchange on the business key; the collapse filter and
both window passes (lag for collapse, lead for interval close) reuse the
same clustering+ordering, so Catalyst plans a single sort under three
window/filter steps. ``scd2_apply`` is the 100 TB maintenance path: a
change batch touches only its own keys, so untouched keys pass through
with an anti-join against the (broadcast, batch-sized) affected-key set
and only affected keys re-window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def scd2_history(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: str | Sequence[str],
    change_id: str | None = None,
    collapse: bool = True,
    keep_change_id: bool = False,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """(key..., attr..., valid_from, valid_to, is_current) — SCD2
    history built from a change stream: per key, order changes by
    (``ts_col``, ``change_id``), optionally drop changes where every
    attribute equals the previous version (``collapse``), then close
    each version's interval with the next version's timestamp
    (``valid_to`` NULL + ``is_current`` true on the latest).

    Determinism: (key, ts) must uniquely order a key's changes, or
    ``change_id`` must be passed as the tie-break. ``keep_change_id``
    carries the id column into the output so a later
    :func:`scd2_apply` can replay ties exactly.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    order = [F.col(ts_col).asc()]
    if change_id:
        order.append(F.col(change_id).asc())
    w = Window.partitionBy(*keys).orderBy(*order)

    out = df
    if collapse:
        cur = F.struct(*[F.col(a) for a in attrs])
        prev = F.lag(cur).over(w)
        out = (
            out.withColumn("__scd_keep", prev.isNull() | (prev != cur))
            .where(F.col("__scd_keep"))
            .drop("__scd_keep")
        )
    out = out.withColumn(valid_from, F.col(ts_col)).withColumn(
        valid_to, F.lead(F.col(ts_col)).over(w)
    )
    extra = [change_id] if (keep_change_id and change_id) else []
    return out.select(
        *keys,
        *attrs,
        valid_from,
        valid_to,
        F.col(valid_to).isNull().alias(current_col),
        *extra,
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: str | Sequence[str],
    change_id: str | None = None,
    collapse: bool = True,
    keep_change_id: bool = False,
    drop_duplicate_changes: bool = False,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Merge a change batch into an existing SCD2 ``history`` table so
    the result equals :func:`scd2_history` over the full change stream
    — WITHOUT touching keys the batch doesn't mention.

    Mechanics: the affected-key set (distinct keys of ``changes``,
    batch-sized, broadcast) splits history into an untouched pass-through
    (anti-join, no shuffle of the big side beyond the join itself) and a
    replay set whose rows are converted back into change rows
    (``valid_from`` is the original change timestamp; the change id rides
    along when the history was built with ``keep_change_id``) and
    re-windowed together with the new batch. A change older than the
    current version re-opens and re-closes the affected intervals.

    Exact-replay contract — apply == full rebuild iff:

    1. Ties replay deterministically: (key, ts) is unique per key, or
       ``history`` carries ``change_id`` (``keep_change_id=True``).
    2. The replay set is LOSSLESS for the affected keys. A history built
       with ``collapse=True`` has dropped its no-op changes, so a batch
       change that lands BETWEEN two previously-collapsed equal changes
       cannot resurrect the later one (rebuild would show
       x@t1, y@t1.5, x@t2; collapsed storage lost t2). This is exact
       anyway when batches arrive key-monotonically in ``ts`` (the
       common in-order CDC case); for arbitrary out-of-order streams,
       store uncollapsed (``collapse=False``, one version row per
       change) and collapse at read — ``streaming/scd2`` does exactly
       that.

    ``drop_duplicate_changes``: drop merged rows sharing the change
    identity (key, ts[, change_id]) — makes re-applying an
    already-applied batch a no-op (at-least-once delivery). Re-delivered
    rows must be identical on the tracked attributes; a conflicting
    duplicate identity keeps an arbitrary one.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    aff = changes.select(*keys).distinct()
    untouched = history.join(F.broadcast(aff), keys, "left_anti")

    replay_cols = [*keys, F.col(valid_from).alias(ts_col), *attrs]
    change_cols = [*keys, ts_col, *attrs]
    if change_id:
        if change_id in history.columns:
            replay_cols.append(F.col(change_id))
        else:
            replay_cols.append(
                F.lit(None).cast(changes.schema[change_id].dataType).alias(change_id)
            )
        change_cols.append(change_id)
    replay = history.join(F.broadcast(aff), keys, "left_semi").select(*replay_cols)
    merged = replay.unionByName(changes.select(*change_cols))
    if drop_duplicate_changes:
        ident = [*keys, ts_col] + ([change_id] if change_id else [])
        merged = merged.dropDuplicates(ident)

    rebuilt = scd2_history(
        merged,
        keys,
        ts_col,
        attrs,
        change_id=change_id,
        collapse=collapse,
        keep_change_id=keep_change_id,
        valid_from=valid_from,
        valid_to=valid_to,
        current_col=current_col,
    )
    return untouched.select(rebuilt.columns).unionByName(rebuilt)
