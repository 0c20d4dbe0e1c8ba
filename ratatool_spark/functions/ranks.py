"""Building blocks for distributed global ranks / prefix sums.

The scale-safe global-rank pattern (range partition -> per-partition
rank -> add per-partition offsets) needs an EXCLUSIVE PREFIX SUM over a
one-row-per-PARTITION table. That table is metadata-scale by
construction — its row count is the number of shuffle partitions, not
the number of data rows — so the offsets are computed on the driver and
shipped back as a broadcast-sized DataFrame. A single-partition window
would give the same result but routes through WindowExec's
no-partition path (one task plus a scary scale warning on every run);
a collect of #partitions rows is bounded at any data scale — the same
judgement call as the manifest/vocabulary collects elsewhere in the
repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def partition_offsets(
    per_pid: DataFrame,
    pid_col: str = "__pid",
    n_col: str = "__n",
    off_col: str = "__off",
    with_total: bool = False,
):
    """Exclusive prefix sum over a (partition id, value) table.

    ``per_pid`` has ONE ROW PER PARTITION of some upstream DataFrame
    (e.g. ``groupBy(spark_partition_id()).count()``), so collecting it
    is bounded by the shuffle-partition count regardless of data scale.
    Returns a DataFrame of (``pid_col``, ``off_col``) where ``off_col``
    is the sum of ``n_col`` over all strictly-smaller partition ids —
    the offset each partition adds to its local ranks / running sums.
    Callers ``broadcast()`` the result back onto the data.

    ``with_total=True`` additionally returns the grand total (the sum
    of all values) — callers that need N (e.g. equal-population
    bucketing) get it from the SAME collect instead of a separate
    ``count()`` pass over the data.
    """
    # NULL-safe: when fed SUMs rather than COUNTs (compaction_plan sums
    # a size column) a partition whose values are all NULL aggregates
    # to NULL — contribute 0, don't TypeError on int(None)
    rows = sorted(
        (r[pid_col], r[n_col] or 0)
        for r in per_pid.select(pid_col, n_col).collect()
    )
    out, acc = [], 0
    for pid, n in rows:
        out.append((int(pid), int(acc)))
        acc += int(n)
    schema = T.StructType(
        [
            T.StructField(pid_col, T.IntegerType(), False),
            T.StructField(off_col, T.LongType(), False),
        ]
    )
    from ratatool_spark.functions.localrel import local_df

    offs = local_df(per_pid.sparkSession, out, schema)
    return (offs, acc) if with_total else offs
