"""Link-graph operators: fixed-point PageRank.

Web-corpus curation uses link-graph centrality as a document-quality
prior (the original use of PageRank; Common-Crawl-style pipelines rank
hosts/pages before sampling).  This implementation is Pregel-shaped on
DataFrames — per iteration ONE shuffle join (ranks ⋈ edges on src) and
ONE aggregate (sum per dst) — and entirely in **integer fixed-point
arithmetic**, so a K-iteration run is bit-identical on any engine that
replays the same integer divisions: the ``pagerank_lineitem_graph``
oracle gate unrolls the iterations as chained SQL CTEs in DuckDB and
matches exactly, no tolerance band.

Fixed-point scheme (scale S, damping as a rational num/den):

    base        = ((S * (den - num)) div den) div N          (teleport)
    contrib(v)  = Σ_{u→v} rank(u) div out_deg(u)
    dang_share  = (Σ_{u: out_deg(u)=0} rank(u)) div N
    rank'(v)    = base + (num * (contrib(v) + dang_share)) div den

All quantities are non-negative longs; ``div`` is integer division.
Σ rank stays ≈ S (floor losses only), so ranks are comparable across
iterations and runs.

Scale shape: rank state is one row per node, hash-partitioned by node id;
each iteration shuffles the EDGE list once by src (the join) and once by
dst (the aggregate) — the classic two-exchange Pregel superstep. The
lineage is cut with ``localCheckpoint`` per iteration (like
``dedup.connected_components``) so K iterations never build a K-deep
plan; the dangling-mass scalar rides a broadcast 1-row aggregate, not a
driver collect, so the loop schedules one job per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
) -> DataFrame:
    """(node, rank_fx) — fixed-point PageRank after ``iterations``
    synchronous supersteps over the (deduplicated) edge list. ``rank_fx``
    is the rank times ``scale``, a long; divide by ``scale`` for the
    conventional [0, 1] value. Self-loops are removed and duplicate
    edges collapsed (each distinct link votes once — the standard
    web-graph convention). Node set = sources ∪ destinations.

    One driver-side scalar (the node count) plus one materializing job
    per iteration (the eager checkpoint that cuts the lineage); the
    dangling-mass scalar rides a broadcast 1-row aggregate inside each
    iteration's plan, never a driver collect."""
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            f"damping must be a proper fraction, got {damping_num}/{damping_den}"
        )
    from ratatool_spark.cache import persist_tracked

    e = persist_tracked(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
        .where(F.col("__src") != F.col("__dst"))
        .distinct()
    )
    nodes = persist_tracked(
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fx"))
    base = ((scale * (damping_den - damping_num)) // damping_den) // n_nodes
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__outd"))
    ed = persist_tracked(e.join(deg, "__src"))
    sources = persist_tracked(e.select(F.col("__src").alias("node")).distinct())

    ranks = nodes.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("rank_fx")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            ranks.join(ed, ranks["node"] == ed["__src"])
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank_fx div __outd").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__contrib"))
        )
        dang = (
            ranks.join(sources, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank_fx"), F.lit(0)).alias("__dang"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * (coalesce(__contrib, 0L) "
                        f"+ (__dang div {n_nodes}))) div {damping_den}"
                    )
                ).cast("long").alias("rank_fx"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
