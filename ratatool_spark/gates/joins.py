"""Join/window/set-op gates.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


# ------------------------------------------------ joins / windows / sets


def _q_tpch_q3(spark, sf_dir):
    """TPC-H Q3-style shipping priority: 3-way join + agg + top-10.
    customer/orders are small enough for Catalyst to broadcast; lineitem
    is the probe side — at 100 TB this is the broadcast-join-into-agg
    template."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority")
        # decimal-exact sum, double-rendered output (harness hash parity)
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )

_SQL_TPCH_Q3 = """
SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

def _q_star_join(spark, sf_dir):
    """Star-schema broadcast chain: customer→nation→region rollup."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("customer", "nation", "region"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )

_SQL_STAR_JOIN = """
SELECT r_name AS region_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

def _q_anti_join(spark, sf_dir):
    """Anti-join (the reference's MISSING_RHS semantics computed
    standalone, SURVEY §2.3): parts never ordered."""
    from ratatool_spark.sources.io import load_tables

    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, names=("part", "lineitem"))
    bulk = t["lineitem"].where(F.col("l_quantity") > 45)
    return (
        t["part"]
        .join(bulk, t["part"]["p_partkey"] == bulk["l_partkey"], "left_anti")
        .select("p_partkey", "p_name")
    )

_SQL_ANTI_JOIN = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity > 45)
"""

def _q_semi_join(spark, sf_dir):
    """Semi-join: suppliers with at least one high-value shipment."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("supplier", "lineitem"))
    big = t["lineitem"].where(F.col("l_extendedprice") > 5000)
    return (
        t["supplier"]
        .join(big, t["supplier"]["s_suppkey"] == big["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )

_SQL_SEMI_JOIN = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_extendedprice > 5000)
"""

def _q_window_topn(spark, sf_dir):
    """W1/W2-family window rank: top-3 orders by totalprice per priority."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("orders",))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )

_SQL_WINDOW_TOPN = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
"""

def _q_rollup(spark, sf_dir):
    """Grouping-set rollup over (returnflag, linestatus) with decimal sums."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("lineitem",))
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )

_SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""
