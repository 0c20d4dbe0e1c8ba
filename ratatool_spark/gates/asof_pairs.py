"""As-of join / distinct / pair-enumeration gates.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


from ratatool_spark.gates.pipeline import (
    _SIMHASH_BITS,
    _sql_ann_lsh_buckets,
    _sql_dedup_simhash,
)


# --------------------------------------------- asof / distinct / pairs


def _q_asof(spark, sf_dir):
    """As-of join: each purchase event matched to the user's most recent
    prior view event (union + keyed-window implementation; DuckDB native
    ASOF JOIN is the oracle)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.asof import asof_join
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(purchases, views, on="user_id")
    return out.select("event_id", "user_id", "ts", "ts_r", "view_value")

_SQL_ASOF = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, ts, value AS view_value FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.ts, v.ts AS ts_r, v.view_value
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""

def _q_distinct_users(spark, sf_dir):
    """A3-family: exact distinct counts per group."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )

_SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""

def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs, Hamming <= 6, hi/lo-block self-join."""
    from ratatool_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs, bits=_SIMHASH_BITS, max_hamming=6)

def _sql_simhash_pairs() -> str:
    from ratatool_spark.operators.dedup import simhash_block_layout

    sim = _sql_dedup_simhash().strip()
    # mirror simhash_pairs' Manku-style chunking: max_hamming+1 = 7 blocks
    layout = simhash_block_layout(_SIMHASH_BITS, 7)
    block_cols = ", ".join(
        f"(simhash >> {off}) & {(1 << w) - 1} AS blk_{i}"
        for i, (off, w) in enumerate(layout)
    )
    joins = "\n  UNION\n".join(
        f"""  SELECT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM split a JOIN split b ON a.blk_{i} = b.blk_{i} AND a.id < b.id"""
        for i in range(len(layout))
    )
    return f"""
WITH sim AS ({sim}),
split AS (
  SELECT doc_id AS id, simhash, {block_cols}
  FROM sim
),
cand AS (
{joins}
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 6
"""

def _q_embedding_neardup(spark, sf_dir):
    """Embedding cosine near-dup pairs (unblocked exact verifier).
    min_cosine=0.4 yields ~66 pairs on the fixture — r7 lowered it from
    0.6, where the gate returned 0 rows and hash-matched trivially."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # Kernel dispatch hints from parquet footer metadata — driver-side
    # metadata read, no Spark job (vs the count()/one-row-probe fallbacks).
    out = embedding_neardup_pairs(
        emb,
        min_cosine=0.4,
        n_rows=_parquet_num_rows(f"{sf_dir}/embeddings.parquet"),
        dim=64,
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))

def _parquet_num_rows(path):
    """Exact row count from parquet footers (file or directory of parts)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

_COS_AB_SQL = """
list_reduce(list_transform(range(1, 65),
    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
    (x, y) -> x + y)
/ (sqrt(list_reduce(list_transform(range(1, 65),
       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)),
       (x, y) -> x + y))
 * sqrt(list_reduce(list_transform(range(1, 65),
       i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
       (x, y) -> x + y)))
"""

_SQL_EMBEDDING_NEARDUP = f"""
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_AB_SQL} AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
FROM scored WHERE cosine >= 0.4
"""

def _q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k (the ANN scale path end-to-end)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = lsh_topk(emb, q, k=3, num_planes=8, seed=7, dim=64)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )

def _q_ann_multiprobe_topk(spark, sf_dir):
    """Multi-probe LSH ANN (similarity.multiprobe_lsh_topk; Lv et al.
    VLDB'07, single-bit-flip probe sequence): each query probes its own
    bucket plus the 2 buckets across its lowest-|margin| hyperplanes —
    recall climbs without extra hash tables or index copies (the 100 TB
    single-index trade: probe count, not memory). The oracle replays the
    per-plane projections, the margin sort with its plane-index
    tiebreak, the XOR bucket flips, the bucket join, and the exact
    cosine re-rank."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import multiprobe_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = multiprobe_lsh_topk(
        emb, q, k=3, num_planes=8, seed=7, dim=64, n_probe=3
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    )

def _sql_ann_multiprobe_topk(n_probe: int = 3, k: int = 3) -> str:
    from ratatool_spark.gates.pipeline import _PH64_SQL

    projs = []
    for p in range(8):
        sign_hash = _PH64_SQL.format(
            x=f"concat_ws(chr(1), '7', '{p}', CAST(i - 1 AS VARCHAR))"
        )
        projs.append(
            f"list_reduce(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * "
            f"(CASE WHEN ({sign_hash} & 1) = 1 THEN 1.0 ELSE -1.0 END)), "
            f"(x, y) -> x + y)"
        )
    pr_list = "[" + ", ".join(projs) + "]"
    base = " + ".join(
        f"CASE WHEN pr[{p + 1}] > 0 THEN CAST({1 << p} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for p in range(8)
    )
    powers = "[" + ", ".join(str(1 << p) for p in range(8)) + "]"
    probes = ", ".join(
        f"xor(base, CAST({powers}[flips[{i + 1}] + 1] AS BIGINT))"
        for i in range(n_probe - 1)
    )
    cos = _COS_AB_SQL.replace("a.embedding", "a_emb").replace(
        "b.embedding", "b_emb"
    )
    return f"""
WITH qpr AS (
  SELECT vec_id, embedding, {pr_list} AS pr
  FROM embeddings WHERE vec_id < 5
),
qpb AS (
  SELECT vec_id, embedding, ({base}) AS base,
         list_transform(
           list_sort(list_transform(range(0, 8),
                                    p -> {{'m': abs(pr[p + 1]), 'p': p}})),
           s -> s.p) AS flips
  FROM (SELECT vec_id, embedding, pr FROM qpr)
),
probes AS (
  SELECT vec_id AS query_id, embedding,
         UNNEST([base, {probes}]) AS bucket
  FROM qpb
),
cbk AS (
  SELECT e.vec_id AS neighbor_id, e.embedding, b.bucket
  FROM embeddings e
  JOIN (SELECT vec_id, ({base.replace('pr[', 'cpr[')}) AS bucket FROM (
    SELECT vec_id, {pr_list} AS cpr FROM embeddings
  )) b ON e.vec_id = b.vec_id
),
scored AS (
  SELECT a.query_id, b.neighbor_id,
         {cos} AS cosine
  FROM (SELECT query_id, embedding AS a_emb, bucket FROM probes) a
  JOIN (SELECT neighbor_id, embedding AS b_emb, bucket FROM cbk) b
    USING (bucket)
  WHERE a.query_id <> b.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""

def _sql_ann_lsh_topk() -> str:
    buckets = _sql_ann_lsh_buckets().strip()
    return f"""
WITH buckets AS ({buckets}),
qb AS (
  SELECT e.vec_id AS query_id, e.embedding, b.bucket
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
  WHERE e.vec_id < 5
),
cb AS (
  SELECT e.vec_id AS neighbor_id, e.embedding, b.bucket
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
),
scored AS (
  SELECT a.query_id, b.neighbor_id,
         {_COS_AB_SQL.replace('a.embedding', 'a_emb').replace('b.embedding', 'b_emb')} AS cosine
  FROM (SELECT query_id, embedding AS a_emb, bucket FROM qb) a
  JOIN (SELECT neighbor_id, embedding AS b_emb, bucket FROM cb) b USING (bucket)
  WHERE a.query_id <> b.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 3
"""
