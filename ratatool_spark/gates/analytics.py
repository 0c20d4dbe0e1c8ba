"""Quantile, pivot, TPC-H, and composite pipeline gates.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


from ratatool_spark.gates.asof_pairs import _COS_AB_SQL
from ratatool_spark.gates.pipeline import (
    _MINHASH_BANDS,
    _MINHASH_K,
    _PH64_SQL,
    _SQL_DEDUP_JACCARD,
    _sql_dedup_minhash,
    _sql_text_metrics,
)


# --------------------------------------- quantiles / pivot / pipeline


def _q_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per group (F.percentile ==
    DuckDB quantile_cont on doubles)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = lambda q, n: F.round(  # noqa: E731
        F.percentile(F.col("l_extendedprice"), F.lit(q)), 6
    ).alias(n)
    return li.groupBy("l_returnflag").agg(
        p(0.25, "p25"), p(0.5, "p50"), p(0.75, "p75"), p(0.95, "p95")
    )

_SQL_QUANTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.75), 6) AS p75,
       ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.95), 6) AS p95
FROM lineitem GROUP BY l_returnflag
"""

def _q_pivot(spark, sf_dir):
    """Pivot: linestatus columns per returnflag, decimal-exact sums."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )
    return out.select(
        "l_returnflag",
        F.col("qty_open").cast("double").alias("qty_open"),
        F.col("qty_filled").cast("double").alias("qty_filled"),
    )

_SQL_PIVOT = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""

def _q_clean_corpus(spark, sf_dir):
    """Composed training-data pipeline: quality filter → language filter →
    exact dedup → projection. The end-to-end shape a pretraining corpus
    cleaner runs, all column expressions + one dedup shuffle."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import lang_id, quality_score, token_count
    from ratatool_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        lang_id(F.col("text")).alias("lang_guess"),
    )
    kept = scored.where((F.col("quality") >= 0.45) & (F.col("lang_guess") == "en"))
    deduped = exact_dedup(kept, text_col="text", id_col="doc_id")
    return deduped.select("doc_id", "n_tokens", "quality")

def _sql_clean_corpus() -> str:
    metrics = _sql_text_metrics().strip()
    norm_text = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    fp = _PH64_SQL.format(x=norm_text)
    return f"""
WITH metrics AS ({metrics}),
kept AS (
  SELECT m.doc_id, m.n_tokens, m.quality, d.text
  FROM metrics m JOIN documents d ON m.doc_id = d.doc_id
  WHERE m.quality >= 0.45 AND m.lang_guess = 'en'
),
deduped AS (
  SELECT doc_id, n_tokens, quality,
         ROW_NUMBER() OVER (PARTITION BY {fp} ORDER BY doc_id) AS rn
  FROM kept
)
SELECT doc_id, n_tokens, quality FROM deduped WHERE rn = 1
"""

def _q_tpch_q5(spark, sf_dir):
    """TPC-H Q5-style local-supplier revenue: 6-table join where customer
    and supplier must share a nation. All dimension chains broadcast;
    lineitem (the 100 TB side) joins orders on its own key and never
    moves for the dimension lookups."""
    from pyspark.sql import functions as F

    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,4)"
    )
    nations_in_region = (
        rd("nation")
        .join(
            F.broadcast(rd("region").where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        rd("lineitem")
        .join(rd("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(rd("customer")), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(rd("supplier")), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nations_in_region),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

_SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""

def _q_text_fingerprints(spark, sf_dir):
    """Rolling-hash (Rabin-Karp) document fingerprint + BPE-ish token
    count — the order-sensitive complements to the set-style text_metrics
    fingerprint."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import bpe_tokens, rolling_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        rolling_fingerprint(F.col("text")).alias("rolling_fp"),
        F.size(bpe_tokens(F.col("text"))).alias("n_bpe_tokens"),
    )

def _sql_text_fingerprints() -> str:
    tok_hash = _PH64_SQL.format(x="t")
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split(trim(text), ' '),
                          t -> {tok_hash} % 2147483647)),
         (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_fp,
       len(list_filter(
         string_split_regex(
           trim(regexp_replace(text, '([^\\w\\s])', ' \\1 ', 'g')), '\\s+'),
         t -> t != '')) AS n_bpe_tokens
FROM documents
"""

def _q_cube_pricing(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all four grouping sets in one
    pass — Spark expands the cube map-side, still a single shuffle."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )

_SQL_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

def _q_events_ewma(spark, sf_dir):
    """Per-user event-time EWMA — custom stateful operator
    (applyInPandasWithState on streams, applyInPandas in batch). The
    oracle twin replays the *same sequential recurrence* in DuckDB via
    ``list_reduce`` over the time-ordered value list (left fold, first
    element as initial state — exactly ``_ewma_rows``'s ``prev=None``
    start), with every literal cast to DOUBLE so both engines execute
    identical IEEE operations in identical order. Streaming==batch parity
    lives in tests/test_streaming.py (stateful run == pandas recurrence)."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.streaming.stateful import ewma_by_key

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    out = ewma_by_key(ev.where(F.col("user_id") < 100), alpha=0.3)
    return out.select("user_id", "ts", F.round("ewma", 6).alias("ewma"))

def _q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k with deterministic seed centroids
    (train_iters=0: centroids = hash-sample of corpus vectors, so the
    whole pipeline — centroid choice, cell assignment, probe, re-rank —
    is expressible in the DuckDB oracle). The Lloyd's-trained variant
    (train_iters>0) is an iterative driver-loop algorithm with no
    single-statement SQL equivalent; its recall and exactness are pinned
    in tests/test_dedup.py (test_kmeans_ivf_training) instead."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=3, train_iters=0)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )

def _sql_ann_ivf_topk() -> str:
    # hash_cols([vec_id], seed=13) twin: the centroid sample order
    h = (
        "(('0x' || substr(md5(concat_ws(chr(1), '13', "
        "CAST(vec_id AS VARCHAR))), 1, 15))::BIGINT)"
    )
    cos_vc = _COS_AB_SQL.replace("a.embedding", "v.embedding").replace(
        "b.embedding", "ct.embedding"
    )
    cos_qc = _COS_AB_SQL.replace("a.embedding", "q_emb").replace(
        "b.embedding", "c_emb"
    )
    return f"""
WITH cents AS (
  SELECT rn - 1 AS cell, embedding FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY {h}) AS rn, embedding FROM embeddings
  ) WHERE rn <= 8
),
corpus_assign AS (
  SELECT neighbor_id, c_emb, cell FROM (
    SELECT v.vec_id AS neighbor_id, v.embedding AS c_emb, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell) AS arn
    FROM embeddings v CROSS JOIN cents ct
  ) WHERE arn = 1
),
query_assign AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT v.vec_id AS query_id, v.embedding AS q_emb, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell) AS arn
    FROM embeddings v CROSS JOIN cents ct
    WHERE v.vec_id < 5
  ) WHERE arn <= 3
),
cand AS (
  SELECT DISTINCT q.query_id, c.neighbor_id, {cos_qc} AS cosine
  FROM query_assign q JOIN corpus_assign c USING (cell)
  WHERE q.query_id <> c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 3
"""

def _q_domain_cap(spark, sf_dir):
    """The crawl-curation chain composed end-to-end: synthesize messy
    URLs (the url_normalize_docs fixture), canonicalize, key by eTLD+1
    registered domain, apply the deterministic per-domain cap
    (corpus.cap_per_group — the C4/Gopher 'at most N pages per domain'
    rule over hash-dice membership), and report per-domain kept/total.
    One scan + one WindowGroupLimit window + one aggregate; every stage
    (URL rules, domain, dice, cap, counts) replays in DuckDB."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.urls import registered_domain, url_host
    from ratatool_spark.operators.corpus import cap_per_group

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("HTTPS://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.upper(F.col("source")),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".Example.CO.UK")).otherwise(
            F.lit(".example.COM")
        ),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    with_domain = d.select(
        "doc_id", registered_domain(url_host(url)).alias("domain")
    )
    capped = cap_per_group(
        with_domain, group_col="domain", max_rows=40, dice_cols=("doc_id",)
    )
    totals = with_domain.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    kept = capped.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_id_sum"),
    )
    return totals.join(kept, "domain").select(
        "domain", "n_total", "n_kept", "kept_id_sum"
    )

def _sql_domain_cap() -> str:
    # cap_per_group dice: portable md5 hash over (seed, doc_id)
    h = (
        "('0x' || substr(md5(concat_ws(chr(1), '0', "
        "CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT"
    )
    return f"""
WITH w AS (
  SELECT doc_id,
    LOWER(CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
          source ||
          CASE WHEN doc_id % 2 = 0 THEN '.example.co.uk'
               ELSE '.example.com' END) AS host
  FROM documents
), dom AS (
  SELECT doc_id,
    CASE WHEN labels[-2] || '.' || labels[-1] IN ('co.uk')
              AND len(labels) >= 3
         THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
         ELSE labels[-2] || '.' || labels[-1] END AS domain
  FROM (SELECT doc_id, string_split(host, '.') AS labels FROM w)
), ranked AS (
  SELECT domain, doc_id,
         ROW_NUMBER() OVER (PARTITION BY domain
                            ORDER BY {h}, doc_id) AS rn
  FROM dom
)
SELECT d.domain,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN r.rn <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN r.rn <= 40 THEN d.doc_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM dom d JOIN ranked r ON r.doc_id = d.doc_id
GROUP BY 1
"""

def _q_stream_drift(spark, sf_dir):
    """Streaming drift monitor run for REAL (streaming/drift): the
    even-event_id half of events is the batch REFERENCE (fixed_bins
    once); the odd half — value-shifted (> 150) to engineer numeric
    drift while the event_type mix stays stable — is staged into a
    2-file landing zone and streamed one file per trigger, each
    micro-batch writing its own bin partial; the read side merges
    partials by count addition and scores PSI per column. Fixed binning
    spec (explicit bounds) is what makes partials mergeable; the oracle
    is the direct batch replay, so the gate fails if the streaming path
    drops, duplicates, or mis-merges any batch."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import fixed_bins
    from ratatool_spark.streaming.drift import (
        read_stream_drift,
        stream_drift_bins,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    spec = dict(
        categorical=["event_type"],
        numeric_bounds={"value": (0.0, 500.0)},
        n_buckets=10,
    )
    ref = fixed_bins(ev.where(F.col("event_id") % 2 == 0), **spec)
    live_src = ev.where(
        (F.col("event_id") % 2 == 1) & (F.col("value") > 150)
    )
    root = scratch_dir(prefix="rt_drift_")
    src = os.path.join(root, "incoming")
    live_src.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(live_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_drift_bins(
            stream,
            os.path.join(root, "bins"),
            os.path.join(root, "ckpt"),
            **spec,
        )
        q.awaitTermination()
    return read_stream_drift(spark, os.path.join(root, "bins"), ref)

def _sql_stream_drift() -> str:
    return """
WITH ref0 AS (
  SELECT event_type, value FROM events WHERE event_id % 2 = 0
), live0 AS (
  SELECT event_type, value FROM events
  WHERE event_id % 2 = 1 AND value > 150
), rbins AS (
  SELECT "column", kind, bucket, COUNT(*) AS ca FROM (
    SELECT 'event_type' AS "column", 'categorical' AS kind,
           CAST(event_type AS VARCHAR) AS bucket FROM ref0
    UNION ALL
    SELECT 'value', 'numeric',
           CAST(CAST(LEAST(GREATEST(FLOOR((value - CAST(0.0 AS DOUBLE))
             / CAST(50.0 AS DOUBLE)), 0), 9) AS BIGINT) AS VARCHAR)
    FROM ref0
  ) GROUP BY 1, 2, 3
), lbins AS (
  SELECT "column", kind, bucket, COUNT(*) AS cb FROM (
    SELECT 'event_type' AS "column", 'categorical' AS kind,
           CAST(event_type AS VARCHAR) AS bucket FROM live0
    UNION ALL
    SELECT 'value', 'numeric',
           CAST(CAST(LEAST(GREATEST(FLOOR((value - CAST(0.0 AS DOUBLE))
             / CAST(50.0 AS DOUBLE)), 0), 9) AS BIGINT) AS VARCHAR)
    FROM live0
  ) GROUP BY 1, 2, 3
), pv AS (
  SELECT COALESCE(r."column", l."column") AS "column",
         COALESCE(r.kind, l.kind) AS kind,
         COALESCE(r.bucket, l.bucket) AS bucket,
         COALESCE(r.ca, 0) AS ca, COALESCE(l.cb, 0) AS cb
  FROM rbins r FULL OUTER JOIN lbins l
    ON l."column" = r."column" AND l.bucket = r.bucket
), tot AS (
  SELECT "column", SUM(ca) AS n_ref, SUM(cb) AS n_live,
         COUNT(*) AS n_bins
  FROM pv GROUP BY 1
)
SELECT pv."column", ANY_VALUE(pv.kind) AS kind,
       ANY_VALUE(t.n_bins) AS n_bins,
       CAST(ANY_VALUE(t.n_ref) AS BIGINT) AS n_ref,
       CAST(ANY_VALUE(t.n_live) AS BIGINT) AS n_live,
       ROUND(SUM(
         ((pv.ca + CAST(0.5 AS DOUBLE)) / (t.n_ref + CAST(0.5 AS DOUBLE) * t.n_bins)
          - (pv.cb + CAST(0.5 AS DOUBLE)) / (t.n_live + CAST(0.5 AS DOUBLE) * t.n_bins))
         * ln((pv.ca + CAST(0.5 AS DOUBLE)) / (t.n_ref + CAST(0.5 AS DOUBLE) * t.n_bins)
              / ((pv.cb + CAST(0.5 AS DOUBLE)) / (t.n_live + CAST(0.5 AS DOUBLE) * t.n_bins)))
       ), 6) AS psi
FROM pv JOIN tot t ON t."column" = pv."column"
GROUP BY 1
"""

def _q_lsh_recall_by_band(spark, sf_dir):
    """LSH S-curve accounting (operators/dedup.pair_recall_by_band):
    recall of the banded-minhash candidate set against exact n-gram
    Jaccard truth pairs, bucketed by true similarity — the text-dedup
    twin of the ANN recall reports, and the measurement that justifies
    a (num_hashes, bands) choice. The oracle recomputes BOTH pair sets
    (the existing minhash and jaccard gate replays verbatim as nested
    CTEs) and the band aggregate."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        pair_recall_by_band,
    )

    # a doc_id % 3 slice keeps the gate inside the bench envelope at
    # sf0.1 (5.1 s full-table -> 3.0 s) while both S-curve ends stay
    # populated (thousands of low-band pairs, the full top band)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") % 3 == 0
    )
    # band on the ROUND(6) similarity so the banding input is the same
    # literal value the oracle's jaccard CTE produces
    truth = ngram_jaccard_pairs(docs, threshold=0.02).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )
    cands = minhash_lsh_pairs(docs, num_hashes=_MINHASH_K, bands=_MINHASH_BANDS)
    return pair_recall_by_band(
        truth, cands, sim_col="jaccard", n_bands=10,
        lsh_params=(_MINHASH_K // _MINHASH_BANDS, _MINHASH_BANDS),
    )

def _sql_lsh_recall_by_band() -> str:
    rpb, bands = _MINHASH_K // _MINHASH_BANDS, _MINHASH_BANDS
    return f"""
WITH truth AS ({_SQL_DEDUP_JACCARD.replace('>= 0.1', '>= 0.02').replace('FROM documents', 'FROM documents WHERE doc_id % 3 = 0')}),
cand AS ({_sql_dedup_minhash().replace('FROM documents', 'FROM documents WHERE doc_id % 3 = 0')}),
t AS (SELECT DISTINCT id_a, id_b, jaccard AS s FROM truth),
c AS (SELECT DISTINCT id_a, id_b, 1 AS hit FROM cand),
joined AS (
  SELECT LEAST(CAST(FLOOR(t.s * 10) AS INT), 9) AS b, c.hit
  FROM t LEFT JOIN c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT ROUND(CAST(b AS DOUBLE) / 10, 6) AS band_lo,
       COUNT(*) AS n_truth,
       COUNT(hit) AS n_hit,
       ROUND(COUNT(hit) / CAST(COUNT(*) AS DOUBLE), 6) AS recall,
       ROUND(1 - POWER(1 - POWER(ROUND(CAST(b AS DOUBLE) / 10, 6)
         + CAST(0.05 AS DOUBLE), {rpb}), {bands}), 6) AS expected_recall
FROM joined GROUP BY b
"""

def _q_drift_report(spark, sf_dir):
    """Snapshot drift report (operators/profile.drift_report): PSI
    between the even-orderkey half of orders and an ENGINEERED drifted
    snapshot (odd half restricted to totalprice > 100k) — numeric PSI
    over 10 equi-width buckets of the combined range must light up,
    categorical o_orderpriority stays near zero. Laplace-smoothed
    shares, grid-completed bins, no window beyond the top-k
    WindowGroupLimit; DuckDB replays the smoothing, bucketing and
    ln-sum exactly (literals CAST to DOUBLE — bare 0.5 would parse as
    DECIMAL and change the arithmetic)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import drift_report

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = o.where(F.col("o_orderkey") % 2 == 0)
    b = o.where(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_totalprice") > 100000)
    )
    return drift_report(
        a, b, categorical=["o_orderpriority"], numeric=["o_totalprice"]
    )

def _sql_drift(bounds: tuple | None) -> str:
    """Parameterized drift-report oracle: with ``bounds`` None the numeric
    bin range is the combined min/max (a rng CTE over the union); with
    pinned ``(lo, hi)`` the bounds are literals and the rng CTE is gone —
    mirroring drift_report's numeric_bounds plan difference."""
    if bounds is None:
        rng = "), rng AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ab),"
        bucket = "FLOOR((v - lo) / ((hi - lo) / 10)), 0), 9) AS BIGINT)"
        frm = "FROM ab, rng GROUP BY 1, 2, 3, 4"
    else:
        lo, hi = bounds
        rng = "),"
        bucket = (
            f"FLOOR((v - CAST({lo} AS DOUBLE))\n"
            f"                 / ((CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))\n"
            "                    / 10)), 0), 9) AS BIGINT)"
        )
        frm = "FROM ab GROUP BY 1, 2, 3, 4"
    return f"""
WITH a0 AS (
  SELECT o_orderpriority AS cp, CAST(o_totalprice AS DOUBLE) AS v,
         0 AS side
  FROM orders WHERE o_orderkey % 2 = 0
), b0 AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE), 1
  FROM orders WHERE o_orderkey % 2 = 1 AND o_totalprice > 100000
), ab AS (SELECT * FROM a0 UNION ALL SELECT * FROM b0),
ccounts AS (
  SELECT 'o_orderpriority' AS col, cp AS value, side, COUNT(*) AS c
  FROM ab GROUP BY 1, 2, 3
), topv AS (
  SELECT col, value FROM (
    SELECT col, value,
           ROW_NUMBER() OVER (PARTITION BY col
                              ORDER BY SUM(c) DESC, value) AS rk
    FROM ccounts GROUP BY col, value
  ) WHERE rk <= 20
), cbuck AS (
  SELECT c.col, 'categorical' AS kind,
         CASE WHEN t.value IS NOT NULL THEN c.value
              ELSE '__other__' END AS bucket,
         c.side, SUM(c.c) AS c
  FROM ccounts c LEFT JOIN topv t ON t.col = c.col AND t.value = c.value
  GROUP BY 1, 2, 3, 4
{rng}
nbuck AS (
  SELECT 'o_totalprice' AS col, 'numeric' AS kind,
         CAST(CAST(LEAST(GREATEST(
           {bucket}
           AS VARCHAR) AS bucket,
         side, COUNT(*) AS c
  {frm}
), binned AS (
  SELECT * FROM cbuck UNION ALL SELECT * FROM nbuck
), grid AS (SELECT DISTINCT col, kind, bucket FROM binned),
fullg AS (
  SELECT g.col, g.kind, g.bucket, s.side, COALESCE(b.c, 0) AS c
  FROM grid g
  CROSS JOIN (SELECT 0 AS side UNION ALL SELECT 1) s
  LEFT JOIN binned b ON b.col = g.col AND b.bucket = g.bucket
                     AND b.side = s.side
), tot AS (
  SELECT col, side, SUM(c) AS n, COUNT(*) AS n_bins
  FROM fullg GROUP BY 1, 2
), p AS (
  SELECT f.col, f.kind, f.bucket, f.side,
         (f.c + CAST(0.5 AS DOUBLE))
           / (t.n + CAST(0.5 AS DOUBLE) * t.n_bins) AS p,
         t.n, t.n_bins
  FROM fullg f JOIN tot t ON t.col = f.col AND t.side = f.side
)
SELECT pa.col AS "column", ANY_VALUE(pa.kind) AS kind,
       ANY_VALUE(pa.n_bins) AS n_bins,
       CAST(ANY_VALUE(pa.n) AS BIGINT) AS n_a,
       CAST(ANY_VALUE(pb.n) AS BIGINT) AS n_b,
       ROUND(SUM((pa.p - pb.p) * ln(pa.p / pb.p)), 6) AS psi
FROM p pa
JOIN p pb ON pb.col = pa.col AND pb.bucket = pa.bucket
         AND pa.side = 0 AND pb.side = 1
GROUP BY 1
"""


def _sql_drift_report() -> str:
    return _sql_drift(None)

def _q_drift_report_pinned(spark, sf_dir):
    """drift_report with a PINNED numeric bin spec (r6 verdict #8): the
    same engineered drift as drift_report_orders, but o_totalprice
    buckets over caller-provided (1000, 500000) bounds with edge
    clamping — the production shape where the reference side's bin spec
    is derived once and persisted, so the report never rescans the
    historical snapshot for min/max. The combined-range pass is absent
    from the plan (pinned bounds are literals); values outside the
    range clamp into the edge buckets. The oracle replays the literal
    bounds and the clamp."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import drift_report

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = o.where(F.col("o_orderkey") % 2 == 0)
    b = o.where(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_totalprice") > 100000)
    )
    return drift_report(
        a,
        b,
        categorical=["o_orderpriority"],
        numeric=["o_totalprice"],
        numeric_bounds={"o_totalprice": (1000.0, 500000.0)},
    )

def _sql_drift_report_pinned() -> str:
    return _sql_drift(("1000.0", "500000.0"))

def _q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key (operators/layout.zorder_key):
    orders quantized on (o_custkey, o_totalprice) to 8-bit ranks over
    their min/max (one broadcast range row), bits interleaved into one
    long — the Delta/Iceberg OPTIMIZE ZORDER layout strategy as pure
    integer expressions. The oracle replays quantize + interleave
    bit-for-bit; a wrong shift order, clamp, or range handling changes
    every key."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import zorder_key

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rng = o.agg(
        F.min("o_custkey").alias("lo_c"),
        F.max("o_custkey").alias("hi_c"),
        F.min("o_totalprice").alias("lo_p"),
        F.max("o_totalprice").alias("hi_p"),
    )
    z = zorder_key(
        [F.col("o_custkey"), F.col("o_totalprice")],
        [F.col("lo_c"), F.col("lo_p")],
        [F.col("hi_c"), F.col("hi_p")],
        bits=8,
    )
    return o.crossJoin(F.broadcast(rng)).select(
        "o_orderkey", z.alias("zval")
    )


def _sql_zorder_key(bits: int = 8) -> str:
    def cell(c, lo, hi):
        return (
            f"CASE WHEN {hi} = {lo} THEN 0 ELSE "
            f"LEAST(GREATEST(CAST(FLOOR(({c} - {lo}) / (({hi} - {lo}) "
            f"/ CAST({1 << bits} AS DOUBLE))) AS BIGINT), 0), "
            f"{(1 << bits) - 1}) END"
        )

    terms = []
    for i in range(bits):
        for j in range(2):
            terms.append(f"(((c{j} >> {i}) & 1) << {i * 2 + j})")
    return f"""
WITH rng AS (
  SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo_c,
         CAST(MAX(o_custkey) AS DOUBLE) AS hi_c,
         CAST(MIN(o_totalprice) AS DOUBLE) AS lo_p,
         CAST(MAX(o_totalprice) AS DOUBLE) AS hi_p
  FROM orders
), cells AS (
  SELECT o_orderkey,
         {cell('CAST(o_custkey AS DOUBLE)', 'lo_c', 'hi_c')} AS c0,
         {cell('CAST(o_totalprice AS DOUBLE)', 'lo_p', 'hi_p')} AS c1
  FROM orders, rng
)
SELECT o_orderkey, CAST({' + '.join(terms)} AS BIGINT) AS zval
FROM cells
"""


def _q_zorder_skip(spark, sf_dir):
    """Z-order SKIP-PROOF (r7 verdict #4): zorder_key_orders pins the
    key arithmetic; this gate pins the PAYOFF. Orders are written twice
    as real parquet with fixed 512-row row groups — once z-ordered on
    (o_custkey, o_totalprice), once single-column-sorted — and the
    footer min/max stats are audited against a 2-D range box covering
    10-30% of each dimension (exactly the parquet reader's pruning
    rule: scan iff [min,max] intersects the box on EVERY column). The
    oracle PREDICTS the same counts from first principles — rank rows
    by the replayed z-key, bucket by rank/512, min/max per bucket — so
    a match proves the written files' footers carry the predicted
    clustering and the skip counts are real, not luck. The write goes
    through pyarrow driver-side for byte-deterministic row-group
    boundaries (fixture-scale audit; the production write path is
    zorder_repartition + Spark's writer, where each range partition
    becomes a file with the same tight footers)."""
    return _zorder_skip_rows(spark, sf_dir, rgs=512)


def _zorder_skip_rows(spark, sf_dir, rgs):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import (
        row_group_skip_audit,
        row_group_stats,
        zorder_key,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    rng = o.agg(
        F.min("o_custkey").alias("lo_c"),
        F.max("o_custkey").alias("hi_c"),
        F.min("o_totalprice").alias("lo_p"),
        F.max("o_totalprice").alias("hi_p"),
    ).first()
    lo_c, hi_c = float(rng["lo_c"]), float(rng["hi_c"])
    lo_p, hi_p = float(rng["lo_p"]), float(rng["hi_p"])
    z = zorder_key(
        [F.col("o_custkey"), F.col("o_totalprice")],
        [F.lit(lo_c), F.lit(lo_p)],
        [F.lit(hi_c), F.lit(hi_p)],
        bits=8,
    )
    zdf = o.withColumn("zval", z)
    box = {
        "o_custkey": (lo_c + 0.1 * (hi_c - lo_c), lo_c + 0.3 * (hi_c - lo_c)),
        "o_totalprice": (
            lo_p + 0.1 * (hi_p - lo_p),
            lo_p + 0.3 * (hi_p - lo_p),
        ),
    }
    tmp = scratch_dir(prefix="zskip_")
    rows = []
    for layout, order in (
        ("zorder", [F.col("zval"), F.col("o_orderkey")]),
        ("linear", [F.col("o_custkey"), F.col("o_orderkey")]),
    ):
        pdf = (
            zdf.orderBy(*order)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .toPandas()
        )
        path = os.path.join(tmp, f"{layout}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            path,
            row_group_size=rgs,
        )
        stats = row_group_stats(path, ["o_custkey", "o_totalprice"])
        n_groups, n_scanned = row_group_skip_audit(stats, box)
        rows.append((layout, n_groups, n_scanned, n_groups - n_scanned))
    from ratatool_spark.functions.localrel import local_df

    return local_df(
        spark, rows,
        "layout string, n_groups int, n_scanned int, n_pruned int",
    )


def _sql_zorder_skip(bits: int = 8, rgs: int = 512) -> str:
    def cell(c, lo, hi):
        return (
            f"CASE WHEN {hi} = {lo} THEN 0 ELSE "
            f"LEAST(GREATEST(CAST(FLOOR(({c} - {lo}) / (({hi} - {lo}) "
            f"/ CAST({1 << bits} AS DOUBLE))) AS BIGINT), 0), "
            f"{(1 << bits) - 1}) END"
        )

    terms = []
    for i in range(bits):
        for j in range(2):
            terms.append(f"(((c{j} >> {i}) & 1) << {i * 2 + j})")
    hit = (
        "mx_c >= b.c_lo AND mn_c <= b.c_hi "
        "AND mx_p >= b.p_lo AND mn_p <= b.p_hi"
    )
    leg = """SELECT '{name}' AS layout,
       CAST(COUNT(*) AS INT) AS n_groups,
       CAST(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS INT) AS n_scanned,
       CAST(COUNT(*) - SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS INT)
         AS n_pruned
FROM {grp}, box b"""
    return f"""
WITH rng AS (
  SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo_c,
         CAST(MAX(o_custkey) AS DOUBLE) AS hi_c,
         CAST(MIN(o_totalprice) AS DOUBLE) AS lo_p,
         CAST(MAX(o_totalprice) AS DOUBLE) AS hi_p
  FROM orders
), box AS (
  SELECT lo_c + CAST(0.1 AS DOUBLE) * (hi_c - lo_c) AS c_lo,
         lo_c + CAST(0.3 AS DOUBLE) * (hi_c - lo_c) AS c_hi,
         lo_p + CAST(0.1 AS DOUBLE) * (hi_p - lo_p) AS p_lo,
         lo_p + CAST(0.3 AS DOUBLE) * (hi_p - lo_p) AS p_hi
  FROM rng
), cells AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         {cell('CAST(o_custkey AS DOUBLE)', 'lo_c', 'hi_c')} AS c0,
         {cell('CAST(o_totalprice AS DOUBLE)', 'lo_p', 'hi_p')} AS c1
  FROM orders, rng
), zd AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST({' + '.join(terms)} AS BIGINT) AS zval
  FROM cells
), rz AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1 AS rn
  FROM zd
), gz AS (
  SELECT FLOOR(rn / {rgs}) AS g,
         MIN(o_custkey) AS mn_c, MAX(o_custkey) AS mx_c,
         MIN(o_totalprice) AS mn_p, MAX(o_totalprice) AS mx_p
  FROM rz GROUP BY 1
), rl AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) - 1 AS rn
  FROM zd
), gl AS (
  SELECT FLOOR(rn / {rgs}) AS g,
         MIN(o_custkey) AS mn_c, MAX(o_custkey) AS mx_c,
         MIN(o_totalprice) AS mn_p, MAX(o_totalprice) AS mx_p
  FROM rl GROUP BY 1
)
{leg.format(name='zorder', hit=hit, grp='gz')}
UNION ALL
{leg.format(name='linear', hit=hit, grp='gl')}
"""


def _q_rendezvous_shard(spark, sf_dir):
    """Rendezvous / HRW sharding (operators/layout.rendezvous_shard):
    orders assigned to 5 named shards by argmax of the portable hash of
    (seed ␁ shard ␁ key) — the assignment where adding/removing a shard
    moves only ~1/n of the keys (pinned by test). Reported as per-shard
    counts + key checksums; the oracle replays the per-shard hashes and
    the (hash, name) argmax."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import rendezvous_shard

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    shards = [f"s{i}" for i in range(5)]
    return (
        o.select(
            "o_orderkey",
            rendezvous_shard(F.col("o_orderkey"), shards, seed=9).alias(
                "shard"
            ),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


def _sql_rendezvous_shard() -> str:
    ph = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
    shards = [f"s{i}" for i in range(5)]
    structs = ", ".join(
        "{"
        + f"'h': {ph.format(x=f_concat)}, 'shard': '{s}'"
        + "}"
        for s, f_concat in [
            (s, f"concat_ws(chr(1), '9', '{s}', CAST(o_orderkey AS VARCHAR))")
            for s in shards
        ]
    )
    return f"""
WITH assigned AS (
  SELECT o_orderkey,
         (list_reverse(list_sort([{structs}])))[1]['shard'] AS shard
  FROM orders
)
SELECT shard, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM assigned GROUP BY shard
"""


def _q_mad_outliers(spark, sf_dir):
    """Robust MAD outlier flags (operators/profile.mad_outliers):
    Iglewicz–Hoaglin modified z over l_extendedprice per returnflag,
    exact-percentile mode (the oracle-portable setting; percentile_approx
    is the constant-memory 100 TB default), summarized per group. Values
    quantize to fixed-point longs before any quantile, so median, MAD
    and every z are deterministic engine-portable arithmetic — DuckDB
    replays them exactly via quantile_cont."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import mad_outliers

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    flagged = mad_outliers(li, "l_extendedprice", ["l_returnflag"])
    return flagged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        F.round(F.max(F.abs(F.col("robust_z"))), 6).alias("max_abs_z"),
        F.round(F.min("robust_z"), 6).alias("min_z"),
    )

def _sql_mad_outliers() -> str:
    return """
WITH v AS (
  SELECT l_returnflag AS g,
         CAST(ROUND(l_extendedprice * 1000000) AS BIGINT) AS v
  FROM lineitem
), med AS (
  SELECT g, quantile_cont(v, 0.5) AS med FROM v GROUP BY 1
), mad AS (
  SELECT v.g, quantile_cont(ABS(v.v - m.med), 0.5) AS mad,
         ANY_VALUE(m.med) AS med
  FROM v JOIN med m ON m.g = v.g GROUP BY v.g
), z AS (
  SELECT v.g,
    CASE WHEN d.mad > 0
         THEN ROUND(0.6745 * (v.v - d.med) / d.mad, 6) END AS z,
    CASE WHEN d.mad > 0
         THEN ABS(ROUND(0.6745 * (v.v - d.med) / d.mad, 6)) > 3.5
         ELSE (v.v - d.med) <> 0 END AS f
  FROM v JOIN mad d ON d.g = v.g
)
SELECT g AS l_returnflag, COUNT(*) AS n,
       CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MAX(ABS(z)), 6) AS max_abs_z,
       ROUND(MIN(z), 6) AS min_z
FROM z GROUP BY 1
"""

def _q_mutual_info(spark, sf_dir):
    """Mutual-information leakage audit (operators/profile
    mutual_information): pairwise MI / marginal entropies / normalized
    score over orders columns, including one engineered leak
    (o_orderpriority vs its own first character — nmi must be 1.0 by
    determinism) next to two organic pairs. Pure entropy algebra from
    ONE melt + groupBy counts table re-aggregated three ways — no
    windows, no single-task stage at any cardinality; DuckDB replays the
    identical ln/ROUND arithmetic."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import mutual_information

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus",
        "o_orderpriority",
        F.substring("o_orderpriority", 1, 1).alias("o_prio_head"),
    )
    return mutual_information(
        o,
        [
            ("o_orderstatus", "o_orderpriority"),
            ("o_orderpriority", "o_prio_head"),
            ("o_orderstatus", "o_orderstatus"),
        ],
    )

def _sql_mutual_info() -> str:
    pair_sql = []
    for x, y in [
        ("o_orderstatus", "o_orderpriority"),
        ("o_orderpriority", "o_prio_head"),
        ("o_orderstatus", "o_orderstatus"),
    ]:
        pair_sql.append(
            f"SELECT '{x}' AS x_col, '{y}' AS y_col, "
            f"CAST({x} AS VARCHAR) AS x, CAST({y} AS VARCHAR) AS y FROM o"
        )
    melted = " UNION ALL ".join(pair_sql)
    return f"""
WITH o AS (
  SELECT o_orderstatus, o_orderpriority,
         substr(o_orderpriority, 1, 1) AS o_prio_head
  FROM orders
), melted AS ({melted}),
counts AS (
  SELECT x_col, y_col, x, y, COUNT(*) AS c FROM melted GROUP BY 1, 2, 3, 4
), joint AS (
  SELECT x_col, y_col, CAST(SUM(c) AS BIGINT) AS n,
         SUM(c * ln(c)) AS j FROM counts GROUP BY 1, 2
), mx AS (
  SELECT x_col, y_col, SUM(c * ln(c)) AS m FROM (
    SELECT x_col, y_col, x, SUM(c) AS c FROM counts GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
), my AS (
  SELECT x_col, y_col, SUM(c * ln(c)) AS m FROM (
    SELECT x_col, y_col, y, SUM(c) AS c FROM counts GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
)
SELECT j.x_col, j.y_col, j.n,
  ROUND(ln(j.n) - mx.m / j.n, 6) AS h_x,
  ROUND(ln(j.n) - my.m / j.n, 6) AS h_y,
  ROUND(ln(j.n) + (j.j - mx.m - my.m) / j.n, 6) AS mi,
  ROUND(CASE WHEN LEAST(ln(j.n) - mx.m / j.n, ln(j.n) - my.m / j.n) > 0
             THEN (ln(j.n) + (j.j - mx.m - my.m) / j.n)
                  / LEAST(ln(j.n) - mx.m / j.n, ln(j.n) - my.m / j.n)
             ELSE 0.0 END, 6) AS nmi
FROM joint j
JOIN mx ON mx.x_col = j.x_col AND mx.y_col = j.y_col
JOIN my ON my.x_col = j.x_col AND my.y_col = j.y_col
"""

def _q_pagerank(spark, sf_dir):
    """Fixed-point PageRank (operators/graph.pagerank): link-graph
    centrality as a corpus-quality prior, run on a 59-node supplier→part
    projection of lineitem (distinct edges, self-loops dropped). Every
    superstep is integer arithmetic — rank div out_degree contributions,
    rational damping, integer dangling redistribution — so 4 iterations
    replay BIT-IDENTICALLY in DuckDB as chained unrolled CTEs: the gate
    pins the whole iterative computation exactly, not within a band.
    Scale shape: one edge-shuffle join + one aggregate per superstep,
    rank state hash-partitioned by node, lineage cut per iteration."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.graph import pagerank

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_suppkey") % 59).alias("src"),
        (F.col("l_partkey") % 59).alias("dst"),
    )
    return pagerank(li, iterations=4).select("node", "rank_fx")

def _sql_pagerank() -> str:
    S, num, den, K = 10**9, 85, 100, 4
    # CAST the literals: bare 1000000000 parses as INT32 in DuckDB and
    # the *15 product overflows before promotion
    base = (
        f"((CAST({S} AS BIGINT) * {den - num}) // {den}) // (SELECT n FROM nn)"
    )
    parts = [
        "WITH e AS (SELECT DISTINCT l_suppkey % 59 AS src, "
        "l_partkey % 59 AS dst FROM lineitem "
        "WHERE l_suppkey % 59 <> l_partkey % 59)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS outd FROM e GROUP BY 1)",
        f"r0 AS (SELECT node, CAST({S} AS BIGINT) // (SELECT n FROM nn) AS r FROM nodes)",
    ]
    for i in range(1, K + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.r // d.outd) AS s "
            f"FROM r{i-1} r JOIN e ON e.src = r.node "
            f"JOIN deg d ON d.src = e.src GROUP BY 1)"
        )
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.r), 0) AS dang FROM r{i-1} r "
            f"WHERE r.node NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, {base} + ({num} * (COALESCE(c.s, 0) "
            f"+ ((SELECT dang FROM d{i}) // (SELECT n FROM nn)))) // {den} AS r "
            f"FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, CAST(r AS BIGINT) AS rank_fx FROM r{K}"
    )

def _q_url_normalize(spark, sf_dir):
    """URL canonicalization (functions/urls): messy crawl-style URLs —
    mixed-case scheme/host, www variants, default and non-default ports,
    tracking parameters in shuffled order, fragments — synthesized
    deterministically from the documents table, then normalized to the
    canonical crawl-identity key plus host and eTLD+1 registered domain
    (two-level-suffix heuristic: the fixture exercises both .co.uk and
    .com hosts). Everything is one expression tree (0 py boundaries, no
    shuffle — embarrassingly parallel over a 100 TB frontier), and the
    DuckDB oracle replays every rule, so canonical keys agree across
    engines — the property URL-level dedup and per-domain caps rest on."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.urls import (
        normalize_url,
        registered_domain,
        url_host,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("HTTPS://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.upper(F.col("source")),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".Example.CO.UK")).otherwise(
            F.lit(".example.COM")
        ),
        F.when(F.col("doc_id") % 11 == 0, F.lit(":8080"))
        .when(F.col("doc_id") % 5 == 0, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit("?utm_source=x&ref=abc&utm_medium=y"),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit("?b=2&a=1"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    with_url = d.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        normalize_url(F.col("url")).alias("url_norm"),
        url_host(F.col("url")).alias("host"),
        registered_domain(url_host(F.col("url"))).alias("domain"),
    )

def _sql_url_normalize() -> str:
    from ratatool_spark.functions.urls import (
        TRACKING_NAMES,
        TWO_LEVEL_SUFFIXES,
    )

    names = ", ".join(f"'{n}'" for n in TRACKING_NAMES)
    suffixes = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return f"""
WITH base AS (
  SELECT doc_id,
    'HTTPS://' || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
    UPPER(source) ||
    CASE WHEN doc_id % 2 = 0 THEN '.Example.CO.UK' ELSE '.example.COM' END ||
    CASE WHEN doc_id % 11 = 0 THEN ':8080'
         WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
    '/' || lang || '/' || CAST(doc_id AS VARCHAR) ||
    CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&ref=abc&utm_medium=y'
         WHEN doc_id % 4 = 1 THEN '?b=2&a=1' ELSE '' END ||
    CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
), parsed AS (
  SELECT doc_id, url,
    LOWER(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS authority,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM base
), hp AS (
  SELECT doc_id, scheme, path, query,
    LOWER(string_split(authority, ':')[1]) AS host,
    CASE WHEN len(string_split(authority, ':')) > 1
         THEN string_split(authority, ':')[2] ELSE NULL END AS port
  FROM parsed
), np AS (
  SELECT doc_id, scheme, host, path,
    CASE WHEN port IS NOT NULL
              AND NOT ((scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443'))
         THEN ':' || port ELSE '' END AS port_part,
    list_sort(list_filter(string_split(query, '&'),
        p -> NOT starts_with(string_split(p, '=')[1], 'utm_')
             AND string_split(p, '=')[1] NOT IN ({names})
             AND p <> '')) AS kept
  FROM hp
), dom AS (
  SELECT doc_id, scheme, host, port_part, kept,
    CASE WHEN path = '' THEN '/' ELSE path END AS path_part,
    string_split(host, '.') AS labels
  FROM np
)
SELECT doc_id,
  scheme || '://' || host || port_part || path_part ||
    CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
         ELSE '' END AS url_norm,
  host,
  CASE WHEN len(labels) <= 2 THEN host
       WHEN labels[-2] || '.' || labels[-1] IN ({suffixes})
            AND len(labels) >= 3
       THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
       ELSE labels[-2] || '.' || labels[-1] END AS domain
FROM dom
"""

def _q_ivf_index_incremental(spark, sf_dir):
    """Incremental IVF index maintenance (operators/similarity
    update_ivf_index): build the persisted index on the even-id half of
    the corpus (centroids = deterministic hash-sample of THAT slice,
    train_iters=0), append the odd-id half against the frozen sidecar
    centroids, reload, query. The gate pins the maintenance contract:
    update(B) after build(A) is row-identical to one build over A ∪ B
    with the A-seeded centroids — which is exactly what the oracle
    replays (centroid sample restricted to even ids; assignment over
    the full table). New-batch work is one GEMM pass; the stored index
    is only scanned id-pruned for the fused duplicate-id guard."""

    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
        update_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    path = scratch_dir(prefix="ivf_incr_") + "/index"
    build_ivf_index(a, path, n_centroids=8, train_iters=0)
    update_ivf_index(spark, path, b)
    q = emb.where(F.col("vec_id") < 5)
    out = query_ivf_index(spark, q, path, k=3, n_probe=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )

def _sql_ivf_index_incremental() -> str:
    # ann_ivf_topk's replay with ONE change: the centroid hash-sample is
    # restricted to the even-id build slice (assignment still covers the
    # full table) — update-after-build == build-over-union, A-seeded.
    base = _sql_ann_ivf_topk()
    out = base.replace(
        ") AS rn, embedding FROM embeddings",
        ") AS rn, embedding FROM embeddings WHERE vec_id % 2 = 0",
        1,
    )
    assert out != base
    return out

def _q_compaction_plan(spark, sf_dir):
    """Small-files compaction planning (operators/layout.compaction_plan):
    a per-partition byte manifest (lineitem rows per ship date x a
    96-byte/row proxy) bin-packed into ~500 KB compaction bins by the
    size-desc cumulative-sum rule. The running sum is DISTRIBUTED (range
    partition + per-partition sums + broadcast prefix offsets — see the
    operator docstring); the oracle replays it as one SQL window."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import compaction_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    manifest = li.groupBy(F.col("l_shipdate").alias("part")).agg(
        (F.count(F.lit(1)) * F.lit(96)).alias("bytes")
    )
    return compaction_plan(manifest, "bytes", ["part"], 500_000).select(
        "part", "bytes", "bin"
    )

_SQL_COMPACTION_PLAN = """
WITH manifest AS (
  SELECT l_shipdate AS part, COUNT(*) * 96 AS bytes
  FROM lineitem GROUP BY l_shipdate
)
SELECT part, bytes,
       CAST(FLOOR(COALESCE(SUM(bytes) OVER (ORDER BY bytes DESC, part
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / CAST(500000 AS DOUBLE)) AS INT) AS bin
FROM manifest
"""


def _q_hilbert_key(spark, sf_dir):
    """Hilbert-curve clustering key (operators/layout.hilbert_attach —
    Skilling 2004, the curve behind liquid clustering): orders
    quantized on (o_custkey, o_totalprice) to 8-bit ranks, then the
    transpose algorithm runs as a linear projection chain of pure
    integer CASE/shift/xor expressions. The oracle replays every
    step as a CTE chain FROM THE SAME step generator (only the xor
    spelling differs per engine) — a wrong rotation, Gray step, or
    bit placement changes keys everywhere. Unlike Morton order,
    consecutive keys are always ADJACENT cells (pinned by the
    layout-locality unit test), which is why Hilbert boxes are
    tighter than z-order boxes at the same bit budget."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import hilbert_attach

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return hilbert_attach(
        o, ["o_custkey", "o_totalprice"], bits=8, h_col="hval"
    ).select("o_orderkey", "hval")


def _sql_hilbert_key(bits: int = 8) -> str:
    from ratatool_spark.operators.layout import (
        hilbert_index_expr,
        hilbert_steps,
    )

    def cell(c, lo, hi):
        return (
            f"CASE WHEN {hi} = {lo} THEN 0 ELSE "
            f"LEAST(GREATEST(CAST(FLOOR(({c} - {lo}) / (({hi} - {lo}) "
            f"/ CAST({1 << bits} AS DOUBLE))) AS BIGINT), 0), "
            f"{(1 << bits) - 1}) END"
        )

    steps, names = hilbert_steps(2, bits, lambda a, b: f"xor({a}, {b})")
    ctes = [
        """rng AS (
  SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo_c,
         CAST(MAX(o_custkey) AS DOUBLE) AS hi_c,
         CAST(MIN(o_totalprice) AS DOUBLE) AS lo_p,
         CAST(MAX(o_totalprice) AS DOUBLE) AS hi_p
  FROM orders
)""",
        f"""s0 AS (
  SELECT o_orderkey,
         {cell('CAST(o_custkey AS DOUBLE)', 'lo_c', 'hi_c')} AS x0_0,
         {cell('CAST(o_totalprice AS DOUBLE)', 'lo_p', 'hi_p')} AS x1_0
  FROM orders, rng
)""",
    ]
    prev = "s0"
    for k, step in enumerate(steps, 1):
        assigns = ", ".join(f"{e} AS {nm}" for nm, e in step)
        ctes.append(f"s{k} AS (SELECT *, {assigns} FROM {prev})")
        prev = f"s{k}"
    return (
        f"WITH {', '.join(ctes)}\n"
        f"SELECT o_orderkey, "
        f"CAST({hilbert_index_expr(names, bits)} AS BIGINT) AS hval "
        f"FROM {prev}"
    )
