"""Corpus curation gates: filters, classifiers, chunking, contamination.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


from ratatool_spark.gates._common import _dice_sql
from ratatool_spark.gates.pipeline import (
    _MINHASH_K,
    _PH64_SQL,
    _SHINGLES3_SQL,
    _WORDS_SQL,
    _sql_near_dedup,
)


# ------------------------------------------------------------------ corpus
# curation operators (operators/corpus.py): repetition, mixture, leakage

_NGRAMS2_SQL = (
    "list_transform(range(1, greatest(len({w}) - 1, 1) + 1), "
    "i -> concat_ws(' ', {w}[i], {w}[i+1]))"
).format(w=_WORDS_SQL)

_MIXTURE_SHARES = {"src0": 0.4, "src1": 0.4, "src2": 0.2}

def _q_dedup_incremental(spark, sf_dir):
    """Incremental near-dedup (operators/dedup.dedup_against): odd-id docs
    (the "new crawl") LSH-joined against even-id docs (the "existing
    corpus"), candidates verified with exact Jaccard. Cross-side banded
    equi-join — cost scales with the new batch, never corpus²."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import dedup_against

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    out = dedup_against(new, corpus, num_hashes=_MINHASH_K, bands=8,
                        threshold=0.3)
    return out.select(
        "id_new",
        "id_corpus",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.round("jaccard", 6).alias("jaccard"),
    )

def _sql_dedup_incremental() -> str:
    from ratatool_spark.operators.dedup import MINHASH_P, minhash_coeffs

    k, bands = _MINHASH_K, 8
    rpb = k // bands
    sig_exprs = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_coeffs(k))
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, ".format(b=b)
        + _PH64_SQL.format(
            x="concat_ws('|', "
            + ", ".join(f"CAST(sig_{i} AS VARCHAR)" for i in range(b * rpb, (b + 1) * rpb))
            + ")"
        )
        + " AS bh, "
        + ", ".join(f"sig_{i}" for i in range(k))
        + " FROM sigs"
        for b in range(bands)
    )
    matches = " + ".join(
        f"CASE WHEN l.sig_{i} = r.sig_{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
WITH shingled0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s0 FROM documents
), shingled AS (
  SELECT doc_id, {_PH64_SQL.format(x='s0')} % {MINHASH_P} AS h FROM shingled0
), sigs AS (
  SELECT doc_id, {sig_exprs} FROM shingled GROUP BY doc_id
), banded AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT l.doc_id AS id_new, r.doc_id AS id_corpus,
         ROUND(({matches}) / {float(k)}, 6) AS est_jaccard
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bh = r.bh
  WHERE l.doc_id % 2 = 1 AND r.doc_id % 2 = 0
), dsh AS (
  SELECT DISTINCT doc_id, {_PH64_SQL.format(x='s0')} AS s FROM shingled0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_new, b.doc_id AS id_corpus, COUNT(*) AS common
  FROM dsh a JOIN dsh b ON a.s = b.s
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.id_new, c.id_corpus, c.est_jaccard,
       ROUND(COALESCE(i.common, 0)
             / CAST(na.n + nb.n - COALESCE(i.common, 0) AS DOUBLE), 6)
         AS jaccard
FROM cand c
LEFT JOIN inter i ON i.id_new = c.id_new AND i.id_corpus = c.id_corpus
JOIN sizes na ON na.doc_id = c.id_new
JOIN sizes nb ON nb.doc_id = c.id_corpus
WHERE COALESCE(i.common, 0)
      / CAST(na.n + nb.n - COALESCE(i.common, 0) AS DOUBLE) >= 0.3
"""

def _q_corpus_repetition(spark, sf_dir):
    """Gopher-style repetition signals (operators/corpus.py): per-doc
    bigram occurrence totals + top-bigram / duplicated-bigram fractions.
    One explode, two keyed aggregations — partial agg collapses each
    doc's gram counts map-side."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import repetition_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = repetition_metrics(docs, n=2)
    return out.select(
        "doc_id",
        "n_ngrams",
        F.round("top_ngram_frac", 6).alias("top_ngram_frac"),
        F.round("dup_ngram_frac", 6).alias("dup_ngram_frac"),
    )

_SQL_CORPUS_REPETITION = f"""
WITH ex AS (
  SELECT doc_id, UNNEST({_NGRAMS2_SQL}) AS g FROM documents
), per AS (
  SELECT doc_id, g, COUNT(*) AS c FROM ex GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_ngrams,
       ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_ngram_frac,
       ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE), 6)
         AS dup_ngram_frac
FROM per GROUP BY doc_id
"""

def _q_corpus_mixture(spark, sf_dir):
    """Deterministic source-mixture resampling (operators/corpus.py):
    target shares src0:src1:src2 = 2:2:1, keep-rates derived from a tiny
    broadcast-joined aggregate (no driver collect), portable-dice
    selection — the kept set reproduces in any engine."""
    from ratatool_spark.operators.corpus import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = mixture_sample(
        docs, _MIXTURE_SHARES, dice_cols=("doc_id",), seed=7
    )
    return out.select("doc_id", "source", "lang")

def _sql_corpus_mixture(n_expr: str = "COUNT(*)", seed: int = 7) -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {t}::DOUBLE" for s, t in _MIXTURE_SHARES.items()
    )
    return f"""
WITH counts AS (
  SELECT source, {n_expr} AS n FROM documents GROUP BY source
), t AS (
  SELECT source, n, CASE source {cases} END AS tgt FROM counts
  WHERE CASE source {cases} END IS NOT NULL
), k AS (
  SELECT MIN(n / tgt) AS kv FROM t
), rates AS (
  SELECT source, (SELECT kv FROM k) * tgt / n AS rate FROM t
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN rates r ON d.source = r.source
WHERE {_dice_sql(['doc_id'], seed=seed)} < r.rate
"""

def _q_corpus_mixture_tokens(spark, sf_dir):
    """Token-weighted mixture resampling: the same deterministic
    keep-rate machinery with per-source TOKEN sums as the mixture unit —
    what LLM data recipes actually specify. Each row keeps all-or-none
    of its weight; expected kept tokens hit the target ratios."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import token_count
    from ratatool_spark.operators.corpus import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = mixture_sample(
        docs,
        _MIXTURE_SHARES,
        dice_cols=("doc_id",),
        seed=21,
        weight_col=token_count(F.col("text")),
    )
    return out.select("doc_id", "source", "lang")

def _q_corpus_contamination(spark, sf_dir):
    """Benchmark-contamination check (operators/corpus.py): fraction of
    each doc's 3-gram shingles found in a small benchmark slice
    (doc_id % 101 == 0) — the n-gram-overlap train/test leakage method.
    Benchmark shingles broadcast; corpus side never shuffles before the
    per-doc re-agg."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 101 == 0)
    out = contamination(docs, bench, n=3)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round("contamination", 6).alias("contamination"),
    )

_SQL_CORPUS_CONTAMINATION = f"""
WITH ds AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s FROM documents
), bs AS (
  SELECT DISTINCT UNNEST({_SHINGLES3_SQL}) AS s FROM documents
  WHERE doc_id % 101 = 0
), j AS (
  SELECT ds.doc_id, CASE WHEN bs.s IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM ds LEFT JOIN bs ON ds.s = bs.s
)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(hit) AS BIGINT) AS n_contaminated,
       ROUND(SUM(hit) / CAST(COUNT(*) AS DOUBLE), 6) AS contamination
FROM j GROUP BY doc_id
"""

def _q_pii_redact(spark, sf_dir):
    """PII scrub (functions/text.py): RE2-compatible email/IP/phone
    patterns, fixed replace order, match-count audit columns. The corpus
    has no organic PII, so deterministic synthetic PII is appended
    in-query — the redaction chain and counts are what's under test, and
    the identical expression runs in the DuckDB oracle."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import pii_counts, redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 tel 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("txt"),
    )
    n_email, n_ip, n_phone = pii_counts(F.col("txt"))
    return salted.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_ip.alias("n_ipv4"),
        n_phone.alias("n_phones"),
        redact_pii(F.col("txt")).alias("clean"),
    )

_SQL_PII_REDACT = r"""
WITH salted AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com ip 10.0.', CAST(doc_id % 256 AS VARCHAR),
                '.1 tel 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
           AS txt
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
         '\b\d{3}-\d{4}\b', '[PHONE]', 'g') AS clean
FROM salted
"""

_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}

def _q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (corpus.assign_splits):
    one portable-dice roll per row against cumulative weight boundaries —
    membership is stable across runs/engines/partitionings and splits
    are disjoint by construction. Pure CASE expression, no shuffle."""
    from ratatool_spark.operators.corpus import assign_splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return assign_splits(docs, _SPLIT_WEIGHTS, seed=11).select(
        "doc_id", "source", "split"
    )

def _sql_split_assign() -> str:
    # boundaries emitted from the SAME accumulated python floats the Spark
    # side uses, so both engines compare the dice against bit-identical
    # doubles (0.9 + 0.05 != 0.95 in IEEE — repr() keeps the exact value)
    total = sum(_SPLIT_WEIGHTS.values())
    items = list(_SPLIT_WEIGHTS.items())
    acc, whens = 0.0, []
    d = _dice_sql(["doc_id"], seed=11)
    for name, w in items[:-1]:
        acc += w / total
        whens.append(f"WHEN {d} < {acc!r} THEN '{name}'")
    return f"""
SELECT doc_id, source,
       CASE {' '.join(whens)} ELSE '{items[-1][0]}' END AS split
FROM documents
"""

def _q_shuffle_order(spark, sf_dir):
    """Reproducible training-order shuffle (corpus.deterministic_shuffle):
    global position by portable hash, materialized WITHOUT a
    single-partition window (range partition → parallel per-partition
    rank → broadcast exclusive prefix-sum of partition counts)."""
    from ratatool_spark.operators.corpus import deterministic_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return deterministic_shuffle(
        docs, dice_cols=("doc_id",), seed=5, rank_col="pos"
    ).select("pos", "doc_id")

_SQL_SHUFFLE_ORDER = f"""
SELECT row_number() OVER (ORDER BY {_dice_sql(['doc_id'], seed=5)}) AS pos,
       doc_id
FROM documents
"""

def _q_shard_roundtrip(spark, sf_dir):
    """Training-shard sink round-trip (sources/shards.py): deterministic
    portable-hash shard assignment + partitioned layout + manifest; the
    oracle recomputes the shard of every row from the same md5 hash, so
    the assignment itself is cross-engine-gated, not just the rows."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.sources.shards import write_training_shards

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sl = orders.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    out = os.path.join(scratch_dir(prefix="rt_shards_"), "shards")
    write_training_shards(sl, out, n_shards=4, key_cols=["o_orderkey"])
    back = spark.read.parquet(out)
    return back.select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.col("shard").cast("int").alias("shard"),
    )

_SQL_SHARD_ROUNDTRIP = f"""
SELECT o_orderkey, o_custkey, o_orderpriority,
       CAST({_PH64_SQL.format(x="concat_ws(chr(1), '13', CAST(o_orderkey AS VARCHAR))")} % 4 AS INT) AS shard
FROM orders WHERE o_orderkey % 11 = 0
"""

def _q_sliding_windows(spark, sf_dir):
    """Context-window training examples (corpus.sliding_windows): per-user
    ordered event-type windows of 8 with stride 4 — one per-group
    collect + arithmetic-sequence starts + array slices, parallel by
    user."""
    from ratatool_spark.operators.corpus import sliding_windows
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return sliding_windows(
        ev, "user_id", "ts", "event_type", size=8, stride=4,
        out_col="win_text",
    )

_SQL_SLIDING_WINDOWS = """
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts) AS l
  FROM events GROUP BY user_id
), starts AS (
  SELECT user_id, l, UNNEST(range(1, len(l) - 8 + 2, 4)) AS s
  FROM seq WHERE len(l) >= 8
)
SELECT user_id,
       CAST((s - 1) // 4 AS INT) AS win_idx,
       array_to_string(l[s : s + 7], ' ') AS win_text
FROM starts
"""

def _q_training_prep(spark, sf_dir):
    """Composed training-data preparation (the corpus operators chained
    end-to-end): drop high-repetition docs (dup-bigram fraction > 0.5),
    scrub PII, assign train/val/test splits with the deterministic dice,
    and report per-split document/token budgets. One repetition shuffle +
    pure expressions — the composition stays as scan-friendly as its
    parts."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import redact_pii, token_count
    from ratatool_spark.operators.corpus import assign_splits, repetition_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = repetition_metrics(docs, n=2).select(
        "doc_id", "dup_ngram_frac"
    )
    kept = (
        docs.join(rep, "doc_id")
        .where(F.col("dup_ngram_frac") <= 0.5)
        .withColumn("clean", redact_pii(F.col("text")))
    )
    split = assign_splits(kept, _SPLIT_WEIGHTS, seed=11)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("clean"))).alias("n_tokens"),
        )
    )

def _sql_training_prep() -> str:
    total = sum(_SPLIT_WEIGHTS.values())
    items = list(_SPLIT_WEIGHTS.items())
    acc, whens = 0.0, []
    d = _dice_sql(["doc_id"], seed=11)
    for name, w in items[:-1]:
        acc += w / total
        whens.append(f"WHEN {d} < {acc!r} THEN '{name}'")
    case = f"CASE {' '.join(whens)} ELSE '{items[-1][0]}' END"
    return f"""
WITH ex AS (
  SELECT doc_id, UNNEST({_NGRAMS2_SQL}) AS g FROM documents
), per AS (
  SELECT doc_id, g, COUNT(*) AS c FROM ex GROUP BY doc_id, g
), rep AS (
  SELECT doc_id,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE)
           AS dup_frac
  FROM per GROUP BY doc_id
), kept AS (
  SELECT d.doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(d.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '[IP]', 'g'),
           '\\b\\d{{3}}-\\d{{4}}\\b', '[PHONE]', 'g') AS clean
  FROM documents d JOIN rep r ON d.doc_id = r.doc_id
  WHERE r.dup_frac <= 0.5
)
SELECT {case} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(trim(clean), ' '))) AS BIGINT) AS n_tokens
FROM kept GROUP BY 1
"""

def _q_histogram(spark, sf_dir):
    """Single-pass equi-width histogram (operators/profile.histogram):
    caller-provided bounds keep it one scan + one keyed agg; empty
    buckets materialize via a range-frame left join."""
    from ratatool_spark.operators.profile import histogram

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return histogram(li, "l_quantity", lo=1.0, hi=51.0, n_buckets=10)

_SQL_HISTOGRAM = """
WITH counts AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((l_quantity - 1.0::DOUBLE) / 5.0::DOUBLE), 0), 9) AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
)
SELECT CAST(t.i AS INT) AS bucket,
       1.0::DOUBLE + t.i * 5.0::DOUBLE AS lo,
       1.0::DOUBLE + (t.i + 1) * 5.0::DOUBLE AS hi,
       COALESCE(c.cnt, 0) AS cnt
FROM range(10) t(i) LEFT JOIN counts c ON c.bucket = t.i
"""

def _q_quality_checks(spark, sf_dir):
    """Declarative data-quality gate (operators/checks.py): row-level
    predicates fuse into one scan+agg; uniqueness is one keyed groupBy;
    referential integrity is one broadcast anti-join. Mix of passing and
    failing constraints over lineitem→orders."""
    from ratatool_spark.operators.checks import run_checks
    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    li, orders = t["lineitem"], t["orders"]
    return run_checks(
        li,
        [
            {"kind": "not_null", "col": "l_orderkey"},
            {"kind": "in_range", "col": "l_discount", "lo": 0.0, "hi": 0.1},
            {"kind": "in_range", "col": "l_quantity", "lo": 1.0, "hi": 30.0},
            {"kind": "accepted_values", "col": "l_returnflag",
             "values": ["A", "N", "R"]},
            {"kind": "unique", "cols": ["l_orderkey", "l_linenumber"]},
            {"kind": "foreign_key", "col": "l_orderkey", "ref": orders,
             "ref_col": "o_orderkey"},
        ],
    )

_SQL_QUALITY_CHECKS = """
WITH rowchecks AS (
  SELECT
    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
    CAST(SUM(CASE WHEN NOT COALESCE(l_discount >= 0.0 AND l_discount <= 0.1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(SUM(CASE WHEN NOT COALESCE(l_quantity >= 1.0 AND l_quantity <= 30.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
    CAST(SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM lineitem
), uniq AS (
  SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS v FROM (
    SELECT COUNT(*) AS n FROM lineitem
    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
  )
), fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
)
SELECT * FROM (
  SELECT 'not_null:l_orderkey' AS check_name, 'not_null' AS kind, v0 AS n_violations, v0 = 0 AS passed FROM rowchecks
  UNION ALL SELECT 'in_range:l_discount', 'in_range', v1, v1 = 0 FROM rowchecks
  UNION ALL SELECT 'in_range:l_quantity', 'in_range', v2, v2 = 0 FROM rowchecks
  UNION ALL SELECT 'accepted_values:l_returnflag', 'accepted_values', v3, v3 = 0 FROM rowchecks
  UNION ALL SELECT 'unique:l_orderkey,l_linenumber', 'unique', v, v = 0 FROM uniq
  UNION ALL SELECT 'foreign_key:l_orderkey', 'foreign_key', v, v = 0 FROM fk
)
"""

_FUNNEL_STEPS = ["view", "click", "purchase"]

def _q_funnel(spark, sf_dir):
    """Ordered funnel conversion (operators/funnels.py): sequential-min
    step timestamps per user (step i strictly after step i-1), counts of
    users reaching each step. Every join is per-user-aggregate sized."""
    from ratatool_spark.operators.funnels import funnel_counts
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return funnel_counts(ev, _FUNNEL_STEPS)

def _sql_funnel() -> str:
    steps = _FUNNEL_STEPS
    ctes = [
        f"s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t{i} FROM events e "
            f"JOIN s{i - 1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{steps[i]}' AND e.ts > p.t{i - 1} "
            f"GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, '{s}' AS step_name, "
        f"(SELECT COUNT(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps)
    )
    return f"WITH {', '.join(ctes)} {selects}"

def _q_retention(spark, sf_dir):
    """Cohort retention triangle (operators/funnels.py): first-active-day
    cohorts × day offsets, one distinct + one per-user min + one join."""
    from ratatool_spark.operators.funnels import retention_cohorts
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return retention_cohorts(ev, grain="day")

_SQL_RETENTION = """
WITH per AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS p
  FROM events
), firsts AS (
  SELECT user_id, MIN(p) AS cohort FROM per GROUP BY user_id
)
SELECT f.cohort,
       CAST(date_diff('day', CAST(f.cohort AS DATE), CAST(per.p AS DATE)) AS BIGINT)
         AS period_offset,
       COUNT(*) AS n_users
FROM per JOIN firsts f ON per.user_id = f.user_id
GROUP BY 1, 2
"""

def _q_bpe_pairs(spark, sf_dir):
    """BPE-training pair statistics (corpus.bpe_pair_counts): corpus
    collapses to distinct words + frequencies, then weighted adjacent
    char-pair counts — top 50 with deterministic tiebreak."""
    from ratatool_spark.operators.corpus import bpe_pair_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_pair_counts(docs, top_k=50)

_SQL_BPE_PAIRS = f"""
WITH words AS (
  SELECT UNNEST({_WORDS_SQL}) AS w FROM documents
), wf AS (
  SELECT w, COUNT(*) AS freq FROM words GROUP BY w
), pairs AS (
  SELECT freq,
         UNNEST(list_transform(range(1, greatest(length(w) - 1, 1) + 1),
                               i -> substr(w, CAST(i AS INT), 2))) AS pair
  FROM wf
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
FROM pairs WHERE length(pair) = 2
GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 50
"""

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]

def _q_profile_orders(spark, sf_dir):
    """Single-pass table profiler (operators/profile.py): per-column
    completeness / cardinality / range as ONE scan + ONE aggregation
    (map-side partials) + plan-side unpivot. exact_distinct for the
    engine-portable oracle; the default approx HLL is the 100 TB mode."""
    from ratatool_spark.operators.profile import profile_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return profile_table(orders, _PROFILE_COLS, exact_distinct=True)

def _sql_profile_orders() -> str:
    parts = [
        f"""
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       (COUNT(*) - COUNT({c})) / CAST(COUNT(*) AS DOUBLE) AS null_frac,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)

def _q_orc_roundtrip(spark, sf_dir):
    """S-family extension: parquet → ORC sink → ORC scan (Spark-native
    columnar format, zero extra deps). Same envelope as the avro/proto
    round-trips: executors write one file per partition, the read is a
    parallel columnar scan with pushdown."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import read_table, write_table

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    sl = part.where(F.col("p_partkey") % 13 == 0).coalesce(8)
    out = os.path.join(scratch_dir(prefix="rt_orc_"), "part.orc")
    write_table(sl, out, fmt="orc")
    return read_table(spark, out, fmt="orc")

_SQL_ORC_ROUNDTRIP = "SELECT * FROM part WHERE p_partkey % 13 = 0"

def _q_hash_murmur(spark, sf_dir):
    """F-family: seeded-hasher parity surface — Guava murmur3_128 (the
    reference's --hashAlgorithm=murmur, Util.scala:89-91) and FARM_FINGERPRINT
    (farm, Util.scala:93-98) over a deterministic key set, computed through
    the Arrow-batched pandas UDFs the sampling dice uses. The oracle pins
    the exact signed-64 values (frozen from the Guava-parity ports), so a
    regression in either hash backend or the UDF plumbing hash-mismatches."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.hashing import farmhash_udf, murmur_udf

    keys = spark.range(64).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    )
    return keys.select(
        "key",
        murmur_udf(0)(F.col("key")).alias("mm0"),
        murmur_udf(42)(F.col("key")).alias("mm42"),
        farmhash_udf()(F.col("key")).alias("farm"),
    )

# frozen from the Guava-parity ports (tests/test_murmur3.py,
# tests/test_farmhash.py property-check them against the JVM)
_SQL_HASH_MURMUR = """
SELECT key, mm0::BIGINT AS mm0, mm42::BIGINT AS mm42, farm::BIGINT AS farm
FROM (VALUES
    ('k0', 5638682346300632201, -6760912403798876527, -4200605769338195404),
    ('k1', -8074529310846540294, -3232290077556560068, 172997202314879721),
    ('k2', 4484800124627840859, 4807871903044855506, -7709957941962417966),
    ('k3', 380614279118232336, 1963977346661094181, -4121991305452983291),
    ('k4', 2420133920693818071, 7939441987118225074, -7790748566264815425),
    ('k5', -789798059763349783, 920954946631072916, 4743813569818449794),
    ('k6', 7251686905970436794, -239026248965348756, -4034081797651000517),
    ('k7', -169368837816379299, -5926044805906869324, 3263600370761822972),
    ('k8', -6667064248711358245, -5441942315072611613, -944363457787013718),
    ('k9', 8213248992566546268, 3200900397238197702, 2867736823235683722),
    ('k10', 1757497478541887795, -2083088613898771141, 6855969311477391034),
    ('k11', 3949038808230990667, 6983876883383205466, 9216031974988741904),
    ('k12', -7033474559446658500, 1704716331305725586, 6289966350840739334),
    ('k13', -3661324451336469342, 5127898576859346197, 8474017737007776033),
    ('k14', -6125567800597010821, -5665082561526854047, -6900910546847625249),
    ('k15', -4683429249642288694, 3150159258679438050, -2772328107842400059),
    ('k16', -4026534210088645498, 1263556764257783994, 8970560655713416363),
    ('k17', -3629358267257858687, -7761848967694454539, 6881530413064886186),
    ('k18', 4292266326104813775, -638572189928287670, -2495959098150822920),
    ('k19', -1710659729855652917, -5026833292142163435, -8600439496657816418),
    ('k20', -3159706166772988965, -3021631386097765210, -482261730907435826),
    ('k21', -5641439138014952273, -7999575701360486730, -7515842267582927556),
    ('k22', -5265269140525864427, 4893413548925733859, -8442459088612376974),
    ('k23', -2975694402606487451, 5941054312848025454, -2852681770477980683),
    ('k24', -1541234095211915745, -547230571737949865, -3310151913123758325),
    ('k25', -6037722569976063916, 3363396086259298177, 1499984423618658385),
    ('k26', -6795720091784463235, 2354987908489213058, -3782057513379022273),
    ('k27', 4235727206518385846, 4238156083716883470, -2752057949166240802),
    ('k28', -7050188301011222868, 5584146679666227220, 8103109329819512644),
    ('k29', -5296586025381520768, -7528353177053762531, -5030530854775695638),
    ('k30', -6511997850311691997, -1808304684972996186, 5057800884863788563),
    ('k31', 2276249368678746540, -7726033598992671148, -6227042517501573819),
    ('k32', 5887132796661557831, -1433504438275825724, -762620147681966961),
    ('k33', -491161318902494885, 4172571755446757842, -1638747940825437204),
    ('k34', -235715112570624624, -1341672557193465174, 2407408995264020086),
    ('k35', 481330380465649827, 6129111969958800624, 1236603825196777872),
    ('k36', -775474518759425854, 6077126710500627860, 917976952814918690),
    ('k37', 8365398681682028582, 601998641943350976, -742966559195304669),
    ('k38', -7546364015288177896, 7862274386834612966, -2712089179164537187),
    ('k39', 3764456345837909911, 4974135258256676802, -3492762105539282441),
    ('k40', -8132787388200439800, 8526733244086300462, -7216912106248184793),
    ('k41', -493914148633635120, -8568539365656641378, 2904120733929336625),
    ('k42', -406695387380549170, -1354415517696796536, -7672807589300910341),
    ('k43', 843464435867269265, 614348962809067535, 3586443309061251584),
    ('k44', -58786476273833560, 1247137836270767077, 329917422199162978),
    ('k45', 6999427045502309601, 1102506239352361551, 1422060334677252636),
    ('k46', -5563372285180654747, 5960356169677179526, 1186164371853506998),
    ('k47', 5915898569306342201, 7283751378463452659, 2548155995870416151),
    ('k48', -329050714117523525, 4394942266573525586, -4423514791036475607),
    ('k49', -6140445423971303432, 7115239576839904784, 2805472810482569859),
    ('k50', -8780048104520900472, -5439971993708236983, 744560335011401196),
    ('k51', -119664811935760010, -3718803014740207198, 3872372102147439646),
    ('k52', 6493771306577110054, 1383842347055070991, -1141791168327398120),
    ('k53', -1543981826616995128, 5001037756799817800, -2633172742090423277),
    ('k54', 7928443711616654588, 4978578160955388272, -8826455835300761875),
    ('k55', 5950831057140524416, 3873908290328110122, 8289884982392913399),
    ('k56', -8234785318545791825, -4194572414333454677, -2186126616573076583),
    ('k57', -8616047412038443028, 418866848417633648, 4291657637830434044),
    ('k58', 7411258062397562690, -3834007044626426945, -4621421772778447322),
    ('k59', -8657515250764654710, -3684905682363944328, -7108804262754028144),
    ('k60', -2514224567518755077, -1996811651907538537, 3316653504068705280),
    ('k61', 3650618589394096254, -3955051102254837178, -2574622490484605430),
    ('k62', -2894957013477151674, -5930866462321479434, 1892987670179600260),
    ('k63', -9167078486612995636, 4365747465871257127, -4113793533934087641)
) AS t(key, mm0, mm42, farm)
"""

def _q_multimodal_decode_real(spark, sf_dir):
    """REAL multimodal codec path (closes the r3 stub): deterministic BMP
    and WAV bytes are synthesized distributed (mapInPandas), then decode_real
    PARSES the actual container formats — BMP header/stride/bottom-up rows,
    WAV RIFF chunks — recovering dimensions, rates, and the md5 of the raw
    payload. The oracle reconstructs every value from the generation
    formulas with pure string math (payloads are md5-digest repetitions),
    so a stride/row-order/channel-swap bug in the decoder hash-mismatches
    while the Spark side can't shortcut past real parsing."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    return decode_real(make_test_media(spark, n=48, seed=42))

_SQL_MULTIMODAL_DECODE_REAL = """
WITH base AS (
  SELECT range AS media_id,
    md5(concat('42:', range)) AS d,
    CASE WHEN range % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
    CASE WHEN range % 2 = 0 THEN CAST(3 + range % 8 AS INT) END AS width,
    CASE WHEN range % 2 = 0 THEN CAST(2 + range % 5 AS INT) END AS height,
    CASE WHEN range % 2 = 1 THEN CAST(8000 + (range % 4) * 4000 AS INT) END AS sample_rate,
    CASE WHEN range % 2 = 1 THEN CAST(64 + range % 33 AS INT) END AS n_samples
  FROM range(48)
)
SELECT media_id, kind, width, height, sample_rate, n_samples,
  md5(substr(repeat(d, 80),
             1,
             CASE WHEN kind = 'image' THEN 6 * width * height
                  ELSE 4 * n_samples END)) AS payload_md5
FROM base
"""

def _q_jpeg_decode_pinned(spark, sf_dir):
    """Baseline JPEG decode through the real-codec seam (r6 verdict #5;
    operators/jpeg_py — pure-Python T.81 sequential: marker parse, DQT/
    DHT, Huffman entropy decode, dequant, IDCT, chroma upsample,
    YCbCr→RGB). Fixture JPEGs are synthesized distributed by the repo's
    own deterministic encoder (Annex K tables, quality 90) cycling
    4:4:4/4:2:0 subsampling, restart intervals 0/1/2, and non-multiple-
    of-8 dimensions (partial edge MCUs); decode_real re-parses the actual
    bitstream. JPEG is lossy, so the decoded-pixel md5s are PINNED
    literals (the pinned-bytes oracle pattern) — any drift in Huffman
    tables, IDCT rounding, upsampling, or color conversion mismatches."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    media = make_test_media(spark, n=12, seed=7, formats=("jpeg",))
    return decode_real(media).select(
        "media_id", "kind", "width", "height", "payload_md5"
    )

_SQL_JPEG_DECODE_PINNED = """
SELECT media_id, kind, CAST(width AS INT) AS width,
       CAST(height AS INT) AS height, payload_md5
FROM (VALUES
  (CAST(0 AS BIGINT), 'image', 11, 9,  '3138833dcd80e40fe36bdd501aee7ff8'),
  (1, 'image', 12, 10, 'ea3dfba30d888d59cfd081f93ed46238'),
  (2, 'image', 13, 11, '5cce5c31bcff4c285ad6b8f1e04783a3'),
  (3, 'image', 14, 12, '97f2522006c4a37576e1e448d363cb8f'),
  (4, 'image', 15, 13, '53c4546d058066fee71c7bf06f87480d'),
  (5, 'image', 16, 14, 'a886c16040bff4b8833a5d6657efc99a'),
  (6, 'image', 17, 15, '942fe90c8b9f6db38f3194dce94a2ddd'),
  (7, 'image', 18, 9,  '90a4f97dc551e877bb882be20440effb'),
  (8, 'image', 19, 10, 'ce9cc3324c62545e3b0b00a8e4b0d369'),
  (9, 'image', 20, 11, '6e619a72916a9784227bf82d3390b387'),
  (10, 'image', 11, 12, '7ed1a7fccafbe6f25137bdaa34f7795f'),
  (11, 'image', 12, 13, '829c1da170c80eb876c3bb7e931fc9f7')
) AS t(media_id, kind, width, height, payload_md5)
"""

def _q_jpeg_decode_progressive(spark, sf_dir):
    """PROGRESSIVE JPEG decode through the real-codec seam (r7 verdict
    #3; operators/jpeg_py SOF2 path: multi-scan coefficient
    accumulation — DC first/refinement, AC spectral-selection bands,
    AC successive-approximation refinement with EOB runs — per T.81
    Annex G). Fixtures are the SAME pixels/quality/subsampling as
    jpeg_decode_pinned's baseline rows but coded by the progressive
    encoder (10-scan script: DC Al=1, AC bands 1-5/6-63 at Al=1, then
    full refinement to Al=0); progressive coding carries identical
    quantized coefficients, so the decoded-pixel md5s are pinned to the
    SAME literals as the baseline gate — a drift in any scan decoder
    (band bookkeeping, refinement bit rule, EOB-run accounting) breaks
    the cross-pin."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    media = make_test_media(
        spark, n=12, seed=7, formats=("jpeg_progressive",)
    )
    return decode_real(media).select(
        "media_id", "kind", "width", "height", "payload_md5"
    )

_SQL_JPEG_DECODE_PROGRESSIVE = _SQL_JPEG_DECODE_PINNED

def _q_tpch_q4(spark, sf_dir):
    """TPC-H Q4-style priority count over late-shipping orders: left-semi
    join (equi key + non-equi ship-lag predicate pushed into the join
    filter) then a tiny agg. At scale the semi join never materializes
    lineitem payload columns — the scan is pruned to two columns + date."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    late = t["orders"].join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )

_SQL_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

def _q_tpch_q13(spark, sf_dir):
    """TPC-H Q13-style customer order-count distribution: left outer join
    + two-level aggregation. The first groupBy reuses the join's
    partitioning on the customer key (no second exchange before it); only
    the tiny (c_count, custdist) re-agg shuffles again."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )

_SQL_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

def _q_tpch_q14(spark, sf_dir):
    """TPC-H Q14-style promo revenue share over one ship-year: broadcast
    part into the pruned lineitem scan; numerator/denominator summed as
    exact decimals, the share derived with ONE double division so both
    engines agree bit-for-bit (decimal-division scale rules differ between
    engines — never let the oracle depend on them)."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("lineitem", "part"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,4)"))
    yr = t["lineitem"].where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    agg = (
        yr.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_share"
        ),
    )

_SQL_TPCH_Q14 = """
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))
        ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS promo_revenue,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
      AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_share
FROM agg
"""

def _q_tpch_q22(spark, sf_dir):
    """TPC-H Q22-style idle rich customers: scalar threshold (exact
    decimal sum → one double division, broadcast as a 1-row frame) +
    anti join against RECENT orders (no order since mid-2000), grouped by
    segment. The anti join is the scale shape for "has no recent orders" — never a NOT IN materialization."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("customer", "orders"))
    bal = F.col("c_acctbal").cast("decimal(28,4)")
    thr = (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .agg((F.sum(bal).cast("double") / F.count(F.lit(1))).alias("__thr"))
    )
    rich = t["customer"].join(F.broadcast(thr)).where(F.col("c_acctbal") > F.col("__thr"))
    recent = t["orders"].where(F.col("o_orderdate") >= "2000-06-01")
    idle = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )

_SQL_TPCH_Q22 = """
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS t
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
FROM customer, thr
WHERE c_acctbal > t
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

def _q_tpch_q10(spark, sf_dir):
    """TPC-H Q10-style returned-item revenue ranking: the returnflag
    filter prunes lineitem at the scan, orders/customer join up the star,
    nation broadcasts, top-20 via TakeOrderedAndProject (per-partition
    heads + single driver merge — no global sort)."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem", "nation"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )

_SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

def _q_dedup_exact_bloom(spark, sf_dir):
    """Bloom-routed EXACT incremental dedup (operators/dedup.py
    exact_filter_against): new batch (doc_id % 7 == 0) filtered against
    the corpus (the rest) on an exact key WITHOUT shuffling the corpus —
    Bloom prefilter (no false negatives) routes rows: definite-absent rows
    skip the join entirely; the small maybe-set is verified by broadcast
    semi/anti joins riding plain corpus scans. Result is EXACT: the
    oracle is the plain NOT EXISTS anti-join."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import exact_filter_against

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_b = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    return exact_filter_against(new_b, corpus, cols=["n_chars"])

_SQL_DEDUP_EXACT_BLOOM = """
SELECT n.*
FROM documents n
WHERE n.doc_id % 7 = 0
  AND NOT EXISTS (
    SELECT 1 FROM documents c
    WHERE c.doc_id % 7 <> 0 AND c.n_chars = n.n_chars)
"""

def _q_csv_roundtrip(spark, sf_dir):
    """S-family breadth: the S12 header-TSV sink → text scan with an
    EXPLICIT schema (no inference job — at scale, csv/json schema
    inference is a full extra data pass). Doubles print at full precision
    so the typed round-trip is lossless; the oracle is the source table."""
    import os

    from ratatool_spark.sources.io import read_table, write_table

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = os.path.join(scratch_dir(prefix="rt_csv_"), "customer.tsv")
    write_table(cust.coalesce(4), out, header="")  # header= → TSV+header sink (S12)
    return read_table(spark, out, fmt="csv", schema=cust.schema, sep="\t")

_SQL_CSV_ROUNDTRIP = "SELECT * FROM customer"

def _q_tpch_q15(spark, sf_dir):
    """TPC-H Q15-style top supplier: quarterly revenue per supplier, keep
    the argmax rows. The scalar max broadcasts back over the tiny agg
    (never a re-scan of lineitem); supplier joins by broadcast."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("supplier", "lineitem"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    q = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    mx = q.agg(F.max("total_revenue").alias("__mx"))
    top = q.join(F.broadcast(mx)).where(F.col("total_revenue") == F.col("__mx"))
    return (
        top.join(
            F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey")
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )

_SQL_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""

def _q_tpch_q18(spark, sf_dir):
    """TPC-H Q18-style large-volume orders: HAVING-filtered lineitem agg
    (map-side combine does the heavy lifting; only per-order partials
    shuffle), then the small big-order set broadcasts up the star to
    orders/customer; top-100 via TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        t["orders"]
        .join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
    )

_SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

def _q_tpch_q2(spark, sf_dir):
    """TPC-H Q2-style min-cost supplier — adapted: the driver schema has no
    partsupp table, so the (part, supplier) catalog and its unit cost are
    derived from lineitem (supplycost = MIN(l_extendedprice / l_quantity)
    per pair). All dims (part slice, region-filtered supplier) broadcast
    into the lineitem scan; the per-part minimum is a window over the
    already part-partitioned aggregate, so the argmin costs no extra
    exchange. Cross-engine: unit price is ONE double division and MIN is
    order-independent, so both engines agree bit-for-bit."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ratatool_spark.sources.io import load_tables

    t = load_tables(
        spark, sf_dir, names=("part", "supplier", "nation", "region", "lineitem")
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    pairs = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        pairs.withColumn("__mn", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("__mn"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )

_SQL_TPCH_Q2 = """
WITH pairs AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
FROM (SELECT *, MIN(supplycost) OVER (PARTITION BY p_partkey) AS mn FROM pairs) x
WHERE supplycost = mn
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

def _q_tpch_q7(spark, sf_dir):
    """TPC-H Q7-style volume shipping between two nations: the big
    lineitem⋈orders⋈customer chain shuffles on its keys; supplier and the
    two nation role-aliases broadcast. The nation-pair filter lands before
    the groupBy so only qualifying rows shuffle into the agg."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(
        spark, sf_dir, names=("supplier", "lineitem", "orders", "customer", "nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    df = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        df.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )

_SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

def _q_tpch_q8(spark, sf_dir):
    """TPC-H Q8-style national market share: ECONOMY-part order revenue
    into AMERICA, split by whether the supplier sits in NATION_5. Both
    sums stay exact decimals; the share is ONE double division at the end
    (decimal-division scale rules differ between engines)."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(
        spark,
        sf_dir,
        names=("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast("decimal(28,4)")
    )
    cust_america = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    df = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].where(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_america, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = df.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(nat_rev).cast("double").alias("nation_volume"),
        F.sum(rev).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    ).orderBy("o_year")

_SQL_TPCH_Q8 = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))
             ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS nation_volume,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
           AS total_volume
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    AND EXISTS (
      SELECT 1 FROM customer
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      WHERE c_custkey = o_custkey AND r_name = 'AMERICA')
  GROUP BY o_year
)
SELECT o_year, nation_volume, total_volume,
       nation_volume / total_volume AS mkt_share
FROM agg
ORDER BY o_year
"""

def _q_tpch_q9(spark, sf_dir):
    """TPC-H Q9-style product-type profit — adapted: no partsupp, so the
    cost side is the retail-price proxy p_retailprice * l_quantity (exact
    decimal: 2-scale factors multiply to scale 4, no rounding). Revenue
    and cost are summed as decimals per (nation, year); profit is derived
    in ONE double expression so engines agree."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(
        spark, sf_dir, names=("part", "supplier", "lineitem", "orders", "nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    ).cast("decimal(28,4)")
    df = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].where(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    agg = df.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(
        F.sum(rev).cast("double").alias("sum_rev"),
        F.sum(cost).cast("double").alias("sum_cost"),
    )
    return agg.select(
        "nation",
        "o_year",
        "sum_rev",
        "sum_cost",
        (F.col("sum_rev") - 0.6 * F.col("sum_cost")).alias("sum_profit"),
    ).orderBy("nation", F.desc("o_year"))

_SQL_TPCH_Q9 = """
WITH agg AS (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
           AS sum_rev,
         CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE)
           AS sum_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
  GROUP BY n_name, o_year
)
SELECT nation, o_year, sum_rev, sum_cost,
       sum_rev - 0.6 * sum_cost AS sum_profit
FROM agg
ORDER BY nation, o_year DESC
"""

def _q_tpch_q11(spark, sf_dir):
    """TPC-H Q11-style important stock — adapted: per-part inventory value
    from NATION_3 suppliers is the exact decimal sum of their lineitem
    extended prices (no partsupp availqty). The grand total is a scalar
    broadcast back over the tiny per-part agg — lineitem is scanned ONCE."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("supplier", "lineitem", "nation"))
    supp3 = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        t["lineitem"]
        .join(F.broadcast(supp3), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(28,4)")).alias("__val"))
    )
    tot = per_part.agg(F.sum("__val").cast("double").alias("__tot"))
    return (
        per_part.join(F.broadcast(tot))
        .where(F.col("__val").cast("double") > F.col("__tot") * 0.001)
        .select("p_partkey", F.col("__val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )

_SQL_TPCH_Q11 = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS val
  FROM lineitem
  WHERE EXISTS (
    SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey = l_suppkey AND n_name = 'NATION_3')
  GROUP BY l_partkey
), tot AS (
  SELECT CAST(SUM(val) AS DOUBLE) AS t FROM per_part
)
SELECT p_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part, tot
WHERE CAST(val AS DOUBLE) > t * 0.001
ORDER BY part_value DESC, p_partkey
"""

def _q_tpch_q12(spark, sf_dir):
    """TPC-H Q12-style shipping-delay priority audit — adapted: the driver
    schema has no l_shipmode/commitdate/receiptdate, so lines bucket by
    ship lag vs the order date (PROMPT ≤30d, ON_TIME ≤90d, else LATE; the
    same interval-comparison shape as the reference's receipt/commit
    predicates). One shuffle join on the order key, then a 3-row agg."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    df = li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    bucket = (
        F.when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "PROMPT",
        )
        .when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "ON_TIME",
        )
        .otherwise("LATE")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        df.groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )

_SQL_TPCH_Q12 = """
SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'PROMPT'
            WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'ON_TIME'
            ELSE 'LATE' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_bucket
ORDER BY ship_bucket
"""

def _q_tpch_q16(spark, sf_dir):
    """TPC-H Q16-style supplier-part relationship counts — adapted: the
    part↔supplier link comes from lineitem (no partsupp); negative-balance
    suppliers stand in for the reference's complaint exclusion. Both dims
    broadcast into the link scan; COUNT(DISTINCT) shuffles once on the
    3-column group key."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("part", "supplier", "lineitem"))
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    ok_supp = t["supplier"].where(F.col("s_acctbal") >= 0).select("s_suppkey")
    links = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(ok_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    return (
        links.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )

_SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND EXISTS (SELECT 1 FROM supplier
              WHERE s_suppkey = l_suppkey AND s_acctbal >= 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

def _q_tpch_q17(spark, sf_dir):
    """TPC-H Q17-style small-quantity revenue: the per-part average
    quantity is a window over the part-filtered lineitem slice — ONE scan,
    ONE shuffle on the part key (never a second lineitem pass + self-join).
    The average is exact-decimal sum / count cast once to double; the 20%%
    threshold and final /7 are single double ops both engines share."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("part", "lineitem"))
    li = t["lineitem"].join(
        F.broadcast(t["part"].where(F.col("p_brand") == "Brand#3").select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(28,4)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    small = li.withColumn("__avg", avg_qty).where(
        F.col("l_quantity") < 0.2 * F.col("__avg")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,4)")).cast("double") / 7.0
        ).alias("avg_yearly")
    )

_SQL_TPCH_Q17 = """
WITH li AS (
  SELECT l_quantity, l_extendedprice,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) OVER (PARTITION BY l_partkey)
              AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
  WHERE EXISTS (SELECT 1 FROM part
                WHERE p_partkey = l_partkey AND p_brand = 'Brand#3')
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / 7.0 AS avg_yearly
FROM li
WHERE l_quantity < 0.2 * avg_qty
"""

def _q_tpch_q19(spark, sf_dir):
    """TPC-H Q19-style disjunctive-predicate revenue: three OR'd
    brand/size/quantity bands (adapted: no shipmode/shipinstruct columns).
    Part broadcasts; the disjunction evaluates inside the join filter so
    non-qualifying rows never leave the scan stage."""
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("part", "lineitem"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )

_SQL_TPCH_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

def _q_tpch_q20(spark, sf_dir):
    """TPC-H Q20-style promotion-candidate suppliers — adapted: a NATION_7
    supplier qualifies if, for some 'small *' part, their 1996 shipped
    quantity exceeds 30%% of that part's total 1996 quantity (availqty has
    no partsupp source). Per-pair sums shuffle once; the part total is a
    window over the pair agg; the tiny qualifying supplier set broadcasts
    into the supplier dim as a semi join."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("part", "supplier", "lineitem", "nation"))
    li96 = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(
            F.broadcast(
                t["part"].where(F.col("p_name").like("small %")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    per_pair = li96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("__qty")
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        per_pair.withColumn("__tot", F.sum("__qty").over(w))
        .where(F.col("__qty").cast("double") > 0.3 * F.col("__tot").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    supp7 = t["supplier"].join(
        F.broadcast(t["nation"].where(F.col("n_name") == "NATION_7")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp7.join(F.broadcast(qual), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )

_SQL_TPCH_Q20 = """
WITH per_pair AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(28,4))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    AND EXISTS (SELECT 1 FROM part
                WHERE p_partkey = l_partkey AND p_name LIKE 'small %')
  GROUP BY l_partkey, l_suppkey
), qual AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS tot FROM per_pair) x
  WHERE CAST(qty AS DOUBLE) > 0.3 * CAST(tot AS DOUBLE)
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND EXISTS (SELECT 1 FROM qual WHERE qual.l_suppkey = s_suppkey)
ORDER BY s_suppkey
"""

def _q_tpch_q21(spark, sf_dir):
    """TPC-H Q21-style suppliers who kept orders waiting — adapted: with no
    receipt/commit dates, the "blocking" supplier of a finished
    multi-supplier order is the UNIQUE argmax of per-supplier max ship
    dates (sole latest shipper). One shuffle to the (order, supplier) agg;
    the argmax/uniqueness flags are windows over the order key on that
    already-small frame; NATION_4's supplier dim broadcasts at the end."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("supplier", "lineitem", "orders", "nation"))
    li = t["lineitem"].join(
        t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    per = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("smax"))
    w = Window.partitionBy("l_orderkey")
    flags = (
        per.withColumn("__omax", F.max("smax").over(w))
        .withColumn("__nsupp", F.count(F.lit(1)).over(w))
        .withColumn(
            "__nmax",
            F.sum(F.when(F.col("smax") == F.col("__omax"), 1).otherwise(0)).over(w),
        )
    )
    waiting = flags.where(
        (F.col("smax") == F.col("__omax"))
        & (F.col("__nmax") == 1)
        & (F.col("__nsupp") >= 2)
    )
    supp4 = t["supplier"].join(
        F.broadcast(t["nation"].where(F.col("n_name") == "NATION_4")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        waiting.join(F.broadcast(supp4), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )

_SQL_TPCH_Q21 = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
  FROM lineitem
  WHERE EXISTS (SELECT 1 FROM orders
                WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
  GROUP BY l_orderkey, l_suppkey
), flags0 AS (
  SELECT *,
         MAX(smax) OVER (PARTITION BY l_orderkey) AS omax,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS nsupp
  FROM per
), flags AS (
  SELECT *,
         SUM(CASE WHEN smax = omax THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey) AS nmax
  FROM flags0
)
SELECT s_name, COUNT(*) AS numwait
FROM flags
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE smax = omax AND nmax = 1 AND nsupp >= 2 AND n_name = 'NATION_4'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

def _q_dedup_substring(spark, sf_dir):
    """Document-level substring-containment dedup: (contained, container)
    pairs where one doc's token sequence occurs verbatim inside another's.
    Anchored inverted index (each doc joins its RAREST 8-gram against the
    shingle index) → candidates bounded by Σ df(anchor) → exact instr
    verify on candidates only. The distributed stand-in for suffix-array
    substring dedup (Lee et al. 2022)."""
    from ratatool_spark.operators.dedup import substring_containment_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return substring_containment_pairs(docs, shingle_len=8).orderBy(
        "contained_id", "container_id"
    )

_SQL_DEDUP_SUBSTRING = """
WITH norm AS (
  SELECT doc_id,
         array_to_string(string_split(trim(text), ' '), ' ') AS t,
         len(string_split(trim(text), ' ')) AS nw
  FROM documents
), eligible AS (
  SELECT * FROM norm WHERE nw >= 8
)
SELECT a.doc_id AS contained_id, b.doc_id AS container_id
FROM eligible a JOIN eligible b ON a.doc_id <> b.doc_id
WHERE position((' ' || a.t || ' ') IN (' ' || b.t || ' ')) > 0
  AND (len(a.t) < len(b.t) OR (a.t = b.t AND a.doc_id > b.doc_id))
ORDER BY contained_id, container_id
"""

def _q_near_dedup_keep_best(spark, sf_dir):
    """Quality-aware near-dedup: the same LSH → verify → connected-
    components pipeline as near_dedup_survivors, but each duplicate
    cluster keeps its highest-quality copy (max n_chars, ties → min id)
    instead of the arbitrary min-id doc — what a curation pipeline
    actually wants to ship."""
    from ratatool_spark.operators.dedup import near_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return near_dedup(docs, score_col="n_chars").select("doc_id", "lang", "source")

def _sql_near_dedup_keep_best() -> str:
    base = _sql_near_dedup()
    head, sep, _ = base.rpartition("SELECT d.doc_id")
    assert sep, "_sql_near_dedup no longer ends with the expected final SELECT"
    return (
        head
        + """, best AS (
  SELECT component, doc_id AS keep_id
  FROM (SELECT c.component, c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.component
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id) x
  WHERE rn = 1
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
LEFT JOIN best b ON b.component = c.component
WHERE c.doc_id IS NULL OR d.doc_id = b.keep_id
"""
    )

def _q_corpus_report(spark, sf_dir):
    """Per-source corpus data card in ONE fact scan: doc/token volumes,
    mean quality (exact-decimal sum, one double division), language
    spread, and the deterministic dominant-language argmax."""
    from ratatool_spark.operators.corpus import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_report(docs).orderBy("source")

def _sql_corpus_report() -> str:
    from ratatool_spark.functions.text import LANG_MARKERS, STOPWORDS

    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        m = ", ".join(f"'{x}'" for x in markers)
        scores.append(
            f"len(list_filter(w, t -> t IN ({m}))) / greatest(len(w), 1) AS s_{lang}"
        )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN s_{lg} = best AND best > 0 THEN '{lg}'" for lg in langs)
        + " ELSE 'und' END"
    )
    return f"""
WITH base AS (
  SELECT source, text, {_WORDS_SQL} AS w FROM documents
), scored AS (
  SELECT source, w,
         len(w) AS n_tokens,
         least(len(w) / 100.0, 1.0) AS length_part,
         len(list_distinct(w)) / greatest(len(w), 1) AS dratio,
         len(list_filter(w, t -> t IN ({stop}))) / greatest(len(w), 1) AS sratio,
         {', '.join(scores)}
  FROM base
), withbest AS (
  SELECT *, {best} AS best FROM scored
), per_doc AS (
  SELECT source, n_tokens,
         CAST(ROUND(0.4 * length_part + 0.4 * dratio
               + 0.2 * least(sratio * 5.0, 1.0), 6) AS DECIMAL(18,6)) AS q,
         {case} AS lang
  FROM withbest
), per_lang AS (
  SELECT source, lang, COUNT(*) AS docs, SUM(n_tokens) AS toks, SUM(q) AS qsum
  FROM per_doc GROUP BY source, lang
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY docs DESC, lang DESC) AS rn
  FROM per_lang
)
SELECT source,
       CAST(SUM(docs) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(qsum) AS DOUBLE) / SUM(docs) AS mean_quality,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       MAX(CASE WHEN rn = 1 THEN lang END) AS top_lang
FROM ranked
GROUP BY source
ORDER BY source
"""

def _q_bootstrap_sample(spark, sf_dir):
    """Deterministic Poisson bootstrap (rate 1.0 on the order key) feeding
    a per-priority replicate aggregate. The Poisson inverse-CDF thresholds
    are driver-computed literals shared with the oracle, so parity never
    depends on either engine's exp(); zero shuffles before the tiny agg."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.sampler import bootstrap_sample

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    boot = bootstrap_sample(orders, rate=1.0, fields=["o_orderkey"], seed=11)
    return (
        boot.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_replicates"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )

def _sql_bootstrap_sample() -> str:
    from ratatool_spark.operators.sampler import poisson_thresholds

    cum = poisson_thresholds(1.0, 8)
    dice = _dice_sql(["o_orderkey"], 11)
    case = (
        "CASE "
        + " ".join(f"WHEN u < {c!r} THEN {j}" for j, c in enumerate(cum))
        + " ELSE 8 END"
    )
    return f"""
WITH diced AS (
  SELECT *, {dice} AS u FROM orders
), drawn AS (
  SELECT *, {case} AS k FROM diced
), boot AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         unnest(range(1, k + 1)) AS copy
  FROM drawn WHERE k > 0
)
SELECT o_orderpriority,
       COUNT(*) AS n_replicates,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
FROM boot
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
