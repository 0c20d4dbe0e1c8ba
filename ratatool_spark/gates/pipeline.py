"""Training-data pipeline gates: dedup (exact/minhash/simhash), splits, mixtures.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


from ratatool_spark.gates._common import _DICE_SQL, _dice_sql


# ------------------------------------------------- training-data pipeline
# Text analysis, dedup family, ANN — each with a DuckDB twin built from the
# same portable hash + identical arithmetic.

_WORDS_SQL = "string_split(trim(text), ' ')"

_SHINGLES3_SQL = (
    "list_distinct(list_transform(range(1, greatest(len({w}) - 2, 1) + 1), "
    "i -> concat_ws(' ', {w}[i], {w}[i+1], {w}[i+2])))"
).format(w=_WORDS_SQL)

_PH64_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"

def _q_text_metrics(spark, sf_dir):
    """Text analysis: token counting, quality scoring, language ID,
    fingerprinting — pure column expressions over documents."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )

def _sql_text_metrics() -> str:
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
    case = "CASE " + " ".join(
        f"WHEN s_{lg} = best AND best > 0 THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"
    norm_text = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    fp_sql = _PH64_SQL.format(x=norm_text)
    return f"""
WITH base AS (
  SELECT doc_id, text, {_WORDS_SQL} AS w FROM documents
), scored AS (
  SELECT doc_id, text, w,
         len(w) AS n_tokens,
         least(len(w) / 100.0, 1.0) AS length_part,
         len(list_distinct(w)) / greatest(len(w), 1) AS dratio,
         len(list_filter(w, t -> t IN ({stop}))) / greatest(len(w), 1) AS sratio,
         {', '.join(scores)}
  FROM base
), withbest AS (
  SELECT *, {best} AS best FROM scored
)
SELECT doc_id, n_tokens,
       ROUND(0.4 * length_part + 0.4 * dratio
             + 0.2 * least(sratio * 5.0, 1.0), 6) AS quality,
       {case} AS lang_guess,
       {fp_sql} AS fp
FROM withbest
"""

def _q_dedup_exact(spark, sf_dir):
    """Exact dedup over a corpus with synthetic duplicates injected
    (20% of docs re-added under shifted ids); keeps min-id representative."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.hashing import dice
    from ratatool_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.where(dice(["doc_id"], seed=7) < 0.2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return exact_dedup(docs.unionByName(dups)).select("doc_id")

def _sql_dedup_exact() -> str:
    dice7 = _dice_sql(["doc_id"], 7)
    fp = _PH64_SQL.format(x="regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE {dice7} < 0.2
)
SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY {fp} ORDER BY doc_id) AS rn
  FROM corpus
) WHERE rn = 1
"""

_MINHASH_K, _MINHASH_BANDS = 16, 4

def _q_dedup_minhash(spark, sf_dir):
    """MinHash + banded LSH near-dup candidate pairs over word 3-gram
    shingles (k=16 sigs, 4 bands)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(
        docs, num_hashes=_MINHASH_K, bands=_MINHASH_BANDS
    ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))

def _sql_dedup_minhash() -> str:
    from ratatool_spark.operators.dedup import MINHASH_P, minhash_coeffs

    k, bands = _MINHASH_K, _MINHASH_BANDS
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
        f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
WITH shingled0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s FROM documents
), shingled AS (
  SELECT doc_id, {_PH64_SQL.format(x='s')} % {MINHASH_P} AS h FROM shingled0
), sigs AS (
  SELECT doc_id, {sig_exprs} FROM shingled GROUP BY doc_id
), banded AS (
  {band_rows}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b,
       ROUND(({matches}) / {float(k)}, 6) AS est_jaccard
FROM pairs p
JOIN sigs a ON a.doc_id = p.id_a
JOIN sigs b ON b.doc_id = p.id_b
"""

def _q_contamination_lsh(spark, sf_dir):
    """Cross-corpus fuzzy decontamination (dedup.minhash_lsh_cross_pairs):
    documents LSH-joined against an engineered 'benchmark' corpus (every
    17th doc, re-keyed +100000, truncated to its first 30 words — exact
    and near-containment overlaps). Signatures/banding identical to the
    self-dedup gate; the join is (band, band-hash) between corpora, no
    broadcast of either side. The oracle replays shingling, the k
    universal-hash mins, banding, and the cross band-join."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import minhash_lsh_cross_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim("text"), " "), 1, 30)
        ).alias("text"),
    )
    return minhash_lsh_cross_pairs(
        docs, bench, num_hashes=_MINHASH_K, bands=_MINHASH_BANDS
    ).select(
        "left_id", "right_id", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def _sql_cross_lsh(mod: int, shift: int, words: int, swap: bool = False) -> str:
    from ratatool_spark.operators.dedup import MINHASH_P, minhash_coeffs

    k, bands = _MINHASH_K, _MINHASH_BANDS
    rpb = k // bands
    sig_exprs = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_coeffs(k))
    )

    def banded(src: str) -> str:
        return " UNION ALL ".join(
            "SELECT doc_id, {b} AS band, ".format(b=b)
            + _PH64_SQL.format(
                x="concat_ws('|', "
                + ", ".join(
                    f"CAST(sig_{i} AS VARCHAR)"
                    for i in range(b * rpb, (b + 1) * rpb)
                )
                + ")"
            )
            + " AS bh, "
            + ", ".join(f"sig_{i}" for i in range(k))
            + f" FROM {src}"
            for b in range(bands)
        )

    matches = " + ".join(
        f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    lsrc, rsrc = ("bench", "documents") if swap else ("documents", "bench")
    return f"""
WITH bench AS (
  SELECT doc_id + {shift} AS doc_id,
         array_to_string((string_split(trim(text), ' '))[1:{words}], ' ') AS text
  FROM documents WHERE doc_id % {mod} = 0
), lsh0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s FROM {lsrc}
), lsh AS (
  SELECT doc_id, {_PH64_SQL.format(x='s')} % {MINHASH_P} AS h FROM lsh0
), lsigs AS (
  SELECT doc_id, {sig_exprs} FROM lsh GROUP BY doc_id
), rsh0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s FROM {rsrc}
), rsh AS (
  SELECT doc_id, {_PH64_SQL.format(x='s')} % {MINHASH_P} AS h FROM rsh0
), rsigs AS (
  SELECT doc_id, {sig_exprs} FROM rsh GROUP BY doc_id
), lbanded AS (
  {banded('lsigs')}
), rbanded AS (
  {banded('rsigs')}
), pairs AS (
  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
  FROM lbanded a JOIN rbanded b ON a.band = b.band AND a.bh = b.bh
)
SELECT p.left_id, p.right_id,
       ROUND(({matches}) / {float(k)}, 6) AS est_jaccard
FROM pairs p
JOIN lsigs a ON a.doc_id = p.left_id
JOIN rsigs b ON b.doc_id = p.right_id
"""


def _sql_contamination_lsh() -> str:
    return _sql_cross_lsh(17, 100000, 30)


def _q_minhash_index_incremental(spark, sf_dir):
    """Incremental minhash-index maintenance (dedup.build_minhash_index →
    update_minhash_index → query_minhash_index): the reference corpus's
    signatures are built once from its even-id half, the odd half is
    APPENDED under the frozen sidecar parameters (fused duplicate-id
    guard), and a truncated query corpus (every 31st doc, re-keyed,
    first 30 words) probes the artifact — the stored text is never
    rescanned. The oracle computes the same candidates directly from the
    documents table, so build+update must equal one build over the
    union."""

    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import (
        build_minhash_index,
        query_minhash_index,
        update_minhash_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = scratch_dir(prefix="rt_mhidx_") + "/idx"
    build_minhash_index(
        docs.where(F.col("doc_id") % 2 == 0),
        path,
        num_hashes=_MINHASH_K,
        bands=_MINHASH_BANDS,
    )
    update_minhash_index(spark, path, docs.where(F.col("doc_id") % 2 == 1))
    queries = docs.where(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim("text"), " "), 1, 30)
        ).alias("text"),
    )
    out = query_minhash_index(spark, queries, path)
    return out.select(
        "left_id", "right_id", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def _sql_minhash_index_incremental() -> str:
    # the artifact round-trip must equal direct computation over the full
    # corpus — the oracle IS that direct computation, with the query side
    # as the "bench" CTE (left) and documents as the reference (right);
    # _sql_cross_lsh's output has the query corpus on the LEFT, matching
    # query_minhash_index's orientation
    return _sql_cross_lsh(31, 200000, 30, swap=True)


def _q_pipeline_decontaminate(spark, sf_dir):
    """End-to-end fuzzy decontamination (composition gate): cross-corpus
    LSH candidates at est_jaccard ≥ 0.5 against the engineered benchmark
    → distinct flagged doc ids → LEFT ANTI join back onto the corpus →
    per-source surviving volume report. The production shape: flag with
    the banded join, drop with an anti-join (never a row-by-row filter),
    report what survived. One lineage; the oracle replays the whole
    chain including the anti-join semantics."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import minhash_lsh_cross_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim("text"), " "), 1, 30)
        ).alias("text"),
    )
    flagged = (
        minhash_lsh_cross_pairs(
            docs, bench, num_hashes=_MINHASH_K, bands=_MINHASH_BANDS,
            min_est_jaccard=0.5,
        )
        .select(F.col("left_id").alias("doc_id"))
        .distinct()
    )
    survivors = docs.join(flagged, "doc_id", "left_anti")
    toks = F.filter(
        F.split(F.trim(F.col("text")), " "), lambda t: F.length(t) > 0
    )
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
    )


def _sql_pipeline_decontaminate() -> str:
    return f"""
WITH flagged AS (
  SELECT DISTINCT left_id AS doc_id
  FROM ({_sql_contamination_lsh()}) cand
  WHERE est_jaccard >= 0.5
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(trim(d.text), ' '),
                                x -> LENGTH(x) > 0))) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN flagged f USING (doc_id)
WHERE f.doc_id IS NULL
GROUP BY d.source
"""


def _q_dedup_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs (threshold 0.1) — the minhash verifier."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(docs, threshold=0.1).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )

_SQL_DEDUP_JACCARD = f"""
WITH shingled0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s0 FROM documents
), shingled AS (
  SELECT doc_id, {_PH64_SQL.format(x='s0')} AS s FROM shingled0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM shingled a JOIN shingled b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(common / CAST(na.n + nb.n - common AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.1
"""

def _q_time_rollup(spark, sf_dir):
    """Hypertable-style hierarchical rollup (operators/timeagg.py): hour
    partials scan the fact table once; the day grain re-aggregates the
    hour partials (ReusedExchange dedupes the shared subplan)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import time_rollup
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    out = time_rollup(ev, grains=("hour", "day"))
    return out.select(
        "grain",
        "bucket",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )

_SQL_TIME_ROLLUP = """
SELECT 'hour' AS grain, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 2
UNION ALL
SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
       COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE),
       MIN(value), MAX(value)
FROM events GROUP BY 2
"""

# Exact twin of the rollup-from-partials structure: per-grain
# COUNT(DISTINCT) — identical to counting the deduped (bucket,key) partial.
_SQL_DISTINCT_ROLLUP = """
SELECT 'hour' AS grain, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY 2
UNION ALL
SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
       COUNT(DISTINCT user_id)
FROM events GROUP BY 2
"""

# Sequential-recurrence replay: list_reduce is a left fold with the first
# element as the initial accumulator — exactly the Python recurrence's
# prev=None start (streaming/stateful.py _ewma_rows). All literals cast to
# DOUBLE: bare 0.3/0.7 are DECIMALs in DuckDB and would truncate.
_SQL_EWMA = """
WITH e AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS i
  FROM events WHERE user_id < 100
), g AS (
  SELECT user_id, list(value ORDER BY i) AS vs FROM e GROUP BY user_id
)
SELECT e.user_id, e.ts,
       ROUND(list_reduce(g.vs[1:e.i],
             (acc, x) -> 0.3::DOUBLE * x + (1.0::DOUBLE - 0.3::DOUBLE) * acc),
             6) AS ewma
FROM e JOIN g USING (user_id)
"""

def _q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling (Efraimidis–Spirakis with the
    portable dice as the uniform): 100 docs with inclusion probability
    ∝ token count — the corpus mixture-sampling primitive, reproducible
    in any md5-capable engine."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import token_count
    from ratatool_spark.operators.sampler import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", (token_count(F.col("text")) + 1).alias("w")
    )
    return weighted_sample(docs, 100, "w", fields=["doc_id"], seed=42).select(
        "doc_id", (F.col("w") - 1).alias("n_tokens")
    )

_SQL_WEIGHTED_SAMPLE = f"""
WITH scored AS (
  SELECT doc_id, len({_WORDS_SQL}) AS n_tokens,
         POW({_DICE_SQL.format(seed=42, fields="CAST(doc_id AS VARCHAR)")},
             1.0 / (len({_WORDS_SQL}) + 1)) AS k
  FROM documents
)
SELECT doc_id, n_tokens FROM scored ORDER BY k DESC, doc_id LIMIT 100
"""

def _q_distinct_rollup(spark, sf_dir):
    """Distinct-keys-per-time-bucket rollup (operators/timeagg.py), exact
    mergeable-partial form: the fact table dedups once to (hour-bucket,
    user) pairs and the day grain re-dedups those pairs — same
    rollup-from-partials shape as the HLL sketch variant, with exact
    counts, so the whole structure is oracle-gated (COUNT(DISTINCT) per
    grain in DuckDB). The sketch variant (``distinct_rollup`` — the 100 TB
    path, sketches can't hash-match across engines) stays pinned in
    tests/test_streaming.py: union-of-hour-sketches == direct day sketch."""
    from ratatool_spark.operators.timeagg import distinct_rollup_exact
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return distinct_rollup_exact(ev, grains=("hour", "day"))

def _q_top_tokens(spark, sf_dir):
    """Corpus vocabulary head: top-50 whitespace tokens by document
    frequency-weighted count, deterministic tiebreak on the token."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )

_SQL_TOP_TOKENS = f"""
SELECT token, COUNT(*) AS n
FROM (SELECT UNNEST({_WORDS_SQL}) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""

def _q_user_sequences(spark, sf_dir):
    """Training-sequence construction: per user, total event count and the
    '|'-joined type sequence of the first 25 events by (ts, event_id) —
    the groupBy-collect shape that turns event logs into model inputs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("cnt"),
    )
    seq = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        "|",
    )
    return (
        ranked.where(F.col("rn") <= 25)
        .groupBy("user_id")
        .agg(F.max("cnt").alias("n_events"), seq.alias("seq"))
    )

_SQL_USER_SEQUENCES = """
WITH ranked AS (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id, MAX(n_events) AS n_events,
       STRING_AGG(event_type, '|' ORDER BY ts, event_id) AS seq
FROM ranked WHERE rn <= 25
GROUP BY user_id
"""

def _q_range_join_windows(spark, sf_dir):
    """Bucketed range join (operators/rangejoin.py): events matched to
    overlapping 36-hour windows anchored at each distinct day — every
    event lands in 1-2 windows, so this is a true interval join, not a
    disguised groupBy. Bucket = 1 day; hash join on bucket, never a
    nested-loop cartesian."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.rangejoin import range_join
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    wins = (
        ev.select(F.date_trunc("day", "ts").alias("w_start"))
        .distinct()
        .select("w_start", (F.col("w_start") + F.expr("INTERVAL 36 HOURS")).alias("w_end"))
    )
    joined = range_join(ev, wins, "ts", "w_start", "w_end", bucket_width=86400.0)
    return joined.groupBy("w_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_value"),
    )

_SQL_RANGE_JOIN = """
WITH wins AS (
  SELECT w_start, w_start + INTERVAL 36 HOUR AS w_end
  FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start FROM events)
)
SELECT w.w_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM wins w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.w_start
"""

def _q_dedup_cluster(spark, sf_dir):
    """Duplicate-cluster resolution: exact-Jaccard pairs (≥ 0.3) →
    connected components (hash-min label propagation, operators/dedup.py)
    → per-doc cluster label + canonical (min-id) flag over the corpus."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    comp = connected_components(pairs)
    component = F.coalesce("component", "doc_id")
    return docs.join(comp, docs["doc_id"] == comp["id"], "left").select(
        "doc_id",
        component.alias("component"),
        (component == F.col("doc_id")).cast("int").alias("is_canonical"),
    )

# Transitive closure by recursive CTE (set-semantics UNION terminates it);
# component = min reachable id — same fixpoint the Spark label propagation
# converges to.
_SQL_DEDUP_CLUSTER = f"""
WITH RECURSIVE shingled0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s0 FROM documents
), shingled AS (
  SELECT doc_id, {_PH64_SQL.format(x='s0')} AS s FROM shingled0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM shingled a JOIN shingled b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE common / CAST(na.n + nb.n - common AS DOUBLE) >= 0.3
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u AS u, e.v AS v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS component,
       CAST(COALESCE(c.component, d.doc_id) = d.doc_id AS INT) AS is_canonical
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""

def _q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 embedding quantization (functions/vectors.py): 4×
    smaller at-rest vectors for the ANN corpus. Per vector: the scale,
    the max reconstruction error (bounded by scale/2 by construction) and
    the quantized-vs-full cosine — all pure expressions; rounding is
    floor(x/scale + 0.5) so every engine computes identical codes."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.vectors import (
        cosine_sim,
        dequantize,
        quantize_int8,
        quantize_scale,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        quantize_scale(F.col("embedding")).alias("scale"),
    )
    dq = dequantize(quantize_int8(F.col("v"), F.col("scale")), F.col("scale"))
    with_dq = base.withColumn("w", dq)
    err = F.aggregate(
        F.zip_with(F.col("v"), F.col("w"), lambda x, y: F.abs(x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return with_dq.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(err, 6).alias("max_err"),
        F.round(cosine_sim(F.col("v"), F.col("w")), 6).alias("cos_qf"),
    )

_SQL_EMBEDDING_QUANTIZE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), sc AS (
  SELECT vec_id, v, CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
  FROM (
    SELECT vec_id, v,
           list_reduce(list_transform(v, x -> abs(x)),
                       (a, b) -> greatest(a, b)) AS m
    FROM base
  )
), dq AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT) * scale) AS w
  FROM sc
)
SELECT vec_id,
       ROUND(scale, 6) AS scale,
       ROUND(list_reduce(list_transform(range(1, 65), i -> abs(v[i] - w[i])),
                         (a, b) -> greatest(a, b)), 6) AS max_err,
       ROUND(
         list_reduce(list_transform(range(1, 65), i -> v[i] * w[i]),
                     (a, b) -> a + b)
         / (sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]),
                             (a, b) -> a + b))
          * sqrt(list_reduce(list_transform(range(1, 65), i -> w[i] * w[i]),
                             (a, b) -> a + b))), 6) AS cos_qf
FROM dq
"""

def _q_sequence_packing(spark, sf_dir):
    """Training-sequence packing (operators/packing.py): concatenate docs
    per source in doc_id order, chunk at a 2048-token budget; each doc is
    assigned the chunk where its first token lands plus its start offset.
    Pure window expressions — one shuffle by source, parallel across
    sources at any scale."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import token_count
    from ratatool_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tok")
    )
    return pack_sequences(
        docs, "n_tok", 2048, ["doc_id"], ["source"], offset_col="tok_offset"
    )

def _sql_sequence_packing() -> str:
    # token_count twin: size of the whitespace token split
    ntok = f"CAST(len({_WORDS_SQL}) AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, source, {ntok} AS n_tok FROM documents
)
SELECT doc_id, source, n_tok,
       CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
         AS BIGINT) AS bin_id,
       CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS tok_offset
FROM toks
"""

def _q_skew_salted_pricing(spark, sf_dir):
    """Manual skew mitigation end-to-end (operators/skew.py): fact-dim
    join through salted_join (each hot key spread over 8 salt buckets)
    feeding two_stage_agg (partial per (key, salt), exact merge per key).
    Both are row-identical to their plain forms by construction — the
    oracle computes the PLAIN join+agg, so the gate checks exactly that
    identity. Sums are DECIMAL partials so the two-stage merge is exact."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.skew import salted_join, two_stage_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, od, ["l_orderkey"], salt=8)
    out = two_stage_agg(
        j,
        ["o_orderpriority"],
        {
            "n_items": (F.count(F.lit(1)), F.sum("n_items").cast("long")),
            "sum_qty": (
                F.sum(F.col("l_quantity").cast("decimal(28,4)")),
                F.sum("sum_qty"),
            ),
        },
        salt=8,
    )
    return out.select(
        "o_orderpriority", "n_items", F.col("sum_qty").cast("double").alias("sum_qty")
    )

_SQL_SKEW_SALTED = """
SELECT o.o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

def _q_near_dedup(spark, sf_dir):
    """The composed near-duplicate removal pipeline end-to-end
    (operators/dedup.near_dedup): minhash-LSH candidates → exact-Jaccard
    verify on candidates only → connected components over verified pairs
    → keep the min-id doc per duplicate cluster. This is the flagship
    100 TB shape — every quadratic term confined to LSH band collisions."""
    from ratatool_spark.operators.dedup import near_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return near_dedup(docs, threshold=0.7).select("doc_id", "lang", "source")

def _sql_near_dedup() -> str:
    from ratatool_spark.operators.dedup import MINHASH_P, minhash_coeffs

    k, bands = 16, 4  # near_dedup defaults
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
        + " AS bh FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH RECURSIVE shingled0 AS (
  SELECT doc_id, UNNEST({_SHINGLES3_SQL}) AS s0 FROM documents
), shingled AS (
  SELECT doc_id, {_PH64_SQL.format(x='s0')} AS s FROM shingled0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id
), hashed AS (
  SELECT doc_id, s % {MINHASH_P} AS h FROM shingled
), sigs AS (
  SELECT doc_id, {sig_exprs} FROM hashed GROUP BY doc_id
), banded AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
), jinter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS common
  FROM cand c
  JOIN shingled a ON a.doc_id = c.id_a
  JOIN shingled b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY c.id_a, c.id_b
), verified AS (
  SELECT j.id_a, j.id_b
  FROM jinter j
  JOIN sizes na ON na.doc_id = j.id_a
  JOIN sizes nb ON nb.doc_id = j.id_b
  WHERE j.common / CAST(na.n + nb.n - j.common AS DOUBLE) >= 0.7
), edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION
  SELECT id_b AS u, id_a AS v FROM verified
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u AS u, e.v AS v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
)
SELECT d.doc_id, d.lang, d.source
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
WHERE COALESCE(c.component, d.doc_id) = d.doc_id
"""

# 60 bits (the full portable-hash width): with Manku 7-block chunking at
# max_hamming=6 each block carries 8-9 bits, so a block-collision bucket
# holds n/2^8.5 docs. At 32 bits the blocks were 4-5 bits wide and the
# candidate join degenerated toward n²/32 — 4.6× slower at sf0.1 and
# quadratic death at corpus scale. Wider fingerprint = sharper blocks AND
# a more discriminating hamming distance.
_SIMHASH_BITS = 60

def _q_dedup_simhash(spark, sf_dir):
    """Per-doc 60-bit SimHash fingerprint over unigram shingles."""
    from ratatool_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash(docs, bits=_SIMHASH_BITS)

def _sql_dedup_simhash() -> str:
    bits = _SIMHASH_BITS
    unigrams = (
        "list_distinct(list_transform(range(1, greatest(len({w}) - 0, 1) + 1), "
        "i -> concat_ws(' ', {w}[i])))"
    ).format(w=_WORDS_SQL)
    bit_sums = ", ".join(
        f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b_{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN b_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(bits)
    )
    return f"""
WITH shingled AS (
  SELECT doc_id, UNNEST({unigrams}) AS s FROM documents
), hashed AS (
  SELECT doc_id, {_PH64_SQL.format(x='s')} AS h FROM shingled
), sums AS (
  SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id
)
SELECT doc_id, {fp} AS simhash FROM sums
"""

def _q_ann_brute_force(spark, sf_dir):
    """Exact cosine top-3 neighbors for query vectors (vec_id < 5)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = brute_force_topk(emb, q, k=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )

_COS_SQL = """
list_reduce(list_transform(range(1, 65),
    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
    (x, y) -> x + y)
/ (sqrt(list_reduce(list_transform(range(1, 65),
       i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)),
       (x, y) -> x + y))
 * sqrt(list_reduce(list_transform(range(1, 65),
       i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
       (x, y) -> x + y)))
"""

_SQL_ANN_BRUTE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 3
"""

def _q_ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket assignment (8 planes) — the partition
    key of the scalable ANN path."""
    from ratatool_spark.operators.similarity import lsh_bucket

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select("vec_id", lsh_bucket(emb, num_planes=8, seed=7, dim=64))

def _sql_ann_lsh_buckets() -> str:
    planes = []
    for p in range(8):
        sign_hash = _PH64_SQL.format(
            x=f"concat_ws(chr(1), '7', '{p}', CAST(i - 1 AS VARCHAR))"
        )
        proj = (
            f"list_reduce(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * "
            f"(CASE WHEN ({sign_hash} & 1) = 1 THEN 1.0 ELSE -1.0 END)), "
            f"(x, y) -> x + y)"
        )
        planes.append(f"CASE WHEN ({proj}) > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    total = " + ".join(planes)
    return f"SELECT vec_id, ({total}) AS bucket FROM embeddings"


_NGRAMS2_SQL = (
    "list_transform(range(1, greatest(len({w}) - 1, 1) + 1), "
    "i -> concat_ws(' ', {w}[i], {w}[i+1]))"
).format(w=_WORDS_SQL)


def _q_rouge_dedup(spark, sf_dir):
    """ROUGE-2 F1 near-duplicate pairs (operators/dedup.
    rouge_ngram_pairs — the Self-Instruct-style instruction-dedup
    criterion, clipped bigram multiset overlap): one inverted-index
    exchange, pair counts carry min(c_a, c_b) per gram, F1 =
    2·clip/(|A|+|B|) over occurrence totals. The oracle rebuilds the
    clipped-count algebra from raw bigram occurrences — a set-based
    shortcut (Jaccard-style distinct) or unclipped counting changes
    the scores."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import rouge_ngram_pairs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        # fixture trim: bigram posting lists are much denser than the
        # Jaccard gate's trigram sets (pair cost ~ sum df^2); halving
        # docs quarters it, and the clipped algebra under test is
        # corpus-size-independent
        .where(F.col("doc_id") % 2 == 0)
    )
    return rouge_ngram_pairs(docs, n=2, threshold=0.35).select(
        "id_a", "id_b", F.round("rouge_f", 6).alias("rouge_f")
    )


_SQL_ROUGE_DEDUP = f"""
WITH g0 AS (
  SELECT doc_id, UNNEST({_NGRAMS2_SQL}) AS s0 FROM documents
  WHERE doc_id % 2 = 0
), g AS (
  SELECT doc_id, {_PH64_SQL.format(x='s0')} AS s FROM g0
), counts AS (
  SELECT doc_id, s, COUNT(*) AS c FROM g GROUP BY doc_id, s
), sizes AS (
  SELECT doc_id, SUM(c) AS n FROM counts GROUP BY doc_id
), gdf AS (
  -- mirror the operator's df^2 skew cap: grams held by more than
  -- 1000 docs contribute no pair evidence (sizes stay uncapped)
  SELECT s, COUNT(*) AS nd FROM counts GROUP BY s
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         SUM(LEAST(a.c, b.c)) AS clip
  FROM counts a
  JOIN counts b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN gdf ON gdf.s = a.s AND gdf.nd <= 1000
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(2 * clip / CAST(na.n + nb.n AS DOUBLE), 6) AS rouge_f
FROM inter
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE 2 * clip / CAST(na.n + nb.n AS DOUBLE) >= 0.35
"""
