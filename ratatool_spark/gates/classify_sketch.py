"""DSIR/classifier/CMS-sketch/heavy-hitter/PII gates.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


from ratatool_spark.gates._common import _dice_sql


def _q_dsir_select(spark, sf_dir):
    """DSIR-style data selection (operators/corpus dsir_weights/
    dsir_select; Xie et al. NeurIPS'23): English docs as the target
    distribution, the whole pool as raw; every doc weighted by the
    unigram log-likelihood ratio and the top-150 chosen by Gumbel-top-k
    with the portable-hash dice as the uniform — importance resampling
    without replacement, reproducible anywhere from (corpus, seed). The
    oracle replays tokenization, both smoothed models, the ratio sum,
    the Gumbel keys, and the final ranked cut; floats finish at
    ROUND(...,6) (the unigram-gate convention)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import build_token_freqs, dsir_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = build_token_freqs(docs.where(F.col("lang") == "en"))
    rf = build_token_freqs(docs)
    sel = dsir_select(docs, tf, rf, 150, seed=0)
    return sel.select(
        "doc_id",
        "n_tokens",
        F.round("log_ratio", 6).alias("log_ratio"),
        F.round("sample_key", 6).alias("sample_key"),
    )

_SQL_DSIR_SELECT = """
WITH toks AS (
  SELECT doc_id, t.tok AS tok
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ls FROM documents),
       UNNEST(ls) AS t(tok)
  WHERE LENGTH(t.tok) > 0
), tfreqs AS (
  SELECT tok, COUNT(*) AS cnt FROM toks JOIN documents USING (doc_id)
  WHERE lang = 'en' GROUP BY tok
), rfreqs AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
), tn AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM tfreqs),
   rn AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM rfreqs),
scores AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         SUM(LN((COALESCE(tf.cnt, 0) + 0.5) / (tn.total + 0.5 * (tn.v + 1)))
           - LN((COALESCE(rf.cnt, 0) + 0.5) / (rn.total + 0.5 * (rn.v + 1))))
           AS log_ratio
  FROM toks t
  LEFT JOIN tfreqs tf USING (tok)
  LEFT JOIN rfreqs rf USING (tok), tn, rn
  GROUP BY t.doc_id
), keyed AS (
  -- LEFT JOIN from documents: token-free docs keep NULL log_ratio and a
  -- NULL key, order last, and are still selectable once scored docs run
  -- out -- the operator's every-row semantics
  SELECT d.doc_id, COALESCE(s.n_tokens, 0) AS n_tokens, s.log_ratio,
         s.log_ratio + (-LN(-LN(
           (('0x' || substr(md5(concat_ws(chr(1), '0',
              CAST(d.doc_id AS VARCHAR))), 1, 15))::BIGINT)::DOUBLE
           / 1152921504606846976.0
         ))) AS sample_key
  FROM documents d LEFT JOIN scores s USING (doc_id)
)
SELECT doc_id, n_tokens, ROUND(log_ratio, 6) AS log_ratio,
       ROUND(sample_key, 6) AS sample_key
FROM keyed ORDER BY sample_key DESC NULLS LAST, doc_id LIMIT 150
"""

def _q_dsir_select_large(spark, sf_dir):
    """DSIR selection at a LARGE selected fraction (60% of the pool) via
    the scale path: ``small_k_threshold=0`` forces
    operators/sampler.distributed_top_k — value-range buckets on the
    Gumbel sample_key + exact cumulative offsets + per-bucket rank, no
    TakeOrderedAndProject over the selected set (DSIR's real use selects
    10⁸–10⁹ docs; a single k-row merge point is a scale-killer there).
    Row-for-row identical to the orderBy+limit path, which the oracle
    (same SQL as dsir_select_docs at LIMIT 300) pins."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import build_token_freqs, dsir_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = build_token_freqs(docs.where(F.col("lang") == "en"))
    rf = build_token_freqs(docs)
    sel = dsir_select(docs, tf, rf, 300, seed=0, small_k_threshold=0)
    return sel.select(
        "doc_id",
        "n_tokens",
        F.round("log_ratio", 6).alias("log_ratio"),
        F.round("sample_key", 6).alias("sample_key"),
    )

_SQL_DSIR_SELECT_LARGE = _SQL_DSIR_SELECT.replace("LIMIT 150", "LIMIT 300")

def _q_dsir_hashed_select(spark, sf_dir):
    """DSIR with the paper's actual featurization (operators/corpus
    build_hashed_ngram_freqs / dsir_hashed_weights): hashed word-BIGRAM
    features over a fixed 512-bucket space (collisions live in the gate,
    like the CMS width choice) — no vocabulary to collect, closed-form
    Lidstone denominators. English docs = target, pool = raw; Gumbel
    top-150 with the portable dice. Oracle replays bigram construction,
    bucket hashing, both models, Gumbel keys, and the ranked cut."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.hashing import dice
    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        dsir_hashed_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = build_hashed_ngram_freqs(
        docs.where(F.col("lang") == "en"), n=2, n_buckets=512
    )
    rf = build_hashed_ngram_freqs(docs, n=2, n_buckets=512)
    w = dsir_hashed_weights(docs, tf, rf, n=2, n_buckets=512)
    gumbel = -F.log(-F.log(dice(["doc_id"], seed=0)))
    return (
        w.select(
            "doc_id",
            "n_features",
            (F.col("log_ratio") + gumbel).alias("sample_key"),
            "log_ratio",
        )
        .orderBy(F.desc_nulls_last("sample_key"), F.col("doc_id"))
        .limit(150)
        .select(
            "doc_id",
            "n_features",
            F.round("log_ratio", 6).alias("log_ratio"),
            F.round("sample_key", 6).alias("sample_key"),
        )
    )

_SQL_DSIR_HASHED_SELECT = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '),
                     x -> LENGTH(x) > 0) AS ls
  FROM documents
), grams AS (
  SELECT doc_id, ls[i] || ' ' || ls[i + 1] AS g
  FROM base, UNNEST(range(1, len(ls))) AS t(i)
), feats AS (
  SELECT doc_id,
         (('0x' || substr(md5(concat_ws(chr(1), '0', g)), 1, 15))::BIGINT)
           % 512 AS b
  FROM grams
), tfreqs AS (
  SELECT b, COUNT(*) AS cnt FROM feats JOIN documents USING (doc_id)
  WHERE lang = 'en' GROUP BY b
), rfreqs AS (
  SELECT b, COUNT(*) AS cnt FROM feats GROUP BY b
), tn AS (SELECT SUM(cnt) AS total FROM tfreqs),
   rn AS (SELECT SUM(cnt) AS total FROM rfreqs),
scores AS (
  SELECT f.doc_id, COUNT(*) AS n_features,
         SUM(LN((COALESCE(tf.cnt, 0) + 0.5) / (tn.total + 0.5 * 512))
           - LN((COALESCE(rf.cnt, 0) + 0.5) / (rn.total + 0.5 * 512)))
           AS log_ratio
  FROM feats f
  LEFT JOIN tfreqs tf USING (b)
  LEFT JOIN rfreqs rf USING (b), tn, rn
  GROUP BY f.doc_id
), keyed AS (
  SELECT d.doc_id, COALESCE(s.n_features, 0) AS n_features, s.log_ratio,
         s.log_ratio + (-LN(-LN(
           (('0x' || substr(md5(concat_ws(chr(1), '0',
              CAST(d.doc_id AS VARCHAR))), 1, 15))::BIGINT)::DOUBLE
           / 1152921504606846976.0
         ))) AS sample_key
  FROM documents d LEFT JOIN scores s USING (doc_id)
)
SELECT doc_id, n_features, ROUND(log_ratio, 6) AS log_ratio,
       ROUND(sample_key, 6) AS sample_key
FROM keyed ORDER BY sample_key DESC NULLS LAST, doc_id LIMIT 150
"""

def _q_quality_classifier(spark, sf_dir):
    """Trained quality classifier (operators/corpus train_quality_weights
    + quality_classifier_score; NBSVM-style per-bucket log-odds, Wang &
    Manning ACL'12): English docs are the positive class, the rest the
    negative; hashed word-bigram features over 512 buckets (the
    dsir_hashed featurization); every doc scored with mean log-odds +
    sigmoid. Weights "train" as two count aggregates, so the whole model
    — training included — replays exactly in the oracle; floats finish
    at ROUND(...,6)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        quality_classifier_score,
        train_quality_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pos = build_hashed_ngram_freqs(
        docs.where(F.col("lang") == "en"), n=2, n_buckets=512
    )
    neg = build_hashed_ngram_freqs(
        docs.where(F.col("lang") != "en"), n=2, n_buckets=512
    )
    w = train_quality_weights(pos, neg, n_buckets=512)
    out = quality_classifier_score(docs, w, n_buckets=512, n=2)
    return out.select(
        "doc_id",
        "n_features",
        F.round("logit", 6).alias("logit"),
        F.round("prob", 6).alias("prob"),
    )

_SQL_QUALITY_CLASSIFIER = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '),
                     x -> LENGTH(x) > 0) AS ls
  FROM documents
), grams AS (
  SELECT doc_id, ls[i] || ' ' || ls[i + 1] AS g
  FROM base, UNNEST(range(1, len(ls))) AS t(i)
), feats AS (
  SELECT doc_id,
         (('0x' || substr(md5(concat_ws(chr(1), '0', g)), 1, 15))::BIGINT)
           % 512 AS b
  FROM grams
), pfreqs AS (
  SELECT b, COUNT(*) AS cnt FROM feats JOIN documents USING (doc_id)
  WHERE lang = 'en' GROUP BY b
), nfreqs AS (
  SELECT b, COUNT(*) AS cnt FROM feats JOIN documents USING (doc_id)
  WHERE lang <> 'en' GROUP BY b
), pn AS (SELECT SUM(cnt) AS total FROM pfreqs),
   nn AS (SELECT SUM(cnt) AS total FROM nfreqs),
scores AS (
  -- per-feature NB log-odds averaged per doc: identical to joining the
  -- COMPLETE 512-row trained weight table (unseen buckets carry the
  -- smoothed prior ratio, which the same formula yields at cnt = 0)
  SELECT f.doc_id, COUNT(*) AS n_features,
         AVG(LN((COALESCE(pf.cnt, 0) + 0.5) / (pn.total + 0.5 * 512))
           - LN((COALESCE(nf.cnt, 0) + 0.5) / (nn.total + 0.5 * 512)))
           AS logit
  FROM feats f
  LEFT JOIN pfreqs pf USING (b)
  LEFT JOIN nfreqs nf USING (b), pn, nn
  GROUP BY f.doc_id
)
SELECT d.doc_id, COALESCE(s.n_features, 0) AS n_features,
       ROUND(s.logit, 6) AS logit,
       ROUND(1.0 / (1.0 + EXP(-s.logit)), 6) AS prob
FROM documents d LEFT JOIN scores s USING (doc_id)
"""

def _q_fuzzy_join(spark, sf_dir):
    """Blocked fuzzy join / entity resolution (operators/fuzzy):
    customers linked to a perturbed twin of themselves ('1' -> 'l' typo
    noise in every name, re-keyed ids) — block on nationality, verify by
    normalized Levenshtein, keep each left id's best link. The classic
    record-linkage block-then-verify shape: candidates come from the
    block equi-join, never all pairs, and the oversized-block guard is
    live in the plan. Similarity arithmetic (1 - lev/maxlen, identical
    op order) replays exactly in DuckDB — no tolerance band."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.fuzzy import fuzzy_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 5 == 0
    )
    # block on (nation, segment): the block key must be typo-stable and
    # FINE — coarse blocks are the fuzzy-join cost envelope (pairs grow
    # as n²/blocks; nation-only blocking measured 25 s at sf0.1)
    blk = F.concat_ws("|", "c_nationkey", "c_mktsegment")
    left = cust.select(
        F.col("c_custkey").alias("lid"), blk.alias("blk"), "c_name"
    )
    right = cust.select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        blk.alias("blk"),
        F.translate("c_name", "1", "l").alias("c_name"),
    )
    return fuzzy_join(
        left,
        right,
        "lid",
        "rid",
        "blk",
        [("c_name", "c_name")],
        threshold=0.9,
        keep_best=True,
    )

def _q_fellegi_sunter(spark, sf_dir):
    """Probabilistic record linkage (operators/fuzzy.fellegi_sunter_links;
    Fellegi & Sunter 1969): customers linked to an engineered twin —
    account cents shifted on every third key, market segment rewritten
    on every fourth, name NULLed on every fifth left row (the
    missing-field attests-nothing rule) — blocked on nation. Each field
    carries its log2(m/u) evidence weight as a plan literal; the score
    is a fixed left-to-right sum, so DuckDB replays the arithmetic
    exactly (weights injected into the SQL from the SAME python floats
    via repr). Account balance compares as integer-cents STRINGS —
    double→string formatting differs between engines, int64→string
    doesn't."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.fuzzy import fellegi_sunter_links

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 7 == 0
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    left = cust.select(
        F.col("c_custkey").alias("lid"),
        F.col("c_nationkey").alias("blk"),
        cents.cast("string").alias("acct"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
    )
    right = cust.select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.col("c_nationkey").alias("blk"),
        F.when(F.col("c_custkey") % 3 == 0, (cents + 1).cast("string"))
        .otherwise(cents.cast("string"))
        .alias("acct"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_name",
    )
    out = fellegi_sunter_links(
        left,
        right,
        "lid",
        "rid",
        "blk",
        [
            ("acct", "acct", 0.95, 0.001),
            ("c_mktsegment", "c_mktsegment", 0.9, 0.2),
            ("c_name", "c_name", 0.97, 0.0002),
        ],
        threshold=5.0,
    )
    return out.select(
        "lid", "rid", F.round("score", 6).alias("score"), "n_agree"
    )


def _sql_fellegi_sunter() -> str:
    import math

    ws = []
    for m, u in ((0.95, 0.001), (0.9, 0.2), (0.97, 0.0002)):
        ws.append((repr(math.log2(m / u)), repr(math.log2((1 - m) / (1 - u)))))

    def case(l, r, wa, wd):
        return (
            f"CASE WHEN {l} IS NULL OR {r} IS NULL THEN 0.0 "
            f"WHEN {l} = {r} THEN {wa} ELSE {wd} END"
        )

    def acase(l, r):
        return (
            f"CASE WHEN {l} IS NULL OR {r} IS NULL THEN 0 "
            f"WHEN {l} = {r} THEN 1 ELSE 0 END"
        )

    score = " + ".join(
        [
            "0.0",
            case("l_p", "r_p", *ws[0]),
            case("l_s", "r_s", *ws[1]),
            case("l_n", "r_n", *ws[2]),
        ]
    )
    agree = " + ".join(
        [acase("l_p", "r_p"), acase("l_s", "r_s"), acase("l_n", "r_n")]
    )
    return f"""
WITH base AS (
  SELECT * FROM customer WHERE c_custkey % 7 = 0
), cents AS (
  SELECT *, CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS ac
  FROM base
), l AS (
  SELECT c_custkey AS lid, c_nationkey AS blk, ac AS l_p,
         c_mktsegment AS l_s,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS l_n
  FROM cents
), r AS (
  SELECT c_custkey + 1000000 AS rid, c_nationkey AS blk,
         CASE WHEN c_custkey % 3 = 0 THEN
           CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1 AS VARCHAR)
              ELSE ac END AS r_p,
         CASE WHEN c_custkey % 4 = 0 THEN 'PERTURBED'
              ELSE c_mktsegment END AS r_s,
         c_name AS r_n
  FROM cents
), scored AS (
  SELECT l.lid, r.rid,
         {score} AS score,
         {agree} AS n_agree
  FROM l JOIN r USING (blk)
)
SELECT lid, rid, ROUND(score, 6) AS score, CAST(n_agree AS INT) AS n_agree
FROM scored WHERE score >= 5.0
"""



def _q_fellegi_em(spark, sf_dir):
    """Unsupervised Fellegi-Sunter training (operators/fuzzy.
    fellegi_sunter_em; Winkler's EM recipe): the SAME engineered-twin
    fixture as fellegi_sunter_links, but the m/u probabilities are now
    ESTIMATED from the blocked candidate pairs instead of supplied — one
    data pass reduces pairs to agreement-pattern counts, then 5
    fixed-point EM iterations (posteriors snapped to an integer grid,
    exact integer M-step sums, one fixed float op per parameter). The
    oracle replays the pattern reduction AND all 5 unrolled iterations
    in SQL with the identical op sequence, so a drift in the E-step
    product order, the missing-field rule, the quantization, or the
    clamp flips a trained parameter and mismatches."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.fuzzy import fellegi_sunter_em

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 7 == 0
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    left = cust.select(
        F.col("c_custkey").alias("lid"),
        F.col("c_nationkey").alias("blk"),
        cents.cast("string").alias("acct"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
    )
    right = cust.select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.col("c_nationkey").alias("blk"),
        F.when(F.col("c_custkey") % 3 == 0, (cents + 1).cast("string"))
        .otherwise(cents.cast("string"))
        .alias("acct"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_name",
    )
    model = fellegi_sunter_em(
        left,
        right,
        "lid",
        "rid",
        "blk",
        [("acct", "acct"), ("c_mktsegment", "c_mktsegment"),
         ("c_name", "c_name")],
        n_iters=5,
    )
    rows = [
        (i, mi, ui, model["lam"])
        for i, (mi, ui) in enumerate(model["fields"])
    ]
    from ratatool_spark.functions.localrel import local_df

    out = local_df(spark, rows, "field int, m double, u double, lam double")
    return out.select(
        "field",
        F.round("m", 8).alias("m"),
        F.round("u", 8).alias("u"),
        F.round("lam", 8).alias("lam"),
    )


def _fellegi_em_ctes(n_iters: int = 5, nf: int = 3) -> str:
    one = "CAST(1.0 AS DOUBLE)"
    S = "1000000000000"

    def fac(i, p):
        return (
            f"CASE WHEN g{i} = 1 THEN it.{p}{i} "
            f"WHEN g{i} = 0 THEN {one} - it.{p}{i} ELSE {one} END"
        )

    def clamp(x):
        return (
            f"LEAST(GREATEST({x}, CAST(1e-9 AS DOUBLE)), "
            f"CAST(0.999999999 AS DOUBLE))"
        )

    flags = ", ".join(
        f"CASE WHEN l_{c} IS NULL OR r_{c} IS NULL THEN 2 "
        f"WHEN l_{c} = r_{c} THEN 1 ELSE 0 END AS g{i}"
        for i, c in enumerate(("p", "s", "n"))
    )
    gcols = ", ".join(f"g{i}" for i in range(nf))
    ctes = [
        """base AS (
  SELECT * FROM customer WHERE c_custkey % 7 = 0
), cents AS (
  SELECT *, CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS ac
  FROM base
), l AS (
  SELECT c_custkey AS lid, c_nationkey AS blk, ac AS l_p,
         c_mktsegment AS l_s,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS l_n
  FROM cents
), r AS (
  SELECT c_custkey + 1000000 AS rid, c_nationkey AS blk,
         CASE WHEN c_custkey % 3 = 0 THEN
           CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1 AS VARCHAR)
              ELSE ac END AS r_p,
         CASE WHEN c_custkey % 4 = 0 THEN 'PERTURBED'
              ELSE c_mktsegment END AS r_s,
         c_name AS r_n
  FROM cents
), pat AS MATERIALIZED (
  SELECT """ + gcols + """, COUNT(*) AS cnt FROM (
    SELECT """ + flags + """
    FROM l JOIN r USING (blk)
  ) GROUP BY """ + gcols + """
), np AS (SELECT SUM(cnt) AS n FROM pat)""",
        "it0 AS (SELECT CAST(0.1 AS DOUBLE) AS lam, "
        + ", ".join(
            f"CAST(0.9 AS DOUBLE) AS m{i}, CAST(0.1 AS DOUBLE) AS u{i}"
            for i in range(nf)
        )
        + ")",
    ]
    for k in range(1, n_iters + 1):
        mnum = " * ".join(fac(i, "m") for i in range(nf))
        unum = " * ".join(fac(i, "u") for i in range(nf))
        parms = [
            clamp(
                f"CAST(SUM(wq * cnt) AS DOUBLE) / "
                f"CAST({S} * (SELECT n FROM np) AS DOUBLE)"
            )
            + " AS lam"
        ]
        for i in range(nf):
            mden = f"SUM(CASE WHEN g{i} <> 2 THEN wq * cnt ELSE 0 END)"
            uden = f"SUM(CASE WHEN g{i} <> 2 THEN ({S} - wq) * cnt ELSE 0 END)"
            mnum_i = f"SUM(CASE WHEN g{i} = 1 THEN wq * cnt ELSE 0 END)"
            unum_i = f"SUM(CASE WHEN g{i} = 1 THEN ({S} - wq) * cnt ELSE 0 END)"
            parms.append(
                f"CASE WHEN {mden} = 0 THEN (SELECT m{i} FROM it{k - 1}) "
                f"ELSE " + clamp(f"CAST({mnum_i} AS DOUBLE) / CAST({mden} AS DOUBLE)")
                + f" END AS m{i}"
            )
            parms.append(
                f"CASE WHEN {uden} = 0 THEN (SELECT u{i} FROM it{k - 1}) "
                f"ELSE " + clamp(f"CAST({unum_i} AS DOUBLE) / CAST({uden} AS DOUBLE)")
                + f" END AS u{i}"
            )
        ctes.append(
            f"""e{k} AS MATERIALIZED (
  SELECT {gcols}, cnt,
         CAST(FLOOR(num / (num + den) * CAST({S}.0 AS DOUBLE)) AS BIGINT)
           AS wq
  FROM (
    SELECT p.*,
           it.lam * {mnum} AS num,
           ({one} - it.lam) * {unum} AS den
    FROM pat p CROSS JOIN it{k - 1} it
  )
), it{k} AS MATERIALIZED (
  SELECT """ + ",\n         ".join(parms) + f"""
  FROM e{k}
)"""
        )
    return "WITH " + ",\n".join(ctes)


def _sql_fellegi_em(n_iters: int = 5, nf: int = 3) -> str:
    finals = "\nUNION ALL\n".join(
        f"SELECT {i} AS field, ROUND(m{i}, 8) AS m, ROUND(u{i}, 8) AS u, "
        f"ROUND(lam, 8) AS lam FROM it{n_iters}"
        for i in range(nf)
    )
    return _fellegi_em_ctes(n_iters, nf) + "\n" + finals


def _q_fellegi_auto(spark, sf_dir):
    """End-to-end unsupervised linkage (EM-train THEN score — the
    composition a real pipeline runs): fellegi_sunter_em estimates m/u
    on the engineered-twin fixture and the trained probabilities feed
    straight into fellegi_sunter_links; links score >= 5 bits of
    evidence under the LEARNED weights. The oracle replays the full
    chain — pattern reduction, 5 EM iterations, then the scorer with
    LOG2 weights computed from the trained parameters in SQL — so the
    train->score plumbing (not just each half) is gated."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.fuzzy import (
        fellegi_sunter_em,
        fellegi_sunter_links,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 7 == 0
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    left = cust.select(
        F.col("c_custkey").alias("lid"),
        F.col("c_nationkey").alias("blk"),
        cents.cast("string").alias("acct"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
    )
    right = cust.select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.col("c_nationkey").alias("blk"),
        F.when(F.col("c_custkey") % 3 == 0, (cents + 1).cast("string"))
        .otherwise(cents.cast("string"))
        .alias("acct"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_name",
    )
    pairs = [("acct", "acct"), ("c_mktsegment", "c_mktsegment"),
             ("c_name", "c_name")]
    model = fellegi_sunter_em(
        left, right, "lid", "rid", "blk", pairs, n_iters=5
    )
    compares = [
        (lc, rc, m, u) for (lc, rc), (m, u) in zip(pairs, model["fields"])
    ]
    out = fellegi_sunter_links(
        left, right, "lid", "rid", "blk", compares, threshold=5.0
    )
    return out.select(
        "lid", "rid", F.round("score", 6).alias("score"), "n_agree"
    )


def _sql_fellegi_auto(n_iters: int = 5) -> str:
    cols = ("p", "s", "n")

    def case(i):
        l, r = f"l_{cols[i]}", f"r_{cols[i]}"
        return (
            f"CASE WHEN {l} IS NULL OR {r} IS NULL THEN 0.0 "
            f"WHEN {l} = {r} THEN LOG2(w.m{i} / w.u{i}) "
            f"ELSE LOG2((CAST(1.0 AS DOUBLE) - w.m{i}) "
            f"/ (CAST(1.0 AS DOUBLE) - w.u{i})) END"
        )

    def acase(i):
        l, r = f"l_{cols[i]}", f"r_{cols[i]}"
        return (
            f"CASE WHEN {l} IS NULL OR {r} IS NULL THEN 0 "
            f"WHEN {l} = {r} THEN 1 ELSE 0 END"
        )

    score = " + ".join(["0.0"] + [case(i) for i in range(3)])
    agree = " + ".join(acase(i) for i in range(3))
    return (
        _fellegi_em_ctes(n_iters)
        + f""",
scored AS (
  SELECT l.lid, r.rid,
         {score} AS score,
         {agree} AS n_agree
  FROM l JOIN r USING (blk), it{n_iters} w
)
SELECT lid, rid, ROUND(score, 6) AS score, CAST(n_agree AS INT) AS n_agree
FROM scored WHERE score >= 5.0
"""
    )



def _q_entity_clusters(spark, sf_dir):
    """Entity resolution end-to-end: probabilistic links -> transitive
    closure -> entity clusters (the composition that turns pairwise
    linkage into deduplicated entities). Same engineered-twin fixture
    and supplied m/u weights as fellegi_sunter_links; the accepted pairs
    feed operators/dedup.connected_components (hash-min label
    propagation, O(diameter) checkpointed rounds at scale). The oracle
    replays the scorer AND the closure (recursive reachability, min
    reachable id as the cluster label)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import connected_components
    from ratatool_spark.operators.fuzzy import fellegi_sunter_links

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 7 == 0
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    left = cust.select(
        F.col("c_custkey").alias("lid"),
        F.col("c_nationkey").alias("blk"),
        cents.cast("string").alias("acct"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
    )
    right = cust.select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.col("c_nationkey").alias("blk"),
        F.when(F.col("c_custkey") % 3 == 0, (cents + 1).cast("string"))
        .otherwise(cents.cast("string"))
        .alias("acct"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_name",
    )
    links = fellegi_sunter_links(
        left,
        right,
        "lid",
        "rid",
        "blk",
        [
            ("acct", "acct", 0.95, 0.001),
            ("c_mktsegment", "c_mktsegment", 0.9, 0.2),
            ("c_name", "c_name", 0.97, 0.0002),
        ],
        threshold=5.0,
    )
    return connected_components(links.select("lid", "rid"), "lid", "rid")


def _sql_entity_clusters() -> str:
    links = _sql_fellegi_sunter().strip()
    return f"""
WITH RECURSIVE links AS ({links}),
edges AS (
  SELECT lid AS u, rid AS v FROM links
  UNION
  SELECT rid AS u, lid AS v FROM links
),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u AS u, e.v AS v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
"""


_SQL_FUZZY_JOIN = """
WITH base AS (
  SELECT * FROM customer WHERE c_custkey % 5 = 0
), l AS (
  SELECT c_custkey AS lid,
         concat_ws('|', c_nationkey, c_mktsegment) AS blk, c_name
  FROM base
), r AS (
  SELECT c_custkey + 1000000 AS rid,
         concat_ws('|', c_nationkey, c_mktsegment) AS blk,
         replace(c_name, '1', 'l') AS c_name
  FROM base
), big AS (
  -- the max_block_size guard, replayed: blocks oversized on EITHER side
  -- are dropped from both (Spark side runs the default cap of 1000 --
  -- inert at gate SF, but the twin must scale with it)
  SELECT blk FROM (
    SELECT blk, COUNT(*) AS n FROM l GROUP BY blk
    UNION ALL
    SELECT blk, COUNT(*) AS n FROM r GROUP BY blk
  ) GROUP BY blk HAVING MAX(n) > 1000
), cand AS (
  SELECT l.lid, r.rid,
         COALESCE(CASE WHEN length(l.c_name) > 0 AND length(r.c_name) > 0
                       THEN CAST(1.0 - levenshtein(l.c_name, r.c_name)
                                  / greatest(length(l.c_name),
                                             length(r.c_name), 1)
                             AS DOUBLE)
                       ELSE 0.0 END, 0.0) AS sim
  FROM l JOIN r USING (blk)
  WHERE blk NOT IN (SELECT blk FROM big)
)
SELECT lid, rid, sim FROM (
  SELECT lid, rid, sim,
         ROW_NUMBER() OVER (PARTITION BY lid ORDER BY sim DESC, rid NULLS FIRST) AS rn
  FROM cand WHERE sim >= 0.9
) WHERE rn = 1
"""


def _q_fuzzy_multiblock(spark, sf_dir):
    """Multi-pass blocked linkage (operators/fuzzy.fuzzy_join with a
    LIST of block keys): every third twin's (nation, segment) block key
    is drifted (nationkey+1), so pass 0 alone misses it — the
    account-balance band pass (floor(acctbal/100), typo-stable in this
    fixture) recovers exactly those, and pairs reachable
    through BOTH passes are deduped before verification (one score row
    each). The production linkage recall net: union of independent
    blocking passes, candidates never all-pairs. Same exact-replay
    Levenshtein arithmetic as fuzzy_join_customers."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.fuzzy import fuzzy_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 5 == 0
    )
    left = cust.select(
        F.col("c_custkey").alias("lid"),
        F.concat_ws("|", "c_nationkey", "c_mktsegment").alias("blk1"),
        F.floor(F.col("c_acctbal") / 100).alias("blk2"),
        "c_name",
    )
    drift = (F.col("c_nationkey") + (F.col("c_custkey") % 3 == 0).cast("int")) % 25
    right = cust.select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.concat_ws("|", drift, "c_mktsegment").alias("blk1"),
        F.floor(F.col("c_acctbal") / 100).alias("blk2"),
        F.translate("c_name", "1", "l").alias("c_name"),
    )
    return fuzzy_join(
        left,
        right,
        "lid",
        "rid",
        ["blk1", "blk2"],
        [("c_name", "c_name")],
        threshold=0.9,
    )

_SQL_FUZZY_MULTIBLOCK = """
WITH base AS (
  SELECT * FROM customer WHERE c_custkey % 5 = 0
), l AS (
  SELECT c_custkey AS lid,
         concat_ws('|', c_nationkey, c_mktsegment) AS blk1,
         CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS blk2, c_name
  FROM base
), r AS (
  SELECT c_custkey + 1000000 AS rid,
         concat_ws('|',
                   (c_nationkey
                    + CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END) % 25,
                   c_mktsegment) AS blk1,
         CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS blk2,
         replace(c_name, '1', 'l') AS c_name
  FROM base
), big1 AS (
  SELECT b FROM (
    SELECT blk1 AS b, COUNT(*) AS n FROM l GROUP BY 1
    UNION ALL SELECT blk1 AS b, COUNT(*) AS n FROM r GROUP BY 1
  ) GROUP BY b HAVING MAX(n) > 1000
), big2 AS (
  SELECT b FROM (
    SELECT blk2 AS b, COUNT(*) AS n FROM l GROUP BY 1
    UNION ALL SELECT blk2 AS b, COUNT(*) AS n FROM r GROUP BY 1
  ) GROUP BY b HAVING MAX(n) > 1000
), cand AS (
  SELECT DISTINCT lid, rid, ln, rn FROM (
    SELECT l.lid, r.rid, l.c_name, r.c_name
    FROM l JOIN r ON l.blk1 = r.blk1
    WHERE l.blk1 NOT IN (SELECT b FROM big1)
    UNION ALL
    SELECT l.lid, r.rid, l.c_name, r.c_name
    FROM l JOIN r ON l.blk2 = r.blk2
    WHERE l.blk2 NOT IN (SELECT b FROM big2)
  ) u(lid, rid, ln, rn)
)
SELECT lid, rid,
       COALESCE(CASE WHEN length(ln) > 0 AND length(rn) > 0
                     THEN CAST(1.0 - levenshtein(ln, rn)
                                / greatest(length(ln), length(rn), 1)
                           AS DOUBLE)
                     ELSE 0.0 END, 0.0) AS sim
FROM cand
WHERE COALESCE(CASE WHEN length(ln) > 0 AND length(rn) > 0
                    THEN CAST(1.0 - levenshtein(ln, rn)
                               / greatest(length(ln), length(rn), 1)
                          AS DOUBLE)
                    ELSE 0.0 END, 0.0) >= 0.9
"""

_CMS_PROBES = (1, 2, 3, 4, 5, 6, 999999)

def _q_freq_sketch_merge(spark, sf_dir):
    """Mergeable count-min frequency sketch tables (operators/freq
    build/merge/estimate_freq_sketches): per-event-type sketches built on
    two disjoint event slices and MERGED, then point estimates for a
    probe key list (6 live users + one absent). Count-min merge is an
    element-wise counter sum, so the gated values pin merge ==
    direct-build EXACTLY, and because the row hash is the portable md5
    hash and the bucket map plain modular arithmetic, the DuckDB oracle
    replays the whole sketch — estimates gate exactly, no tolerance band
    (width 256 << distinct users, so collisions are live in the gate)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.freq import (
        build_freq_sketches,
        estimate_freqs,
        merge_freq_sketches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = merge_freq_sketches(
        build_freq_sketches(a, ["event_type"], "user_id", depth=4, width=256),
        build_freq_sketches(b, ["event_type"], "user_id", depth=4, width=256),
    )
    keys = spark.createDataFrame([(i,) for i in _CMS_PROBES], "user_id long")
    return estimate_freqs(merged, keys, "user_id")

def _sql_freq_sketch_merge() -> str:
    from ratatool_spark.operators.freq import cms_slot_sql

    slot = cms_slot_sql("hh", "j", 256)
    probe_list = ", ".join(str(p) for p in _CMS_PROBES)
    h = (
        "('0x' || substr(md5(concat_ws(chr(1), '0', "
        "CAST({v} AS VARCHAR))), 1, 15))::BIGINT"
    )
    return f"""
WITH h AS (
  SELECT event_type, {h.format(v="user_id")} AS hh FROM events
), slots AS (
  SELECT event_type, j, {slot} AS slot
  FROM h CROSS JOIN (SELECT unnest(range(4)) AS j)
), counts AS (
  SELECT event_type, j, slot, COUNT(*) AS c FROM slots GROUP BY 1, 2, 3
), probes AS (
  SELECT CAST(u AS BIGINT) AS user_id, {h.format(v="u")} AS hh
  FROM (SELECT unnest([{probe_list}]) AS u)
), pslots AS (
  SELECT user_id, j, {slot} AS slot
  FROM probes CROSS JOIN (SELECT unnest(range(4)) AS j)
), grp AS (SELECT DISTINCT event_type FROM events)
SELECT g.event_type, p.user_id,
       CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est_count
FROM grp g
CROSS JOIN pslots p
LEFT JOIN counts c
  ON c.event_type = g.event_type AND c.j = p.j AND c.slot = p.slot
GROUP BY 1, 2
"""

def _q_sketch_join_size(spark, sf_dir):
    """CMS inner-product join-size estimation (operators/freq
    sketch_join_size): per-event-type estimate of |A ⋈ B on user_id|
    for two disjoint event slices, from their count-min sketches alone —
    the pre-join planning signal (provision partitions / pick a skew
    strategy) computed without rescanning either side. The estimate is
    min over depth rows of the counter dot product; every term is
    deterministic modular arithmetic on the portable md5 hash, so the
    DuckDB oracle replays it exactly — no tolerance band (width 256 <<
    distinct users keeps collisions, and therefore the overestimate,
    live in the gate)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.freq import (
        build_freq_sketches,
        sketch_join_size,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    return sketch_join_size(
        build_freq_sketches(a, ["event_type"], "user_id", depth=4, width=256),
        build_freq_sketches(b, ["event_type"], "user_id", depth=4, width=256),
    )

def _sql_sketch_join_size() -> str:
    from ratatool_spark.operators.freq import cms_slot_sql

    slot = cms_slot_sql("hh", "j", 256)
    h = (
        "('0x' || substr(md5(concat_ws(chr(1), '0', "
        "CAST(user_id AS VARCHAR))), 1, 15))::BIGINT"
    )
    return f"""
WITH h AS (
  SELECT event_id % 2 AS s, event_type, {h} AS hh FROM events
), slots AS (
  SELECT s, event_type, j, {slot} AS slot
  FROM h CROSS JOIN (SELECT unnest(range(4)) AS j)
), counts AS (
  SELECT s, event_type, j, slot, COUNT(*) AS c
  FROM slots GROUP BY 1, 2, 3, 4
), grid AS (
  SELECT a.event_type, j
  FROM (SELECT DISTINCT event_type FROM counts WHERE s = 0) a
  JOIN (SELECT DISTINCT event_type FROM counts WHERE s = 1) b
    ON a.event_type = b.event_type
  CROSS JOIN (SELECT unnest(range(4)) AS j)
), dots AS (
  SELECT g.event_type, g.j, CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS dot
  FROM grid g
  LEFT JOIN counts a ON a.s = 0 AND a.event_type = g.event_type AND a.j = g.j
  LEFT JOIN counts b ON b.s = 1 AND b.event_type = a.event_type
                     AND b.j = a.j AND b.slot = a.slot
  GROUP BY 1, 2
), nrows AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN s = 0 THEN c ELSE 0 END) / 4 AS BIGINT) AS n_rows_a,
         CAST(SUM(CASE WHEN s = 1 THEN c ELSE 0 END) / 4 AS BIGINT) AS n_rows_b
  FROM counts GROUP BY 1
)
SELECT d.event_type, MIN(d.dot) AS est_join_rows,
       ANY_VALUE(n.n_rows_a) AS n_rows_a, ANY_VALUE(n.n_rows_b) AS n_rows_b
FROM dots d JOIN nrows n ON n.event_type = d.event_type
GROUP BY 1
"""

def _q_sketch_heavy_hitters(spark, sf_dir):
    """Heavy hitters FROM sketch artifacts (operators/freq
    sketch_heavy_hitters): per-slice exact top-12 candidate keys union +
    merged count-min re-estimate + top-5 rank — the pattern that answers
    'global heavy hitters over any union of batches' without a fact
    rescan. The oracle replays candidates, counters, estimates, and the
    final ranking, all from the same deterministic arithmetic."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.freq import (
        build_freq_sketches,
        heavy_hitters,
        merge_freq_sketches,
        sketch_heavy_hitters,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    cand = (
        heavy_hitters(a, ["event_type"], "user_id", k=12)
        .select("user_id")
        .union(heavy_hitters(b, ["event_type"], "user_id", k=12).select("user_id"))
    )
    merged = merge_freq_sketches(
        build_freq_sketches(a, ["event_type"], "user_id", depth=4, width=256),
        build_freq_sketches(b, ["event_type"], "user_id", depth=4, width=256),
    )
    return sketch_heavy_hitters(merged, cand, "user_id", k=5)

def _sql_sketch_heavy_hitters() -> str:
    from ratatool_spark.operators.freq import cms_slot_sql

    slot = cms_slot_sql("hh", "j", 256)
    h = (
        "('0x' || substr(md5(concat_ws(chr(1), '0', "
        "CAST({v} AS VARCHAR))), 1, 15))::BIGINT"
    )
    return f"""
WITH h AS (
  SELECT event_type, {h.format(v="user_id")} AS hh FROM events
), slots AS (
  SELECT event_type, j, {slot} AS slot
  FROM h CROSS JOIN (SELECT unnest(range(4)) AS j)
), counts AS (
  SELECT event_type, j, slot, COUNT(*) AS c FROM slots GROUP BY 1, 2, 3
), cand AS (
  SELECT DISTINCT user_id FROM (
    SELECT slice, event_type, user_id,
           ROW_NUMBER() OVER (PARTITION BY slice, event_type
                              ORDER BY COUNT(*) DESC, user_id) AS rn
    FROM (SELECT event_id % 2 AS slice, event_type, user_id FROM events)
    GROUP BY slice, event_type, user_id
  ) WHERE rn <= 12
), probes AS (
  SELECT user_id, {h.format(v="user_id")} AS hh FROM cand
), pslots AS (
  SELECT user_id, j, {slot} AS slot
  FROM probes CROSS JOIN (SELECT unnest(range(4)) AS j)
), grp AS (SELECT DISTINCT event_type FROM events)
, est AS (
  SELECT g.event_type, p.user_id,
         CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est_count
  FROM grp g
  CROSS JOIN pslots p
  LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.j = p.j AND c.slot = p.slot
  GROUP BY 1, 2
)
SELECT event_type, user_id, est_count, "rank" FROM (
  SELECT event_type, user_id, est_count,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY est_count DESC, user_id NULLS FIRST) AS "rank"
  FROM est
) WHERE "rank" <= 5
"""

def _q_stream_freq_sketches(spark, sf_dir):
    """Streaming count-min maintenance run for REAL (streaming/sketches
    stream_freq_sketches): events staged into a multi-file landing zone,
    streamed one file per trigger (availableNow), each micro-batch
    writing its own counter partial; the read side sums every partial and
    estimates the same probe list as freq_sketch_merge. Counter addition
    is associative, so the oracle is the direct single-pass replay — the
    gate fails if the streaming path drops, duplicates, or mis-merges any
    batch."""
    import os

    from ratatool_spark.operators.freq import estimate_freqs
    from ratatool_spark.streaming.sketches import (
        read_stream_freq_sketches,
        stream_freq_sketches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    root = scratch_dir(prefix="rt_fsk_")
    src = os.path.join(root, "incoming")
    # 2 staged files -> 2 real micro-batches: enough to prove the
    # per-batch partial + merge path without doubling the gate's cost
    ev.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_freq_sketches(
            stream,
            os.path.join(root, "sk"),
            os.path.join(root, "ckpt"),
            group_cols=["event_type"],
            key_col="user_id",
            depth=4,
            width=256,
        )
        q.awaitTermination()
    merged = read_stream_freq_sketches(spark, os.path.join(root, "sk"))
    keys = spark.createDataFrame([(i,) for i in _CMS_PROBES], "user_id long")
    return estimate_freqs(merged, keys, "user_id")

def _q_heavy_hitters(spark, sf_dir):
    """Exact per-group heavy hitters (operators/freq.heavy_hitters): the
    8 most frequent suppliers per returnflag, deterministic tie-break on
    the smaller key. Two map-side-combined shuffles + WindowGroupLimit —
    the second exchange carries k rows per group, never the distinct-key
    table."""
    from ratatool_spark.operators.freq import heavy_hitters
    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("lineitem",))
    return heavy_hitters(t["lineitem"], ["l_returnflag"], "l_suppkey", k=8)

_SQL_HEAVY_HITTERS = """
SELECT l_returnflag, l_suppkey, cnt, "rank" FROM (
  SELECT l_returnflag, l_suppkey, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY COUNT(*) DESC, l_suppkey NULLS FIRST) AS "rank"
  FROM lineitem GROUP BY l_returnflag, l_suppkey
) WHERE "rank" <= 8
"""

def _q_revenue_heavy_hitters(spark, sf_dir):
    """Measure-mode heavy hitters (operators/freq.heavy_hitters with a
    SUM measure): the 5 suppliers contributing the most discounted
    revenue per returnflag — 'top contributors by metric', the
    cost-attribution twin of the frequency form. Revenue decimal-cast
    per row before the sum so the aggregate is exact and
    order-independent (the established oracle-parity discipline)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.freq import heavy_hitters
    from ratatool_spark.sources.io import load_tables

    t = load_tables(spark, sf_dir, names=("lineitem",))
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(28,6)")
    # exact decimal ranking inside; double for the gated output (the
    # established cross-engine finishing convention)
    return heavy_hitters(
        t["lineitem"], ["l_returnflag"], "l_suppkey", k=5, measure=rev
    ).withColumn("total", F.col("total").cast("double"))

_SQL_REVENUE_HEAVY_HITTERS = """
SELECT l_returnflag, l_suppkey, total, "rank" FROM (
  SELECT l_returnflag, l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(28,6))) AS DOUBLE) AS total,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(28,6))) DESC,
                    l_suppkey NULLS FIRST) AS "rank"
  FROM lineitem GROUP BY l_returnflag, l_suppkey
) WHERE "rank" <= 5
"""

def _q_skew_report(spark, sf_dir):
    """Per-column skew diagnostic (operators/freq.skew_report): the 5
    hottest values of three lineitem columns with share and
    skew-vs-uniform ratio — the one-scan report that decides whether a
    join key needs salting (operators/skew.salted_join) before a 100 TB
    join. One melt scan; every window shares the single `column`
    partitioning of the aggregated value histogram."""
    from ratatool_spark.operators.freq import skew_report
    from ratatool_spark.sources.io import load_tables

    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, names=("lineitem",))
    out = skew_report(
        t["lineitem"], ["l_returnflag", "l_linestatus", "l_suppkey"], top_k=5
    )
    # entropy is a window-summed ln series -> ROUND(...,6) finishing
    return out.withColumn("entropy", F.round("entropy", 6))

_SQL_SKEW_REPORT = """
WITH melted AS (
  SELECT 'l_returnflag' AS "column", CAST(l_returnflag AS VARCHAR) AS value
  FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
), counts AS (
  SELECT "column", value, COUNT(*) AS cnt FROM melted GROUP BY 1, 2
), totals AS (
  -- grouped aggregate, not a window: mirrors the operator's scale-safe
  -- shape.  H = ln N - (1/N) * SUM(cnt * ln cnt)  (exact algebra)
  SELECT "column", SUM(cnt) AS n_total, COUNT(*) AS n_distinct,
         SUM(cnt * LN(CAST(cnt AS DOUBLE))) AS sum_clnc
  FROM counts GROUP BY 1
), ranked AS (
  SELECT "column", value, cnt,
         ROW_NUMBER() OVER (PARTITION BY "column"
                            ORDER BY cnt DESC, value NULLS FIRST) AS "rank"
  FROM counts
)
SELECT r."column", r.value, r.cnt,
       CAST(r.cnt AS DOUBLE) / t.n_total AS share,
       CAST(r.cnt AS DOUBLE) * t.n_distinct / t.n_total AS skew_ratio,
       r."rank", t.n_distinct,
       ROUND(LN(CAST(t.n_total AS DOUBLE)) - t.sum_clnc / t.n_total, 6)
         AS entropy
FROM ranked r JOIN totals t USING ("column") WHERE r."rank" <= 5
"""

def _q_profile_pii(spark, sf_dir):
    """Column-level PII scan (operators/profile.profile_pii): documents
    get a synthesized `contact` column cycling email / SSN / Luhn-varying
    card / clean by doc id; the profiler reports per-column,
    per-pattern match-bearing-row counts in ONE aggregation over one
    scan. The oracle rebuilds the same strings and replays every regex
    (and the Luhn fold) in DuckDB."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import profile_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ssn9 = F.lpad((F.col("doc_id") * 37 % 1000000000).cast("string"), 9, "0")
    card16 = F.lpad(
        ((F.col("doc_id") * 7919 + 11) % 10000000000000000).cast("string"),
        16,
        "0",
    )
    contact = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.substring(ssn9, 1, 3),
                F.lit("-"),
                F.substring(ssn9, 4, 2),
                F.lit("-"),
                F.substring(ssn9, 6, 4),
            ),
        )
        .when(F.col("doc_id") % 4 == 2, card16)
        .otherwise(F.lit("no contact on file"))
    )
    return profile_pii(
        docs.select("doc_id", "text", contact.alias("contact")),
        columns=["text", "contact"],
    )

_SQL_PROFILE_PII = r"""
WITH built AS (
  SELECT doc_id, text,
         CASE
           WHEN doc_id % 4 = 0 THEN 'u' || CAST(doc_id AS VARCHAR) || '@example.com'
           WHEN doc_id % 4 = 1 THEN
             substr(lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0'), 1, 3)
             || '-' ||
             substr(lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0'), 4, 2)
             || '-' ||
             substr(lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0'), 6, 4)
           WHEN doc_id % 4 = 2 THEN
             lpad(CAST((doc_id * 7919 + 11) % 10000000000000000 AS VARCHAR), 16, '0')
           ELSE 'no contact on file'
         END AS contact
  FROM documents
), pats AS (
  SELECT
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}' AS email,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b' AS ipv4,
    '\b\d{3}-\d{4}\b' AS phone,
    '\b\d{3}-\d{2}-\d{4}\b' AS ssn,
    '\b\d{4}-\d{4}-\d{4}-\d{4}\b|\b\d{16}\b' AS card
), counted AS (
  SELECT
    COUNT(*) AS n,
    COUNT(CASE WHEN regexp_matches(text, p.email) THEN 1 END) AS t_email,
    COUNT(CASE WHEN regexp_matches(text, p.ipv4) THEN 1 END) AS t_ipv4,
    COUNT(CASE WHEN regexp_matches(text, p.phone) THEN 1 END) AS t_phone,
    COUNT(CASE WHEN regexp_matches(text, p.ssn) THEN 1 END) AS t_ssn,
    COUNT(CASE WHEN regexp_matches(text, p.card) THEN 1 END) AS t_card,
    COUNT(CASE WHEN len(list_filter(
        regexp_extract_all(text, p.card),
        x -> len(replace(x, '-', '')) = 16 AND
             list_reduce(list_transform(range(1, 17), i ->
               CASE WHEN i % 2 = 0
                    THEN CASE WHEN CAST(reverse(replace(x, '-', ''))[i] AS INT) * 2 > 9
                              THEN CAST(reverse(replace(x, '-', ''))[i] AS INT) * 2 - 9
                              ELSE CAST(reverse(replace(x, '-', ''))[i] AS INT) * 2 END
                    ELSE CAST(reverse(replace(x, '-', ''))[i] AS INT) END),
               (a, b) -> a + b) % 10 = 0
      )) > 0 THEN 1 END) AS t_luhn,
    COUNT(CASE WHEN regexp_matches(contact, p.email) THEN 1 END) AS c_email,
    COUNT(CASE WHEN regexp_matches(contact, p.ipv4) THEN 1 END) AS c_ipv4,
    COUNT(CASE WHEN regexp_matches(contact, p.phone) THEN 1 END) AS c_phone,
    COUNT(CASE WHEN regexp_matches(contact, p.ssn) THEN 1 END) AS c_ssn,
    COUNT(CASE WHEN regexp_matches(contact, p.card) THEN 1 END) AS c_card,
    COUNT(CASE WHEN len(list_filter(
        regexp_extract_all(contact, p.card),
        x -> len(replace(x, '-', '')) = 16 AND
             list_reduce(list_transform(range(1, 17), i ->
               CASE WHEN i % 2 = 0
                    THEN CASE WHEN CAST(reverse(replace(x, '-', ''))[i] AS INT) * 2 > 9
                              THEN CAST(reverse(replace(x, '-', ''))[i] AS INT) * 2 - 9
                              ELSE CAST(reverse(replace(x, '-', ''))[i] AS INT) * 2 END
                    ELSE CAST(reverse(replace(x, '-', ''))[i] AS INT) END),
               (a, b) -> a + b) % 10 = 0
      )) > 0 THEN 1 END) AS c_luhn
  FROM built, pats p
)
SELECT 'text' AS column, n AS n_scanned, t_email AS n_email, t_ipv4 AS n_ipv4,
       t_phone AS n_phone, t_ssn AS n_ssn, t_card AS n_card_shaped,
       t_luhn AS n_card_luhn
FROM counted
UNION ALL
SELECT 'contact', n, c_email, c_ipv4, c_phone, c_ssn, c_card, c_luhn
FROM counted
"""

def _q_interval_join_outer(spark, sf_dir):
    """Left-outer branch of the stream-stream interval join: clicks with
    NO view in the preceding 2 hours surface with NULL right columns —
    gates the outer-path key coalescing (the l/r key merge that r4's
    review pinned) against a plain SQL LEFT JOIN."""
    from pyspark.sql import functions as F

    from ratatool_spark.streaming.events import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = interval_join(
        clicks, views, key="user_id", lag="2 hours", watermark="1 hour",
        how="left_outer",
    )
    return out.select(
        "user_id",
        F.col("l_ts"),
        F.col("r_ts"),
        F.col("l_event_id"),
        F.col("r_event_id"),
    )

_SQL_INTERVAL_JOIN_OUTER = """
SELECT l.user_id, l.ts AS l_ts, r.ts AS r_ts,
       l.event_id AS l_event_id, r.event_id AS r_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 2 HOUR AND r.ts <= l.ts
"""

def _q_cap_per_source(spark, sf_dir):
    """Per-domain document cap (operators/corpus.cap_per_group): at most
    10 docs per source, kept by smallest portable hash — a uniform,
    engine-re-derivable subsample of each over-cap group. The rn<=k
    filter compiles to WindowGroupLimit (per-map-task heap)."""
    from ratatool_spark.operators.corpus import cap_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cap_per_group(docs, group_col="source", max_rows=10, seed=3)
    return out.select("doc_id", "source", "lang")

_SQL_CAP_PER_SOURCE = """
WITH h AS (
  SELECT doc_id, source, lang,
         ('0x' || substr(md5(concat_ws(chr(1), '3', CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT AS hh
  FROM documents
)
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh) AS rn
  FROM h
) WHERE rn <= 10
"""

def _q_rollup_incremental(spark, sf_dir):
    """Incremental continuous-aggregate maintenance (operators/timeagg
    build_rollup_partial + rollup_from_partials): two event slices each
    build a persistable hour-grain partial; the merge + ladder serves
    hour AND day grains without re-scanning either batch. The oracle is
    the DIRECT rollup over all events — equality is exact (decimal sums,
    idempotent min/max), so the hash gate pins the merge algebra."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import (
        build_rollup_partial,
        rollup_from_partials,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    a = build_rollup_partial(ev.where(F.col("event_id") % 2 == 0), grain="hour")
    b = build_rollup_partial(ev.where(F.col("event_id") % 2 == 1), grain="hour")
    out = rollup_from_partials([a, b], grains=("hour", "day"))
    return out.select(
        "grain",
        "bucket",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )

def _q_split_grouped(spark, sf_dir):
    """Leakage-free grouped splits: assign_splits diced on SOURCE instead
    of doc id, so every document of one source lands in the same split —
    the contamination guard for URL-domain / near-duplicate groups
    (leakage between train and eval happens through groups, not rows).
    Output is the per-(source, split) contingency — the oracle recomputes
    the dice per source, and any source spanning two splits would change
    the row count itself."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import assign_splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = assign_splits(
        docs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        dice_cols=("source",),
        seed=5,
    )
    return out.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n_docs"))

def _sql_split_grouped() -> str:
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    items = list(weights.items())
    acc, whens = 0.0, []
    d = _dice_sql(["source"], seed=5)
    for name, w in items[:-1]:
        acc += w / total
        whens.append(f"WHEN {d} < {acc!r} THEN '{name}'")
    return f"""
SELECT source,
       CASE {' '.join(whens)} ELSE '{items[-1][0]}' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""

def _q_tfidf_cosine(spark, sf_dir):
    """Sparse TF-IDF cosine near-dup pairs (operators/dedup
    tfidf_cosine_pairs): inverted-index equi-join on terms, idf-weighted
    so ubiquitous words drop out — threshold 0.9 (nearest sub-threshold
    pair sits at 0.8996, so the fp boundary is safe cross-engine)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tfidf_cosine_pairs(docs, threshold=0.9)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))

_SQL_TFIDF_COSINE = """
WITH toks AS (
  SELECT doc_id, t.tok AS tok
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ls FROM documents),
       UNNEST(ls) AS t(tok)
  WHERE LENGTH(t.tok) > 0
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok HAVING COUNT(*) <= 1000
), n AS (SELECT COUNT(*) AS n FROM documents),
w AS (
  SELECT tf.doc_id, tf.tok, tf.tf * LN(n.n / dfreq.df) AS w
  FROM tf JOIN dfreq USING (tok), n
), norm AS (
  SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
), wn AS (
  SELECT w.doc_id, w.tok, w.w / norm.nrm AS w
  FROM w JOIN norm USING (doc_id) WHERE norm.nrm > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(SUM(a.w * b.w), 6) AS cosine
FROM wn a JOIN wn b ON a.tok = b.tok AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING SUM(a.w * b.w) >= 0.9
"""

def _q_multimodal_decode_png(spark, sf_dir):
    """PNG decode path (r5: stdlib zlib codec — IHDR/IDAT/IEND chunks,
    CRC verification, all five scanline filters): a three-format media
    mix (BMP / WAV / PNG by id%3) synthesized distributed, then
    decode_real parses each real container. The PNG encoder cycles
    filters 0-4 per row, so a wrong Sub/Up/Average/Paeth reconstruction
    changes the recovered pixels and hash-mismatches the oracle's pure
    string-math payload."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    return decode_real(
        make_test_media(spark, n=48, seed=7, formats=("bmp", "wav", "png"))
    )

_SQL_MULTIMODAL_DECODE_PNG = """
WITH base AS (
  SELECT range AS media_id,
    md5(concat('7:', range)) AS d,
    CASE WHEN range % 3 = 1 THEN 'audio' ELSE 'image' END AS kind,
    CASE WHEN range % 3 <> 1 THEN CAST(3 + range % 8 AS INT) END AS width,
    CASE WHEN range % 3 <> 1 THEN CAST(2 + range % 5 AS INT) END AS height,
    CASE WHEN range % 3 = 1 THEN CAST(8000 + (range % 4) * 4000 AS INT) END AS sample_rate,
    CASE WHEN range % 3 = 1 THEN CAST(64 + range % 33 AS INT) END AS n_samples
  FROM range(48)
)
SELECT media_id, kind, width, height, sample_rate, n_samples,
  md5(substr(repeat(d, 80),
             1,
             CASE WHEN kind = 'image' THEN 6 * width * height
                  ELSE 4 * n_samples END)) AS payload_md5
FROM base
"""

def _q_dedup_spans(spark, sf_dir):
    """Exact duplicated-span removal (operators/corpus
    remove_duplicate_spans; Lee et al. ACL'22 restated as a distributed
    n-gram join): every word TRIGRAM occurring more than 3 times across
    the corpus marks its 3 positions for removal, overlapping grams
    merge into maximal spans via the position-range window, docs
    reassemble from surviving tokens. The oracle replays gram
    construction, the violator count, the EXISTS-in-range removal mask,
    and ordered reassembly — including the NULL-text preservation and
    all-occurrences-removed semantics."""
    from ratatool_spark.operators.corpus import remove_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_duplicate_spans(
        docs, text_col="text", id_col="doc_id", span_tokens=3,
        max_occurrences=3,
    )
    return out.select("doc_id", "text", "n_tokens_removed")

_SQL_DEDUP_SPANS = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '),
                     x -> LENGTH(x) > 0) AS ls
  FROM documents
), toks AS (
  SELECT doc_id, i - 1 AS pos, ls[i] AS tok
  FROM base, UNNEST(range(1, len(ls) + 1)) AS t(i)
), grams AS (
  SELECT doc_id, i - 1 AS gpos,
         ls[i] || ' ' || ls[i + 1] || ' ' || ls[i + 2] AS g
  FROM base, UNNEST(range(1, len(ls) - 1)) AS t(i)
), viol AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 3
), starts AS (
  SELECT DISTINCT gr.doc_id, gr.gpos FROM grams gr JOIN viol USING (g)
), marked AS (
  SELECT t.doc_id, t.pos, t.tok,
         EXISTS (SELECT 1 FROM starts s
                 WHERE s.doc_id = t.doc_id
                   AND s.gpos BETWEEN t.pos - 2 AND t.pos) AS removed
  FROM toks t
), kept AS (
  SELECT doc_id,
         COALESCE(STRING_AGG(tok, ' ' ORDER BY pos)
                  FILTER (WHERE NOT removed), '') AS text,
         COUNT(*) FILTER (WHERE removed) AS n_tokens_removed
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE COALESCE(k.text, '') END AS text,
       COALESCE(k.n_tokens_removed, 0) AS n_tokens_removed
FROM documents d LEFT JOIN kept k USING (doc_id)
"""
