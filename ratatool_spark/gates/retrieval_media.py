"""Retrieval (BM25/RRF/RBO), ANN (PQ/IVF-PQ), SemDeDup, media-codec gates.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


from ratatool_spark.gates._common import _dice_sql
from ratatool_spark.gates.asof_pairs import _COS_AB_SQL
from ratatool_spark.gates.classify_sketch import (
    _SQL_QUALITY_CLASSIFIER,
    _q_quality_classifier,
)
from ratatool_spark.gates.curation import _SQL_UNIGRAM_LOGPROB
from ratatool_spark.gates.pipeline import _COS_SQL, _PH64_SQL


def _q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/similarity train_pq_codebooks
    / pq_encode / pq_topk; Jégou et al. TPAMI'11): the corpus compresses
    to 8 codes per vector (16-centroid codebooks over 8-dim subspaces,
    seed-sampled — the oracle-replayable train_iters=0 mode), queries
    rank candidates by ASYMMETRIC distance (exact query slice vs the
    row's quantized centroid, left-fold squared L2 with explicit
    multiply). The oracle rebuilds the codebooks from the hash-ordered
    sample, replays per-subspace argmin encoding, and pins ADC ranking
    with an ORDER-PINNED ordered-list fold (matching Spark's
    left-associated term chain) — distances compare unrounded, display
    rounds at 6."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, k=16, seed=13, train_iters=0)
    codes = pq_encode(emb, books)
    q = emb.where(F.col("vec_id") < 5)
    out = pq_topk(codes, q, books, k=3)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("adc_dist", 6).alias("adc_dist"),
        "rank",
    )

def _sql_pq_topk(m: int = 8, kc: int = 16, topk: int = 3, dim: int = 64) -> str:
    sub = dim // m
    h = (
        "(('0x' || substr(md5(concat_ws(chr(1), '13', "
        "CAST(vec_id AS VARCHAR))), 1, 15))::BIGINT)"
    )

    def subdist(a: str, b: str, j: str) -> str:
        # Σ_t (a[j*sub+t] − b[j*sub+t])² with explicit multiply, left
        # fold — the _sq_l2 twin over one sub-dim subspace
        d = (
            f"(CAST({a}[{j} * {sub} + t] AS DOUBLE) - "
            f"CAST({b}[{j} * {sub} + t] AS DOUBLE))"
        )
        return (
            f"list_reduce(list_transform(range(1, {sub + 1}), t -> {d} * {d}), "
            "(x, y) -> x + y)"
        )

    return f"""
WITH cents AS (
  SELECT rn - 1 AS c, embedding FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY {h}) AS rn, embedding FROM embeddings
  ) WHERE rn <= {kc}
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT v.vec_id, s.sub, ct.c AS code,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, s.sub
             ORDER BY {subdist('v.embedding', 'ct.embedding', 's.sub')}, ct.c
           ) AS rn
    FROM embeddings v, range({m}) s(sub), cents ct
  ) WHERE rn = 1
),
terms AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.sub,
         {subdist('q.embedding', 'ct.embedding', 'e.sub')} AS term
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
  CROSS JOIN enc e
  JOIN cents ct ON ct.c = e.code
  WHERE q.vec_id <> e.vec_id
),
adc AS (
  -- ORDER-PINNED fold: Spark chains the m terms left-associated, so the
  -- oracle folds the sub-ordered list the same way (plain SUM would
  -- re-associate and drift in the low bits)
  SELECT query_id, neighbor_id,
         list_reduce(list(term ORDER BY sub), (x, y) -> x + y) AS adc_dist
  FROM terms GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, neighbor_id, ROUND(adc_dist, 6) AS adc_dist, rank
FROM ranked WHERE rank <= {topk}
"""

def _q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composition (operators/similarity.ivfpq_topk; FAISS
    IndexIVFPQ shape): the IVF tier bounds WHICH candidates each query
    scores (3 of 8 probed cells), the PQ tier bounds WHAT a candidate
    costs (8 codes, not 64 floats); ranking is asymmetric distance over
    probed candidates only. Seed mode end-to-end: both centroid sets
    come from the same hash-ordered sample (first 8 rows = IVF cells,
    first 16 = PQ codebooks), so the oracle replays cell assignment,
    probe, encode, candidate join, and the order-pinned ADC fold."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = ivfpq_topk(
        emb, q, k=3, n_centroids=8, n_probe=3, m=8, pq_k=16, seed=13
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("adc_dist", 6).alias("adc_dist"),
        "rank",
    )

def _sql_ivfpq_topk() -> str:
    h = (
        "(('0x' || substr(md5(concat_ws(chr(1), '13', "
        "CAST(vec_id AS VARCHAR))), 1, 15))::BIGINT)"
    )
    cos_vc = _COS_AB_SQL.replace("a.embedding", "v.embedding").replace(
        "b.embedding", "ct.embedding"
    )

    def subdist(a: str, b: str, j: str) -> str:
        d = (
            f"(CAST({a}[{j} * 8 + t] AS DOUBLE) - "
            f"CAST({b}[{j} * 8 + t] AS DOUBLE))"
        )
        return (
            f"list_reduce(list_transform(range(1, 9), t -> {d} * {d}), "
            "(x, y) -> x + y)"
        )

    return f"""
WITH ord AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {h}) AS rn, embedding FROM embeddings
),
icents AS (SELECT rn - 1 AS cell, embedding FROM ord WHERE rn <= 8),
pcents AS (SELECT rn - 1 AS c, embedding FROM ord WHERE rn <= 16),
corpus_assign AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT v.vec_id, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell) AS arn
    FROM embeddings v CROSS JOIN icents ct
  ) WHERE arn = 1
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT v.vec_id, s.sub, ct.c AS code,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, s.sub
             ORDER BY {subdist('v.embedding', 'ct.embedding', 's.sub')}, ct.c
           ) AS rn
    FROM embeddings v, range(8) s(sub), pcents ct
  ) WHERE rn = 1
),
query_assign AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT v.vec_id, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell) AS arn
    FROM embeddings v CROSS JOIN icents ct WHERE v.vec_id < 5
  ) WHERE arn <= 3
),
cand AS (
  SELECT DISTINCT q.query_id, c.neighbor_id
  FROM query_assign q JOIN corpus_assign c USING (cell)
  WHERE q.query_id <> c.neighbor_id
),
terms AS (
  SELECT cd.query_id, cd.neighbor_id, e.sub,
         {subdist('q.embedding', 'ct.embedding', 'e.sub')} AS term
  FROM cand cd
  JOIN embeddings q ON q.vec_id = cd.query_id
  JOIN enc e ON e.vec_id = cd.neighbor_id
  JOIN pcents ct ON ct.c = e.code
),
adc AS (
  SELECT query_id, neighbor_id,
         list_reduce(list(term ORDER BY sub), (x, y) -> x + y) AS adc_dist
  FROM terms GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, neighbor_id, ROUND(adc_dist, 6) AS adc_dist, rank
FROM ranked WHERE rank <= 3
"""

def _q_audio_fp_pairs(spark, sf_dir):
    """Audio near-dup dedup (operators/multimodal audio_fingerprint /
    audio_near_dup_pairs): 40 real WAV clips in 20 near-duplicate pairs
    (odd twins carry a one-byte PCM bump), REALLY encoded and re-parsed
    on the Spark side, then 60-bit energy-difference fingerprints
    (integer segment energies over the int16 stream, adjacent
    comparisons — the image-dHash analogue for audio) matched through
    the Manku blocked self-join at Hamming <= 6. The oracle rebuilds the
    exact PCM samples from the md5-digest payload with string math
    (int16 little-endian reassembly included), replays the identical
    integer segmentation + energy + comparison arithmetic, and verifies
    pairs all-pairs."""
    from ratatool_spark.operators.multimodal import (
        audio_near_dup_pairs,
        make_near_dup_media,
    )

    media = make_near_dup_media(spark, n_groups=20, seed=42, fmt="wav")
    return audio_near_dup_pairs(media, max_hamming=6)

_SQL_AUDIO_FP_PAIRS = """
WITH auds AS (
  SELECT t.mid AS mid, t.mid % 2 AS twin,
         64 + (t.mid // 2) % 33 AS n,
         md5('42:' || CAST(t.mid // 2 AS VARCHAR)) AS dg
  FROM range(40) t(mid)
), samples AS (
  -- sample j = int16 LE at payload bytes (2j, 2j+1); payload byte k =
  -- hex pair (k % 16) of the group digest; odd twin's byte 0 bumped +8
  SELECT mid, ((61 * jj) // n) AS seg,
         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
  FROM (
    SELECT a.mid, a.n, j.j AS jj,
           (CASE WHEN a.twin = 1 AND j.j = 0
                 THEN (('0x' || substr(a.dg, 2*((2*j.j) % 16) + 1, 2))::INT
                       + 8) % 256
                 ELSE ('0x' || substr(a.dg, 2*((2*j.j) % 16) + 1, 2))::INT
            END
            + 256 * ('0x' || substr(a.dg, 2*((2*j.j + 1) % 16) + 1, 2))::INT)
             AS v
    FROM auds a, UNNEST(range(0, a.n)) AS j(j)
  )
), energies AS (
  SELECT mid, seg, CAST(SUM(ABS(s)) AS BIGINT) AS e
  FROM samples GROUP BY 1, 2
), bits AS (
  SELECT mid, seg,
         CASE WHEN LEAD(e) OVER (PARTITION BY mid ORDER BY seg) > e
              THEN CAST(1 AS BIGINT) << seg ELSE 0 END AS bit
  FROM energies
), fps AS (
  SELECT mid, CAST(SUM(bit) AS BIGINT) AS fp FROM bits GROUP BY mid
)
SELECT a.mid AS id_a, b.mid AS id_b,
       bit_count(xor(a.fp, b.fp)) AS hamming
FROM fps a JOIN fps b ON a.mid < b.mid
WHERE bit_count(xor(a.fp, b.fp)) <= 6
"""

def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup (operators/dedup.semantic_dedup; Abbas et al. 2023):
    embeddings cluster to 8 seed centroids (oracle-replayable
    train_iters=0 mode), near-dup candidates enumerate within cells
    only, and each vector is kept unless a (centroid_cos, id)-lower
    near-dup at cosine >= 0.4 exists in its cell — keeping the
    duplicate farthest from its centroid. The oracle replays centroid
    sampling, argmax assignment, the within-cell pair predicate, and the
    keep rule; cosines compare UNROUNDED (bit-exact expression twins)
    and finish at ROUND(...,6) for display."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, tau=0.4, n_centroids=8)
    return out.select(
        "vec_id",
        "cell",
        F.round("centroid_cos", 6).alias("centroid_cos"),
        "kept",
    )

_SEED_H_SQL = (
    "(('0x' || substr(md5(concat_ws(chr(1), '13', "
    "CAST(vec_id AS VARCHAR))), 1, 15))::BIGINT)"
)


def _sql_cos_vc() -> str:
    """Vector-vs-centroid expression cosine (the hash_cols seed=13 twin
    family's shared projection)."""
    return _COS_AB_SQL.replace("a.embedding", "v.embedding").replace(
        "b.embedding", "ct.embedding"
    )


def _sql_kmeans_train_ctes() -> str:
    """cents0 (seed sample, hash_cols seed=13 twin) -> ONE fixed-point
    Lloyd iteration -> cents1: the training CTE chain shared by the
    kmeans gate and the trained SemDeDup gate (assignment during
    training uses ivf_assign_cells' tie-break: cell DESC)."""
    cos_vc = _sql_cos_vc()
    return f"""
WITH cents0 AS (
  SELECT rn - 1 AS cell, embedding FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY {_SEED_H_SQL}) AS rn, embedding FROM embeddings
  ) WHERE rn <= 8
),
assign0 AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell DESC) AS arn
    FROM embeddings v CROSS JOIN cents0 ct
  ) WHERE arn = 1
),
expl AS (
  SELECT cell, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM assign0, UNNEST(range(1, 65)) AS r(i)
),
sums AS (
  SELECT cell, pos,
         CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
         COUNT(*) AS n
  FROM expl GROUP BY cell, pos
),
cents1 AS (
  SELECT c0.cell,
         COALESCE(m.vec,
                  list_transform(c0.embedding, e -> CAST(e AS DOUBLE)))
           AS embedding
  FROM cents0 c0 LEFT JOIN (
    SELECT cell,
           list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                ORDER BY pos) AS vec
    FROM sums GROUP BY cell
  ) m USING (cell)
),"""


def _sql_semdedup_tail(cents: str) -> str:
    """assign (semantic_dedup tie-break: cell ASC) -> within-cell keep
    rule at tau=0.4 -> kept flags; shared by both SemDeDup gates."""
    cos_vc = _sql_cos_vc()
    cos_ab = _COS_AB_SQL.replace("a.embedding", "a.v").replace(
        "b.embedding", "b.v"
    )
    return f"""assign AS (
  SELECT vec_id, v, centroid_cos, cell FROM (
    SELECT v.vec_id, v.embedding AS v, {cos_vc} AS centroid_cos, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell) AS arn
    FROM embeddings v CROSS JOIN {cents} ct
  ) WHERE arn = 1
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM assign a JOIN assign b ON a.cell = b.cell
   AND (b.centroid_cos < a.centroid_cos
        OR (b.centroid_cos = a.centroid_cos AND b.vec_id < a.vec_id))
  WHERE {cos_ab} >= 0.4
)
SELECT a.vec_id, a.cell, ROUND(a.centroid_cos, 6) AS centroid_cos,
       (d.vec_id IS NULL) AS kept
FROM assign a LEFT JOIN dropped d USING (vec_id)
"""


def _q_ann_sq8_topk(spark, sf_dir):
    """SQ8 flat-index ANN (similarity.sq8_topk): the corpus is scanned as
    symmetric-int8 codes + one scale/row (4× smaller at rest than
    float32 — the FAISS SQ8 strategy), queries stay full-precision and
    broadcast, cosine scores against the dequantized codes. The oracle
    replays the quantize (floor(x/scale + 0.5) — engine-portable
    rounding), the dequant, and the expression cosine exactly."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = sq8_topk(emb, q, k=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def _sql_ann_sq8_topk() -> str:
    cos_q_cv = _COS_SQL.replace("CAST(c.embedding[i] AS DOUBLE)", "c.cv[i]")
    return f"""
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
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT) * scale)
           AS cv
  FROM sc
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos_q_cv} AS cosine
  FROM embeddings q, dq c
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


def _sql_semantic_dedup() -> str:
    return f"""
WITH cents AS (
  SELECT rn - 1 AS cell, embedding FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY {_SEED_H_SQL}) AS rn, embedding FROM embeddings
  ) WHERE rn <= 8
),
""" + _sql_semdedup_tail("cents")

def _q_semantic_dedup_trained(spark, sf_dir):
    """SemDeDup over TRAINED centroids (r6 verdict #3): one bit-
    reproducible Lloyd's iteration (similarity.train_centroids_exact —
    fixed-point update, engine-replayable) feeds dedup.semantic_dedup
    through its bring-your-own-centroids seam. The oracle replays the
    whole composition: seed sample → ivf-tie assignment (cell DESC) →
    fixed-point centroid update → semantic-tie assignment (cell ASC) →
    within-cell keep rule at tau=0.4."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import semantic_dedup
    from ratatool_spark.operators.similarity import train_centroids_exact

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_centroids_exact(emb, n_centroids=8, iters=1, seed=13)
    out = semantic_dedup(emb, tau=0.4, n_centroids=8, centroids=cents)
    return out.select(
        "vec_id",
        "cell",
        F.round("centroid_cos", 6).alias("centroid_cos"),
        "kept",
    )

def _sql_semantic_dedup_trained() -> str:
    # training replays the shared fixed-point chain (ivf tie-break: cell
    # DESC); the dedup assignment then uses semantic_dedup's tie-break
    # (cell ASC) via the shared tail
    return _sql_kmeans_train_ctes() + "\n" + _sql_semdedup_tail("cents1")

def _q_stream_decontaminate(spark, sf_dir):
    """Streaming decontamination against a persisted minhash index
    (streaming/decontaminate.stream_decontaminate), run for REAL: the
    benchmark corpus (every 17th doc, re-keyed, first 30 words) is
    signature-indexed offline, then every document arrives as a file
    stream (availableNow) and each micro-batch is LSH-probed against the
    frozen artifact and flagged — ingest-time train/serve hygiene. The
    oracle is the BATCH flag computation over the same corpora: stream
    == batch is the gated invariant."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import build_minhash_index
    from ratatool_spark.streaming.decontaminate import stream_decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim("text"), " "), 1, 30)
        ).alias("text"),
    )
    root = scratch_dir(prefix="rt_sdecon_")
    idx = os.path.join(root, "idx")
    build_minhash_index(bench, idx, num_hashes=16, bands=4)
    in_dir = os.path.join(root, "incoming")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    out_path = os.path.join(root, "flagged")
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_decontaminate(
            stream,
            idx,
            out_path,
            checkpoint=os.path.join(root, "ckpt"),
            min_est_jaccard=0.5,
        )
        q.awaitTermination()
    back = spark.read.parquet(out_path)
    return back.select("doc_id", "contaminated")


def _sql_stream_decontaminate() -> str:
    from ratatool_spark.gates.pipeline import _sql_cross_lsh

    return f"""
WITH flagged AS (
  SELECT DISTINCT left_id AS doc_id
  FROM ({_sql_cross_lsh(17, 100000, 30)}) c
  WHERE est_jaccard >= 0.5
)
SELECT d.doc_id, (f.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN flagged f USING (doc_id)
"""


def _q_stream_quality_scores(spark, sf_dir):
    """Streaming classifier inference (streaming/classify
    .stream_quality_scores) run for REAL: the quality model trains on
    the static corpus (en = positive, rest = negative — the
    quality_classifier_en setup), then every document arrives as a file
    stream (availableNow) and is scored per micro-batch with the batch
    operator unchanged — train-offline / apply-online, idempotent
    batch_id sink. The oracle is the BATCH scoring SQL: stream == batch
    is the gated invariant."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        train_quality_weights,
    )
    from ratatool_spark.streaming.classify import stream_quality_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pos = build_hashed_ngram_freqs(
        docs.where(F.col("lang") == "en"), n=2, n_buckets=512
    )
    neg = build_hashed_ngram_freqs(
        docs.where(F.col("lang") != "en"), n=2, n_buckets=512
    )
    w = train_quality_weights(pos, neg, n_buckets=512)
    root = scratch_dir(prefix="rt_squal_")
    in_dir = os.path.join(root, "incoming")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    out_path = os.path.join(root, "scored")
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_quality_scores(
            stream,
            w,
            out_path,
            checkpoint=os.path.join(root, "ckpt"),
            n_buckets=512,
            n=2,
        )
        q.awaitTermination()
    back = spark.read.parquet(out_path)
    return back.select(
        "doc_id",
        "n_features",
        F.round("logit", 6).alias("logit"),
        F.round("prob", 6).alias("prob"),
    )

def _q_nb_lang_classify(spark, sf_dir):
    """Trained multi-class language classifier (operators/corpus
    train_nb_class_weights + nb_classify; Cavnar-Trenkle textcat
    modernized to hashed word features): the documents table trains a
    5-class NB model from its own lang labels (two aggregate passes),
    then every doc is scored per class (ln prior + sum of per-feature
    ln p_class) and argmax-classified with a deterministic label
    tie-break. Training AND inference replay exactly in the oracle;
    scores finish at ROUND(...,6)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import (
        nb_classify,
        train_nb_class_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w, pri = train_nb_class_weights(docs, "lang", n=1, n_buckets=256)
    out = nb_classify(docs, w, pri, 256, n=1)
    return out.select(
        "doc_id",
        "pred_label",
        F.round("score", 6).alias("score"),
        "n_features",
    )

_SQL_NB_LANG_CLASSIFY = """
WITH toks AS (
  SELECT doc_id, t.tok AS tok
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ls FROM documents),
       UNNEST(ls) AS t(tok)
  WHERE LENGTH(t.tok) > 0
), feats AS (
  SELECT doc_id,
         (('0x' || substr(md5(concat_ws(chr(1), '0', tok)), 1, 15))::BIGINT)
           % 256 AS b
  FROM toks
), cnts AS (
  SELECT d.lang, f.b, COUNT(*) AS cnt
  FROM feats f JOIN documents d USING (doc_id) GROUP BY 1, 2
), tots AS (
  SELECT lang, SUM(cnt) AS tot FROM cnts GROUP BY 1
), langs AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1
), total AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT f.doc_id, l.lang, COUNT(*) AS n_features,
         SUM(LN((COALESCE(c.cnt, 0) + 0.5) / (t.tot + 0.5 * 256))) AS ll
  FROM feats f
  CROSS JOIN langs l
  JOIN tots t ON t.lang = l.lang
  LEFT JOIN cnts c ON c.lang = l.lang AND c.b = f.b
  GROUP BY 1, 2
), with_prior AS (
  SELECT d.doc_id, l.lang,
         LN(CAST(l.n_docs AS DOUBLE) / total.n) + COALESCE(s.ll, 0)
           AS score,
         COALESCE(s.n_features, 0) AS n_features
  FROM documents d CROSS JOIN langs l CROSS JOIN total
  LEFT JOIN scored s ON s.doc_id = d.doc_id AND s.lang = l.lang
)
SELECT doc_id, lang AS pred_label, ROUND(score, 6) AS score, n_features
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, lang
  ) AS rn FROM with_prior
) WHERE rn = 1
"""

def _q_image_dhash_pairs(spark, sf_dir):
    """Perceptual image dedup (operators/multimodal image_dhash /
    image_near_dup_pairs + operators/dedup.fingerprint_pairs): 40 real
    BMP images in 20 near-duplicate pairs (odd twins carry a one-byte
    payload bump), REALLY encoded and re-decoded on the Spark side, then
    60-bit dHash fingerprints (integer nearest-neighbor luma grid,
    adjacent comparisons) matched through the Manku blocked self-join at
    Hamming <= 6. The oracle rebuilds the exact pixels from the
    md5-digest payload with pure string math, replays the identical
    integer dHash arithmetic, and verifies pairs all-pairs (40 rows) —
    wrong stride, row un-flip, luma rule, or block layout all
    hash-mismatch."""
    from ratatool_spark.operators.multimodal import (
        image_near_dup_pairs,
        make_near_dup_media,
    )

    media = make_near_dup_media(spark, n_groups=20, seed=42)
    return image_near_dup_pairs(media, max_hamming=6)

_SQL_IMAGE_DHASH_PAIRS = """
WITH imgs AS (
  SELECT t.mid AS mid, t.mid % 2 AS twin,
         4 + (t.mid // 2) % 7 AS w, 3 + (t.mid // 2) % 4 AS h,
         md5('42:' || CAST(t.mid // 2 AS VARCHAR)) AS dg
  FROM range(40) t(mid)
), cells AS (
  -- integer nearest-neighbor sample of a 7x10 luma grid (dhash_bits)
  SELECT i.mid, i.twin, i.dg, c1.cy AS cy, c2.cx AS cx,
         3 * ((((2 * c1.cy + 1) * i.h) // 20) * i.w
              + (((2 * c2.cx + 1) * i.w) // 14)) AS j
  FROM imgs i, range(10) c1(cy), range(7) c2(cx)
), lum AS (
  -- payload byte k = hex pair (k % 16) of the group digest; the odd
  -- twin's byte 0 is bumped +8 mod 256 (make_near_dup_media)
  SELECT mid, cy, cx,
         (299 * (CASE WHEN twin = 1 AND j = 0
                      THEN (('0x' || substr(dg, 2*(j % 16) + 1, 2))::INT + 8) % 256
                      ELSE ('0x' || substr(dg, 2*(j % 16) + 1, 2))::INT END)
          + 587 * ('0x' || substr(dg, 2*((j+1) % 16) + 1, 2))::INT
          + 114 * ('0x' || substr(dg, 2*((j+2) % 16) + 1, 2))::INT) // 1000
           AS luma
  FROM cells
), bits AS (
  SELECT mid, cy, cx,
         CASE WHEN LEAD(luma) OVER (PARTITION BY mid, cy ORDER BY cx) > luma
              THEN CAST(1 AS BIGINT) << (cy * 6 + cx) ELSE 0 END AS bit
  FROM lum
), fps AS (
  SELECT mid, CAST(SUM(bit) AS BIGINT) AS fp FROM bits GROUP BY mid
)
SELECT a.mid AS id_a, b.mid AS id_b,
       bit_count(xor(a.fp, b.fp)) AS hamming
FROM fps a JOIN fps b ON a.mid < b.mid
WHERE bit_count(xor(a.fp, b.fp)) <= 6
"""

_NGRAMS3_SQL = (
    "list_transform(range(1, greatest(len({w}) - 2, 1) + 1), "
    "i -> concat_ws(' ', {w}[i], {w}[i+1], {w}[i+2]))"
).format(w="string_split(trim(text), ' ')")

def _q_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (operators/retrieval.bm25_topk): Lucene-form
    idf, fixed-point micro-unit score sums (order-independent), postings
    never shuffled on term — the enriched query-term table (idf
    precomputed) is broadcast into them. Queries = the first 6 tokens of
    docs 0-4 (self-retrieval shape)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.retrieval import _terms, bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(_terms(F.col("text")), 1, 6)).alias("qtext"),
    )
    return bm25_topk(docs, q, k=5)

# Shared BM25 CTE chain (tokenize -> postings -> df/stats -> query terms
# -> fixed-point scores -> ranks); reused by the hybrid-fusion twin.
_BM25_CTES = """base AS (
  SELECT doc_id,
         list_filter(string_split(trim(lower(text)), ' '),
                     t -> len(t) > 0) AS ls
  FROM documents
), dl AS (
  SELECT doc_id, len(ls) AS dl, ls FROM base WHERE len(ls) >= 1
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(ls) AS term FROM dl)
  GROUP BY doc_id, dl, term
), dfreq AS (
  SELECT term, count(*) AS dfreq FROM tf GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl
), q AS (
  SELECT doc_id AS query_id,
         (list_filter(string_split(trim(lower(text)), ' '),
                      t -> len(t) > 0))[1:6] AS qls
  FROM documents WHERE doc_id < 5
), qtf AS (
  SELECT query_id, term, count(*) AS qtf
  FROM (SELECT query_id, unnest(qls) AS term FROM q)
  GROUP BY query_id, term
), scored AS (
  SELECT qtf.query_id, tf.doc_id,
         SUM(CAST(ROUND(
           ln((stats.n_docs - dfreq.dfreq + 0.5::DOUBLE)
              / (dfreq.dfreq + 0.5::DOUBLE) + 1.0::DOUBLE)
           * (tf.tf * (1.2::DOUBLE + 1.0::DOUBLE))
           / (tf.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
              + 0.75::DOUBLE * tf.dl * stats.n_docs / stats.total_dl))
           * qtf.qtf * 1000000.0::DOUBLE, 0) AS BIGINT)) AS score_fx
  FROM tf
  JOIN dfreq USING (term)
  JOIN qtf USING (term)
  CROSS JOIN stats
  GROUP BY qtf.query_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id,
         CAST(score_fx AS DOUBLE) / 1000000.0::DOUBLE AS score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_fx DESC, doc_id) AS rank
  FROM scored
)"""

def _sql_bm25_topk() -> str:
    return (
        "WITH " + _BM25_CTES
        + "\nSELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5"
    )

def _q_rbo_overlap(spark, sf_dir):
    """Rank-biased overlap (retrieval.rbo_overlap, Webber et al.):
    per-query RBO@5 between the BM25 lexical top-5 and the fused hybrid
    top-5 — each joined id contributes its closed-form tail
    (1-p)·Σ_{i=max(ra,rb)}^{d} p^(i-1)/i, quantized to nano-units so the
    per-query sum is order-independent; zero-overlap queries report 0."""
    from ratatool_spark.operators.retrieval import rbo_overlap

    # persist the shared BM25 ranking: it feeds BOTH rbo sides (directly
    # as the lexical ranking and inside the hybrid fusion) — without the
    # persist the whole tokenize→postings→score chain runs twice
    # (r6 verdict #4: 33 shuffles / 20 scans in PLANS.md)
    lex = _q_bm25_topk(spark, sf_dir).persist()
    fused = _q_hybrid_retrieval(spark, sf_dir, lex=lex)
    return rbo_overlap(lex, fused, p=0.9, depth=5)

def _sql_rbo_overlap() -> str:
    return f"""
WITH a AS ({_sql_bm25_topk()}),
b AS ({_sql_hybrid_retrieval()}),
j AS (
  SELECT a.query_id, GREATEST(a.rank, b.rank) AS m
  FROM a JOIN b ON a.query_id = b.query_id AND a.doc_id = b.doc_id
), per AS (
  SELECT query_id,
         SUM(CAST(ROUND((1.0::DOUBLE - 0.9::DOUBLE)
           * list_reduce(list_transform(range(m, 6),
               i -> power(0.9::DOUBLE, i - 1) / i), (x, y) -> x + y)
           * 1000000000.0::DOUBLE, 0) AS BIGINT)) AS fx
  FROM j GROUP BY query_id
), q AS (
  SELECT query_id FROM a UNION SELECT query_id FROM b
)
SELECT q.query_id,
       CAST(COALESCE(per.fx, 0) AS DOUBLE) / 1000000000.0::DOUBLE AS rbo
FROM q LEFT JOIN per USING (query_id)
"""

def _q_calibration_report(spark, sf_dir):
    """Classifier calibration (profile.calibration_report): reliability
    table of the trained quality classifier's probabilities vs the
    observed English rate per bin — fixed-point nano-unit prob sums so
    mean_prob is aggregation-order independent. Reuses the
    quality_classifier_en pipeline (training replays in the oracle)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import calibration_report

    probs = _q_quality_classifier(spark, sf_dir)
    labels = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.col("lang") == "en").alias("label")
    )
    return calibration_report(
        probs.join(labels, "doc_id"), prob_col="prob", label_col="label"
    )

def _sql_calibration_report() -> str:
    return f"""
WITH probs AS ({_SQL_QUALITY_CLASSIFIER}),
lab AS (
  SELECT p.prob, (d.lang = 'en') AS y
  FROM probs p JOIN documents d USING (doc_id)
), binned AS (
  SELECT LEAST(CAST(FLOOR(prob * 10) AS BIGINT), 9) AS bin,
         count(*) AS n,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CAST(ROUND(prob * 1000000000.0, 0) AS BIGINT)) AS BIGINT)
           AS p_fx
  FROM lab GROUP BY bin
)
SELECT bin, n, n_pos,
       CAST(n_pos AS DOUBLE) / n AS frac_pos,
       CAST(p_fx AS DOUBLE) / 1000000000.0 / n AS mean_prob
FROM binned
"""

def _q_normalize_text(spark, sf_dir):
    """Unicode normalization (corpus.normalize_text): NFC via the
    documented Arrow-batched unicodedata seam + expression-side control
    strip and whitespace squash. Fixture appends a decomposed é
    (e + U+0301), a BEL control char, and ragged spacing to each doc so
    every rule fires; the oracle replays with DuckDB's nfc_normalize
    (both sides implement UAX#15)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import normalize_text
    from ratatool_spark.operators.retrieval import _terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text4 = F.concat(
        F.concat_ws(" ", F.slice(_terms(F.col("text")), 1, 6)),
        F.lit(" café x\x07y  tab\tend "),
    )
    fixture = docs.select("doc_id", text4.alias("text"))
    out = normalize_text(fixture, form="NFC")
    return out.select("doc_id", "text", "changed")

def _sql_normalize_text() -> str:
    return r"""
WITH src AS (
  SELECT doc_id,
         list_filter(string_split(trim(lower(text)), ' '),
                     t -> len(t) > 0) AS ls
  FROM documents
), built AS (
  SELECT doc_id,
         coalesce(array_to_string(ls[1:6], ' '), '')
         || ' cafe' || chr(769) || ' x' || chr(7) || 'y  tab' || chr(9)
         || 'end ' AS t
  FROM src
)
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(nfc_normalize(t), '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]',
                   '', 'g'),
    '\s+', ' ', 'g')) AS text,
  (trim(regexp_replace(
    regexp_replace(nfc_normalize(t), '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]',
                   '', 'g'),
    '\s+', ' ', 'g')) IS DISTINCT FROM t) AS changed
FROM built
"""

def _q_bm25_incremental(spark, sf_dir):
    """Incremental BM25 indexing (retrieval.update_bm25_index): build the
    index on the first half of the corpus, add the second half without
    re-tokenizing the first (vocab-to-vocab df merge, fused duplicate-id
    guard riding the stored-postings scan, two-rename swap), then query.
    The oracle is the FULL-build SQL — add-equivalence is the claim."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.retrieval import (
        _terms,
        bm25_topk_index,
        save_bm25_index,
        update_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = os.path.join(scratch_dir(prefix="rt_bm25_"), "idx")
    save_bm25_index(docs.where(F.col("doc_id") < 250), path)
    update_bm25_index(spark, path, docs.where(F.col("doc_id") >= 250))
    q = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(_terms(F.col("text")), 1, 6)).alias("qtext"),
    )
    return bm25_topk_index(spark, path, q, k=5)

def _q_c4_page_filter(spark, sf_dir):
    """C4 page/line cleaning (corpus.c4_page_filter, Raffel et al. §2.2):
    terminal-punctuation + min-words line filter, lorem-ipsum / brace /
    badword page flags. The flat synthetic text has no newlines or
    punctuation, so the gate builds a deterministic multi-line fixture
    from token slices (short line, unterminated line, parity-gated
    terminal line, mod-gated lorem/brace/badword lines) — every rule
    fires on some documents. Pure expressions over one scan."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import c4_page_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ls = F.filter(
        F.split(F.trim(F.col("text")), " "), lambda t: F.length(t) > 0
    )
    did = F.col("doc_id")
    text2 = F.concat(
        F.concat_ws(" ", F.slice(ls, 1, 6)), F.lit(".\n"),
        F.concat_ws(" ", F.slice(ls, 7, 3)), F.lit("!\n"),
        F.concat_ws(" ", F.slice(ls, 10, 7)), F.lit("\n"),
        F.concat_ws(" ", F.slice(ls, 17, 8)),
        F.when(did % 2 == 0, F.lit("?")).otherwise(F.lit("")),
        F.when(did % 17 == 0, F.lit("\nlorem ipsum dolor sit amet."))
        .otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit("\nvar x = { a: 1 };"))
        .otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.lit("\nthis page mentions badword1 five times total."),
        ).otherwise(F.lit("")),
    )
    fixture = docs.select("doc_id", text2.alias("text"))
    return c4_page_filter(
        fixture,
        min_words_per_line=5,
        min_kept_lines=2,
        badwords=("badword1", "badword2"),
    )

def _sql_c4_page_filter() -> str:
    return """
WITH src AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), t -> len(t) > 0) AS ls
  FROM documents
), built AS (
  SELECT doc_id,
    coalesce(array_to_string(ls[1:6], ' '), '') || '.' || chr(10) ||
    coalesce(array_to_string(ls[7:9], ' '), '') || '!' || chr(10) ||
    coalesce(array_to_string(ls[10:16], ' '), '') || chr(10) ||
    coalesce(array_to_string(ls[17:24], ' '), '') ||
    CASE WHEN doc_id % 2 = 0 THEN '?' ELSE '' END ||
    CASE WHEN doc_id % 17 = 0
         THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END ||
    CASE WHEN doc_id % 13 = 0
         THEN chr(10) || 'var x = { a: 1 };' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
         THEN chr(10) || 'this page mentions badword1 five times total.'
         ELSE '' END AS text2
  FROM src
), kept AS (
  SELECT doc_id, text2,
    string_split(text2, chr(10)) AS lns,
    list_filter(list_transform(string_split(text2, chr(10)), x -> trim(x)),
      ln -> len(list_filter(string_split(ln, ' '), t -> len(t) > 0)) >= 5
            AND regexp_matches(ln, '[.!?"]$')) AS keptl
  FROM built
)
SELECT doc_id,
  array_to_string(keptl, chr(10)) AS clean_text,
  len(lns) AS n_lines,
  len(keptl) AS n_kept_lines,
  contains(lower(text2), 'lorem ipsum') AS has_lorem_ipsum,
  contains(lower(text2), '{') AS has_brace,
  len(list_intersect(
    list_filter(
      string_split(regexp_replace(lower(text2), chr(10), ' ', 'g'), ' '),
      t -> len(t) > 0),
    ['badword1', 'badword2'])) > 0 AS has_badword,
  (len(keptl) >= 2
   AND NOT contains(lower(text2), 'lorem ipsum')
   AND NOT contains(lower(text2), '{')
   AND NOT len(list_intersect(
     list_filter(
       string_split(regexp_replace(lower(text2), chr(10), ' ', 'g'), ' '),
       t -> len(t) > 0),
     ['badword1', 'badword2'])) > 0) AS keep
FROM kept
"""

def _q_hybrid_retrieval(spark, sf_dir, lex=None):
    """Hybrid retrieval (retrieval.rrf_fuse): reciprocal-rank fusion of
    BM25 lexical top-5 and exact-cosine embedding top-5 per query
    (queries = ids 0-4, the doc/vec id spaces are aligned). RRF
    contributions quantized to exact nano-units so fused scores are
    order- and engine-independent; fusion input is top-k-bounded so the
    combine is O(queries*k*systems) regardless of corpus size.
    ``lex`` lets a composing gate (rbo) hand in an already-persisted
    BM25 ranking instead of rebuilding the chain."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.retrieval import _terms, bm25_topk, rrf_fuse
    from ratatool_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if lex is None:
        q_lex = docs.where(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(" ", F.slice(_terms(F.col("text")), 1, 6)).alias("qtext"),
        )
        lex = bm25_topk(docs, q_lex, k=5)
    vec = brute_force_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5
    ).withColumnRenamed("neighbor_id", "doc_id")
    return rrf_fuse([lex, vec], k_rrf=60, topk=5)

def _sql_hybrid_retrieval() -> str:
    return (
        "WITH " + _BM25_CTES
        + f""", lex AS (
  SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 5
), vecscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         {_COS_SQL} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
), vecranked AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, doc_id) AS rank
  FROM vecscored
), unioned AS (
  SELECT query_id, doc_id,
         CAST(ROUND(1000000000.0::DOUBLE / (60 + rank), 0) AS BIGINT) AS fx
  FROM lex
  UNION ALL
  SELECT query_id, doc_id,
         CAST(ROUND(1000000000.0::DOUBLE / (60 + rank), 0) AS BIGINT) AS fx
  FROM vecranked WHERE rank <= 5
), fused AS (
  SELECT query_id, doc_id, SUM(fx) AS score_fx, COUNT(*) AS n_systems
  FROM unioned GROUP BY query_id, doc_id
), franked AS (
  SELECT query_id, doc_id,
         CAST(score_fx AS DOUBLE) / 1000000000.0::DOUBLE AS rrf_score,
         n_systems,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_fx DESC, doc_id) AS rank
  FROM fused
)
SELECT query_id, doc_id, rrf_score, n_systems, rank
FROM franked WHERE rank <= 5"""
    )

def _q_tfrecord_roundtrip(spark, sf_dir):
    """TFRecord-of-Example roundtrip (sources/tfrecord_py): documents
    written as CRC-verified framed tf.train.Example protos (one shard per
    partition, on the executors) and scanned back via binaryFile +
    mapInPandas — the training-shard container TF/JAX consumers read,
    produced jar-free."""
    import os

    from ratatool_spark.sources.tfrecord_py import read_tfrecord, write_tfrecord

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = os.path.join(scratch_dir(prefix="rt_tfr_"), "docs")
    write_tfrecord(docs.repartition(4, "doc_id"), path)
    return read_tfrecord(spark, path, docs.schema)

def _sql_tfrecord_roundtrip() -> str:
    return "SELECT doc_id, text, lang, source, n_chars FROM documents"

def _q_perplexity_buckets(spark, sf_dir):
    """CCNet quality tiers (corpus.perplexity_buckets): unigram-LM scores
    → DISTRIBUTED global rank (range partition + broadcast prefix
    offsets, no single-task ORDER BY window) → 3 equal-population
    buckets via exact integer arithmetic."""
    from ratatool_spark.operators.corpus import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return perplexity_buckets(docs, n_buckets=3).select(
        "doc_id", "n_tokens", "mean_logprob", "rank", "bucket"
    )

def _sql_perplexity_buckets() -> str:
    return f"""
WITH scored AS ({_SQL_UNIGRAM_LOGPROB}),
ranked AS (
  SELECT doc_id, n_tokens, mean_logprob,
         CAST(ROW_NUMBER() OVER (
           ORDER BY mean_logprob DESC NULLS LAST, doc_id) AS BIGINT)
           AS rank,
         COUNT(*) OVER () AS n
  FROM scored
)
SELECT doc_id, n_tokens, mean_logprob, rank,
       CAST(((rank - 1) * 3) // n AS INT) AS bucket
FROM ranked
"""

def _q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (functions/text.winnow_fingerprints, MOSS
    leftmost-min variant): word-3-gram hashes, window-4 minima with gram
    positions — pure expressions, distinct (doc, pos, fp) rows."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            "doc_id",
            F.explode(winnow_fingerprints(F.col("text"), 3, 4)).alias("f"),
        )
        .select("doc_id", F.col("f.pos").alias("pos"), F.col("f.fp").alias("fp"))
        .distinct()
    )

def _sql_winnow_fingerprints() -> str:
    g_hash = _PH64_SQL.format(x="g")
    return f"""
WITH hs AS (
  SELECT doc_id,
         list_transform({_NGRAMS3_SQL}, g -> {g_hash}) AS h
  FROM documents
), wins AS (
  SELECT doc_id,
         CAST(s AS BIGINT) + list_position(h[s:s+3], list_min(h[s:s+3])) - 1
           AS pos,
         list_min(h[s:s+3]) AS fp
  FROM hs, UNNEST(range(1, greatest(1, len(h) - 3) + 1)) r(s)
)
SELECT DISTINCT doc_id, pos, fp FROM wins
"""

def _q_winnow_pairs(spark, sf_dir):
    """MOSS candidate pairs (dedup.winnow_candidate_pairs): one posting
    exchange over the winnowed index (~1/window of gram hashes),
    in-array pair expansion, distinct-shared-fingerprint counts."""
    from ratatool_spark.operators.dedup import winnow_candidate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_candidate_pairs(docs, k=3, window=4, min_shared=2)

def _sql_winnow_pairs() -> str:
    g_hash = _PH64_SQL.format(x="g")
    return f"""
WITH hs AS (
  SELECT doc_id,
         list_transform({_NGRAMS3_SQL}, g -> {g_hash}) AS h
  FROM documents
), wins AS (
  SELECT doc_id, list_min(h[s:s+3]) AS fp
  FROM hs, UNNEST(range(1, greatest(1, len(h) - 3) + 1)) r(s)
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins
), capped AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 1000
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS n_shared
FROM fps a
JOIN fps b USING (fp)
JOIN capped USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
"""

def _q_temperature_mixture(spark, sf_dir):
    """Temperature-scaled source rebalancing (corpus.temperature_mixture,
    α=0.5): keep-rate_s = sqrt(n_min/n_s) — targets derived from the
    corpus itself, broadcast rates, reproducible dice; sqrt is IEEE-
    correctly-rounded so the kept set replays bit-for-bit in DuckDB."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import temperature_mixture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the fixture's sources are near-uniform (rates ≈ 1, nothing to
    # verify) — collapse 6/7 of the corpus into one dominant source so
    # the sqrt keep-rates actually discriminate
    skewed = docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.col("source")).otherwise(
            F.lit("common")
        ),
    )
    return temperature_mixture(skewed, alpha=0.5, seed=11).select(
        "doc_id", "source"
    )

def _sql_temperature_mixture() -> str:
    dice11 = _dice_sql(["doc_id"], 11)
    return f"""
WITH skewed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN source ELSE 'common' END AS source
  FROM documents
), counts AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
  FROM skewed GROUP BY source
), m AS (
  SELECT MIN(n) AS mn FROM counts
), rates AS (
  SELECT source, sqrt(mn / n) AS rate FROM counts, m
)
SELECT d.doc_id, d.source
FROM skewed d JOIN rates r USING (source)
WHERE {dice11} < r.rate
"""

def _q_hard_negatives(spark, sf_dir):
    """Hard-negative mining (similarity.hard_negatives): top-3
    most-similar DIFFERENT-label vectors per query — the label-mismatch
    predicate fused into the broadcast join, ranked after filtering."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    out = hard_negatives(emb, q, k=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )

def _sql_hard_negatives() -> str:
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL} AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id AND q.label <> c.label
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 3
"""

def _q_gopher_rules(spark, sf_dir):
    """Gopher rule-based quality filters (corpus.gopher_quality_flags):
    per-rule metrics + the AND verdict as pure column expressions — zero
    shuffles, zero Python. Ratios are floor-scaled to 6dp (ROUND tie
    behaviour diverges between engines on power-of-two denominators)."""
    from ratatool_spark.operators.corpus import gopher_quality_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality_flags(docs, min_words=30).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_to_word_ratio",
        "bullet_line_ratio",
        "ellipsis_line_ratio",
        "alpha_word_ratio",
        "n_stop_hits",
        "passes_gopher",
    )

def _sql_gopher_rules() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '),
                     x -> length(x) > 0) AS toks,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)),
                     l -> length(l) > 0) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CASE WHEN len(toks) > 0 THEN
           FLOOR((list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(toks,
                                     x -> CAST(length(x) AS BIGINT))),
                    (a, b) -> a + b)
                  / len(toks)) * 1000000.0) / 1000000.0
         END AS mean_word_len,
         CASE WHEN len(toks) > 0 THEN
           FLOOR((len(list_filter(toks,
                    x -> contains(x, '#') OR contains(x, '...')))
                  / len(toks)) * 1000000.0) / 1000000.0
         END AS symbol_to_word_ratio,
         CASE WHEN len(lines) > 0 THEN
           FLOOR((len(list_filter(lines,
                    l -> starts_with(l, '-') OR starts_with(l, '*')
                         OR starts_with(l, '•')))
                  / len(lines)) * 1000000.0) / 1000000.0
         END AS bullet_line_ratio,
         CASE WHEN len(lines) > 0 THEN
           FLOOR((len(list_filter(lines,
                    l -> ends_with(l, '...') OR ends_with(l, '…')))
                  / len(lines)) * 1000000.0) / 1000000.0
         END AS ellipsis_line_ratio,
         CASE WHEN len(toks) > 0 THEN
           FLOOR((len(list_filter(toks,
                    x -> regexp_matches(x, '[A-Za-z]')))
                  / len(toks)) * 1000000.0) / 1000000.0
         END AS alpha_word_ratio,
         (CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'the')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'be')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'to')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'of')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'and')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'that') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'have') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'with') THEN 1 ELSE 0 END
         ) AS n_stop_hits
  FROM t
)
SELECT doc_id, n_words, mean_word_len, symbol_to_word_ratio,
       bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
       n_stop_hits,
       COALESCE(n_words >= 30 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND symbol_to_word_ratio <= 0.1
                AND bullet_line_ratio <= 0.9
                AND ellipsis_line_ratio <= 0.3
                AND alpha_word_ratio >= 0.8
                AND n_stop_hits >= 2, FALSE) AS passes_gopher
FROM m
"""

def _q_kmeans_cells(spark, sf_dir):
    """Bit-reproducible distributed k-means (similarity.
    train_centroids_exact): ONE full Lloyd's iteration — expression-path
    cosine assignment (left-to-right IEEE folds) + FIXED-POINT centroid
    update (floor(x·10⁶) summed as longs, so the update is partition-
    order-independent) — then the final cell assignment, reported as
    per-cell counts + vec_id checksums. The float-avg variant
    (train_centroids) has no SQL twin because double summation order is
    engine- and partition-dependent; this gate pins that the fixed-point
    trainer replays EXACTLY in a second engine, which is the same
    property that makes it replay exactly across cluster topologies."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.similarity import (
        ivf_assign_cells,
        train_centroids_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_centroids_exact(emb, n_centroids=8, iters=1, seed=13)
    return (
        emb.select(
            "vec_id",
            F.element_at(ivf_assign_cells(emb, cents), 1).alias("cell"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("vec_id").alias("id_sum"),
        )
    )

def _sql_kmeans_cells() -> str:
    cos_vc = _sql_cos_vc()
    # final assignment uses ivf_assign_cells' tie-break (cell DESC),
    # reported as per-cell counts + vec_id checksums
    return _sql_kmeans_train_ctes() + f"""
final AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {cos_vc} DESC, ct.cell DESC) AS arn
    FROM embeddings v CROSS JOIN cents1 ct
  ) WHERE arn = 1
)
SELECT cell, COUNT(*) AS n_vectors, CAST(SUM(vec_id) AS BIGINT) AS id_sum
FROM final GROUP BY cell
"""

def _q_chunk_documents(spark, sf_dir):
    """Context-window chunking (corpus.chunk_documents): every document
    split into 32-token chunks with 8-token overlap, trailing partial
    kept — zero-shuffle narrow plan (tokenize + arithmetic sequence +
    slice/explode)."""
    from ratatool_spark.operators.corpus import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, chunk_size=32, overlap=8)
