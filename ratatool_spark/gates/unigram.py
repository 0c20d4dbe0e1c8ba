"""Gate + oracle twins for the unigram-LM tokenizer family
(operators/unigram — the SentencePiece unigram model, Kudo 2018). The
oracles replay the WHOLE lattice machinery relationally: seed vocabulary
from substring counts (integer threshold — exact cross-engine), the
forward-backward E-step as recursive CTEs carrying the alpha/beta lists,
and Viterbi as the same recursion with a deterministic argmax. Float
parity holds because both engines run the identical IEEE op sequence:
edge lists are sorted the same way, folds accumulate in the same order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Shared oracle preamble: words (len cap 16), substrings (L=4), seed
# (min corpus count 2, all single chars), linear piece probabilities,
# and the per-word edge lists ordered exactly as Spark's sort_array
# leaves them.
_PRE = """
WITH RECURSIVE words AS (
  SELECT t.tok AS word, COUNT(*) AS wcnt
  FROM (SELECT string_split(trim(text), ' ') AS ls FROM documents),
       UNNEST(ls) AS t(tok)
  WHERE LENGTH(t.tok) BETWEEN 1 AND 16
  GROUP BY 1
), subs AS (
  SELECT w.word, w.wcnt, g.j - 1 AS j, g.j - 1 + l.l AS i,
         substr(w.word, g.j, l.l) AS piece
  FROM words w,
       UNNEST(generate_series(1, LENGTH(w.word))) AS g(j),
       UNNEST(generate_series(1, LEAST(4, LENGTH(w.word) - g.j + 1)))
         AS l(l)
), seed AS (
  SELECT piece, SUM(wcnt) AS cnt FROM subs GROUP BY piece
), kept AS (
  SELECT piece, cnt FROM seed WHERE LENGTH(piece) = 1 OR cnt >= 2
), vocab AS (
  SELECT piece, cnt / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM kept) AS p
  FROM kept
), edges AS (
  SELECT s.word, s.wcnt, s.j, s.i, s.piece, v.p
  FROM subs s JOIN vocab v USING (piece)
), einc AS (
  SELECT word, i,
         list(struct_pack(j := j, p := p, piece := piece)
              ORDER BY j, p, piece) AS es
  FROM edges GROUP BY word, i
), ejnc AS (
  SELECT word, j,
         list(struct_pack(i := i, p := p) ORDER BY i, p, piece) AS es
  FROM edges GROUP BY word, j
)"""


def _spark_seed_vocab(spark, sf_dir):
    from ratatool_spark.operators.unigram import (
        candidate_pieces,
        word_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = word_counts(docs, max_word_len=16)
    seed = candidate_pieces(words, max_piece_len=4, min_count=2)
    tot = seed.agg(F.sum("cnt")).first()[0]
    vocab = seed.select(
        "piece", (F.col("cnt") / F.lit(float(tot))).alias("p")
    )
    return words, vocab


def _q_unigram_em_expected(spark, sf_dir):
    """Unigram-LM tokenizer E-step (operators/unigram.
    em_expected_counts — Kudo 2018's forward-backward over the word
    lattice): seed vocabulary = substrings (len<=4) with corpus count
    >= 2 plus every single character (coverage), probabilities = count
    fractions, then ONE EM E-step computes each piece's expected usage
    across all segmentations of the corpus's words. Implemented as
    per-word folds over Spark higher-order array functions (zero UDFs,
    summation order pinned by sorted edge lists); the oracle replays
    alpha/beta as recursive CTEs carrying the probability lists — the
    identical IEEE op sequence, so values match at full float precision
    (rounded to 6dp for the hash)."""
    from ratatool_spark.operators.unigram import em_expected_counts

    words, vocab = _spark_seed_vocab(spark, sf_dir)
    out = em_expected_counts(words, vocab)
    return out.select(
        "piece", F.round("expected", 6).alias("expected")
    )


_SQL_UNIGRAM_EM_EXPECTED = _PRE + """
, alpha AS (
  SELECT word, 0 AS i, [1.0]::DOUBLE[] AS al FROM words
  UNION ALL
  SELECT a.word, a.i + 1,
         list_append(a.al, CASE WHEN e.es IS NULL THEN 0.0 ELSE
           list_reduce(list_transform(e.es, x -> a.al[x.j + 1] * x.p),
                       (s, c) -> s + c) END)
  FROM alpha a
  JOIN words w ON w.word = a.word
  LEFT JOIN einc e ON e.word = a.word AND e.i = a.i + 1
  WHERE a.i < LENGTH(w.word)
), beta AS (
  SELECT word, 0 AS k, [1.0]::DOUBLE[] AS bl FROM words
  UNION ALL
  SELECT b.word, b.k + 1,
         list_append(b.bl, CASE WHEN e.es IS NULL THEN 0.0 ELSE
           list_reduce(list_transform(e.es,
                         x -> x.p * b.bl[LENGTH(w.word) - x.i + 1]),
                       (s, c) -> s + c) END)
  FROM beta b
  JOIN words w ON w.word = b.word
  LEFT JOIN ejnc e ON e.word = b.word AND e.j = LENGTH(w.word) - b.k - 1
  WHERE b.k < LENGTH(w.word)
), afin AS (
  SELECT a.word, a.al FROM alpha a
  JOIN words w ON w.word = a.word AND a.i = LENGTH(w.word)
), bfin AS (
  SELECT b.word, b.bl FROM beta b
  JOIN words w ON w.word = b.word AND b.k = LENGTH(w.word)
), post AS (
  SELECT e.piece,
         e.wcnt * (af.al[e.j + 1] * e.p
                   * bf.bl[LENGTH(e.word) - e.i + 1])
               / af.al[LENGTH(e.word) + 1] AS x
  FROM edges e
  JOIN afin af USING (word)
  JOIN bfin bf USING (word)
  WHERE af.al[LENGTH(e.word) + 1] > 0
)
SELECT piece, ROUND(SUM(x), 6) AS expected FROM post GROUP BY piece
"""


def _q_unigram_viterbi_segment(spark, sf_dir):
    """Unigram-LM Viterbi segmentation (operators/unigram.
    viterbi_segment_words): every distinct corpus word segmented into
    its max-probability piece sequence under the seed model — the
    inference half of the tokenizer, the same lattice as the EM gate
    walked max-sum in log space with a deterministic (score, j, piece)
    tie-break. Exact string equality against the oracle's recursive
    Viterbi + backtrack: no rounding anywhere, the segmentations must
    match piece-for-piece."""
    from ratatool_spark.operators.unigram import (
        viterbi_segment_words,
        word_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = word_counts(docs, max_word_len=16)
    _, vocab = _spark_seed_vocab(spark, sf_dir)
    seg = viterbi_segment_words(words, vocab)
    return seg.select(
        "word", F.array_join("pieces", "|").alias("seg")
    )


_SQL_UNIGRAM_VITERBI = _PRE + """
, vt AS (
  SELECT word, 0 AS i,
         [struct_pack(lp := CAST(0.0 AS DOUBLE), j := -1, piece := '')]
           AS vl
  FROM words
  UNION ALL
  SELECT v.word, v.i + 1,
         list_append(v.vl,
           CASE WHEN e.es IS NULL
                THEN struct_pack(lp := -1e300, j := -1, piece := '')
                ELSE list_sort(list_transform(e.es, x -> struct_pack(
                       lp := CASE WHEN v.vl[x.j + 1].lp <= -1e299
                                  THEN -1e300
                                  ELSE v.vl[x.j + 1].lp + LN(x.p) END,
                       j := x.j, piece := x.piece)))
                     [LENGTH(e.es)] END)
  FROM vt v
  JOIN words w ON w.word = v.word
  LEFT JOIN einc e ON e.word = v.word AND e.i = v.i + 1
  WHERE v.i < LENGTH(w.word)
), vfin AS (
  SELECT v.word, v.vl FROM vt v
  JOIN words w ON w.word = v.word AND v.i = LENGTH(w.word)
), bt AS (
  SELECT f.word, LENGTH(f.word)::INT AS pos, []::VARCHAR[] AS ps
  FROM vfin f WHERE f.vl[LENGTH(f.word) + 1].lp > -1e299
  UNION ALL
  SELECT t.word, f.vl[t.pos + 1].j,
         list_prepend(f.vl[t.pos + 1].piece, t.ps)
  FROM bt t JOIN vfin f USING (word) WHERE t.pos > 0
), segs AS (
  SELECT word, array_to_string(ps, '|') AS seg FROM bt WHERE pos = 0
)
SELECT w.word, s.seg FROM words w LEFT JOIN segs s USING (word)
"""


def _q_pipeline_unigram_tokenize(spark, sf_dir):
    """Tokenizer applied at corpus scale (operators/unigram.
    segment_docs): the Viterbi segmentation is computed ONCE per
    DISTINCT word and the corpus re-acquires it through one join — the
    collapse that makes tokenizing 100 TB cost O(vocabulary) lattice
    work plus a corpus-sized join, not a per-token DP. Output: per-doc
    token/piece/OOV counts; the oracle replays the full chain (seed ->
    Viterbi -> doc join) relationally."""
    from ratatool_spark.operators.unigram import segment_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, vocab = _spark_seed_vocab(spark, sf_dir)
    return segment_docs(docs, vocab)


_SQL_PIPELINE_UNIGRAM_TOKENIZE = _PRE + """
, vt AS (
  SELECT word, 0 AS i,
         [struct_pack(lp := CAST(0.0 AS DOUBLE), j := -1, piece := '')]
           AS vl
  FROM words
  UNION ALL
  SELECT v.word, v.i + 1,
         list_append(v.vl,
           CASE WHEN e.es IS NULL
                THEN struct_pack(lp := -1e300, j := -1, piece := '')
                ELSE list_sort(list_transform(e.es, x -> struct_pack(
                       lp := CASE WHEN v.vl[x.j + 1].lp <= -1e299
                                  THEN -1e300
                                  ELSE v.vl[x.j + 1].lp + LN(x.p) END,
                       j := x.j, piece := x.piece)))
                     [LENGTH(e.es)] END)
  FROM vt v
  JOIN words w ON w.word = v.word
  LEFT JOIN einc e ON e.word = v.word AND e.i = v.i + 1
  WHERE v.i < LENGTH(w.word)
), vfin AS (
  SELECT v.word, v.vl FROM vt v
  JOIN words w ON w.word = v.word AND v.i = LENGTH(w.word)
), bt AS (
  SELECT f.word, LENGTH(f.word)::INT AS pos, []::VARCHAR[] AS ps
  FROM vfin f WHERE f.vl[LENGTH(f.word) + 1].lp > -1e299
  UNION ALL
  SELECT t.word, f.vl[t.pos + 1].j,
         list_prepend(f.vl[t.pos + 1].piece, t.ps)
  FROM bt t JOIN vfin f USING (word) WHERE t.pos > 0
), segs AS (
  SELECT word, len(ps) AS np FROM bt WHERE pos = 0
), toksd AS (
  SELECT doc_id, t.tok AS word
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ls
        FROM documents),
       UNNEST(ls) AS t(tok)
  WHERE LENGTH(t.tok) > 0
), perdoc AS (
  SELECT td.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN s.np IS NOT NULL THEN s.np ELSE 0 END)
              AS BIGINT) AS n_pieces,
         COUNT(CASE WHEN s.np IS NULL THEN 1 END) AS n_oov
  FROM toksd td LEFT JOIN segs s USING (word)
  GROUP BY td.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_pieces, 0) AS n_pieces,
       COALESCE(p.n_oov, 0) AS n_oov
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""
