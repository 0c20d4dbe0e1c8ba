"""Unigram-LM tokenizer training and segmentation (the SentencePiece
unigram model, Kudo 2018: "Subword Regularization") — the OTHER major
subword-tokenizer family next to BPE (``corpus.bpe_learn``). Where BPE
greedily merges pairs, the unigram model treats the vocabulary as a
probabilistic dictionary: every word is a LATTICE of candidate pieces,
EM re-estimates piece probabilities from expected piece counts over all
segmentations (forward-backward over the lattice), and inference is the
Viterbi best path.

Distributed design — and why it is all DataFrame expressions:

* The corpus collapses to DISTINCT WORDS with counts first (one
  shuffle): EM's statistics are identical per word occurrence, so a
  100 TB corpus trains on its (vastly smaller) word-count table — the
  same trick the SentencePiece trainer uses on its suffix-array side.
* The per-word lattice DP (forward alpha, backward beta, Viterbi max)
  is a FOLD over the word's character positions. Spark's higher-order
  array functions (``F.aggregate`` over a position sequence, carrying
  the alpha list as the accumulator) express it exactly — zero Python
  UDFs, whole plan JVM-side, and every fold is per-row independent, so
  it scales embarrassingly across the word table.
* Piece lookups are a JOIN (substring frame x vocabulary), never a
  broadcast dict in Python: the vocabulary can be millions of pieces.
* Summation order is pinned (edge lists sorted by (j, i, piece)), so
  float results are deterministic and replayable cross-engine — the
  oracle twins re-run the same folds as DuckDB recursive CTEs.

Edges carry LINEAR probabilities (alpha products underflow only past
~150 chars at p>=1e-6; training words are length-capped far below),
Viterbi runs in log space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ratatool_spark.functions.text import tokens


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 16,
) -> DataFrame:
    """(word, wcnt) over the corpus, capped at ``max_word_len`` chars —
    the standard trainer hygiene (URLs/base64 junk would otherwise
    dominate the candidate-piece table); segmentation at inference has
    no such cap (the fold runs over any length)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where((F.length("word") > 0) & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def candidate_pieces(
    words: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """The seed vocabulary: every substring of length <= max_piece_len
    of every word, weighted by word count, kept when its corpus count
    reaches ``min_count`` — EXCEPT single characters, which are always
    kept (they guarantee every word has at least one segmentation, the
    coverage invariant EM and Viterbi both rely on). Returns
    (piece, cnt). The integer threshold makes the seed set exactly
    reproducible cross-engine (no float cut)."""
    subs = words.select(
        "wcnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda j: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - j + 1,
                            ),
                        ),
                        lambda l: F.substring(F.col("word"), j, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("wcnt").alias("cnt"))
    return counts.where(
        (F.length("piece") == 1) | (F.col("cnt") >= min_count)
    )


def _edges(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per word, the lattice edge list: sorted array of (j, i, p,
    piece) structs where the piece spans characters j..i (0-based,
    i exclusive). One join against the vocabulary; sort order pins
    float-summation order for cross-engine determinism."""
    max_l = vocab.agg(F.max(F.length("piece"))).first()[0]
    subs = words.select(
        "word",
        "wcnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda j: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_l)),
                                F.length("word") - j + 1,
                            ),
                        ),
                        lambda l: F.struct(
                            (j - 1).cast("int").alias("j"),
                            (j - 1 + l).cast("int").alias("i"),
                            F.substring(F.col("word"), j, l).alias("piece"),
                        ),
                    ),
                )
            )
        ).alias("e"),
    ).select("word", "wcnt", "e.j", "e.i", "e.piece")
    return (
        subs.join(vocab.select("piece", "p"), "piece", "left")
        .groupBy("word", "wcnt")
        .agg(
            F.sort_array(
                F.collect_list(  # skips NULLs: unmatched substrings
                    F.when(
                        F.col("p").isNotNull(),
                        F.struct("j", "i", "p", "piece"),
                    )
                )
            ).alias("edges")
        )
    )


def _alpha(edges_col, n_col) -> Column:
    """Forward probabilities as a fold: alpha[0]=1, alpha[i] = sum over
    edges (j -> i) of alpha[j] * p. Accumulator is the growing alpha
    list; edge filtering preserves the sorted-by-j order, so the float
    sum order is pinned."""
    return F.aggregate(
        F.sequence(F.lit(1), n_col),
        F.array(F.lit(1.0)),
        lambda acc, i: F.array_append(
            acc,
            F.aggregate(
                F.filter(edges_col, lambda e: e["i"] == i),
                F.lit(0.0),
                lambda s, e: s + F.element_at(acc, e["j"] + 1) * e["p"],
            ),
        ),
    )


def _beta(edges_col, n_col) -> Column:
    """Backward probabilities, same fold from the right: beta[n]=1,
    beta[j] = sum over edges (j -> i) of p * beta[i]. Built reversed
    (index 1 holds beta[n]) then flipped so beta[k] = element k+1."""
    rev = F.aggregate(
        F.sequence(F.lit(1), n_col),
        F.array(F.lit(1.0)),
        lambda acc, step: F.array_append(
            acc,
            F.aggregate(
                F.filter(edges_col, lambda e: e["j"] == n_col - step),
                F.lit(0.0),
                lambda s, e: s
                + e["p"] * F.element_at(acc, n_col - e["i"] + 1),
            ),
        ),
    )
    return F.reverse(rev)


def em_expected_counts(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """One E-step: (piece, expected) — the expected number of times each
    vocabulary piece is used across all words' segmentations, each word
    weighted by its corpus count. Per edge (j -> i, piece): posterior =
    alpha[j] * p * beta[i] / alpha[n] (forward-backward); words whose
    lattice has zero total mass (impossible while single chars stay in
    the vocabulary) contribute nothing rather than NaN."""
    lat = _edges(words, vocab).select(
        "word",
        "wcnt",
        "edges",
        F.length("word").cast("int").alias("n"),
    )
    lat = lat.select(
        "*",
        _alpha(F.col("edges"), F.col("n")).alias("al"),
        _beta(F.col("edges"), F.col("n")).alias("be"),
    ).select(
        "*", F.element_at("al", F.col("n") + 1).alias("total")
    )
    contrib = lat.where(F.col("total") > 0).select(
        "wcnt",
        "total",
        F.explode(
            F.transform(
                F.col("edges"),
                lambda e: F.struct(
                    e["piece"].alias("piece"),
                    (
                        F.element_at(F.col("al"), e["j"] + 1)
                        * e["p"]
                        * F.element_at(F.col("be"), e["i"] + 1)
                    ).alias("post"),
                ),
            )
        ).alias("c"),
    )
    return (
        contrib.groupBy(F.col("c.piece").alias("piece"))
        .agg(
            F.sum(
                F.col("wcnt") * F.col("c.post") / F.col("total")
            ).alias("expected")
        )
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    min_seed_count: int = 2,
    max_word_len: int = 16,
) -> DataFrame:
    """Train a unigram-LM tokenizer: seed vocabulary from substring
    counts, ``em_rounds`` of EM (E: expected piece counts by
    forward-backward; M: renormalize), then prune to ``vocab_size``
    keeping every single character (coverage) and the highest-expected
    pieces (ties broken by piece text for determinism). Returns
    (piece, p, logp) — the persisted-tokenizer artifact
    :func:`viterbi_segment_words` consumes.

    Driver round-trips: one tiny scalar per EM round (the normalizer);
    the vocabulary and word table never leave the cluster. Kudo 2018
    prunes by loss-if-removed; expected-count pruning is its
    first-order approximation and keeps the whole trainer expression-
    replayable (the oracle gates re-run seed + EM relationally)."""
    words = word_counts(df, text_col, max_word_len)
    seed = candidate_pieces(words, max_piece_len, min_seed_count)
    tot = seed.agg(F.sum("cnt")).first()[0]
    vocab = seed.select(
        "piece", (F.col("cnt") / F.lit(float(tot))).alias("p")
    )
    for _ in range(em_rounds):
        exp = em_expected_counts(words, vocab)
        etot = exp.agg(F.sum("expected")).first()[0]
        vocab = exp.select(
            "piece", (F.col("expected") / F.lit(float(etot))).alias("p")
        )
    chars = vocab.where(F.length("piece") == 1)
    multi = (
        vocab.where(F.length("piece") > 1)
        .orderBy(F.col("p").desc(), "piece")
        .limit(max(0, vocab_size - chars.count()))
    )
    out = chars.unionByName(multi)
    return out.select("piece", "p", F.log("p").alias("logp"))


def viterbi_segment_words(
    words: DataFrame, vocab: DataFrame
) -> DataFrame:
    """(word, pieces): the Viterbi best segmentation of each word under
    the unigram model — max-sum in log space over the same lattice the
    EM fold walks, ties broken toward the latest (longest-last-piece)
    candidate after a deterministic (score, j, piece) sort. Words the
    vocabulary cannot cover yield NULL pieces (impossible while the
    single-character coverage set is intact); callers treat that as
    OOV. One join + two per-row folds; no UDFs, no driver data."""
    lat = _edges(words, vocab).select(
        "word", "edges", F.length("word").cast("int").alias("n")
    )
    neg_inf = F.lit(-1e300)
    # vit[i] = struct(lp = best log-prob to reach i, j = backpointer,
    # piece = edge taken); candidates sorted, last = max
    vit = F.aggregate(
        F.sequence(F.lit(1), F.col("n")),
        F.array(
            F.struct(
                F.lit(0.0).alias("lp"),
                F.lit(-1).cast("int").alias("j"),
                F.lit("").alias("piece"),
            )
        ),
        lambda acc, i: F.array_append(
            acc,
            F.coalesce(
                F.try_element_at(
                    F.array_sort(
                        F.transform(
                            F.filter(
                                F.col("edges"), lambda e: e["i"] == i
                            ),
                            lambda e: F.struct(
                                F.when(
                                    F.element_at(acc, e["j"] + 1)["lp"]
                                    <= F.lit(-1e299),
                                    neg_inf,
                                )
                                .otherwise(
                                    F.element_at(acc, e["j"] + 1)["lp"]
                                    + F.log(e["p"])
                                )
                                .alias("lp"),
                                e["j"].alias("j"),
                                e["piece"].alias("piece"),
                            ),
                        )
                    ),
                    F.lit(-1),
                ),
                F.struct(
                    neg_inf.alias("lp"),
                    F.lit(-1).cast("int").alias("j"),
                    F.lit("").alias("piece"),
                ),
            ),
        ),
    )
    lat = lat.select("word", "n", vit.alias("vit"))
    # backtrack: walk bp from n to 0 (at most n hops), prepending pieces
    walk = F.aggregate(
        F.sequence(F.lit(1), F.col("n")),
        F.struct(
            F.col("n").cast("int").alias("pos"),
            F.array().cast("array<string>").alias("ps"),
        ),
        lambda acc, _i: F.when(
            acc["pos"] <= 0, acc
        ).otherwise(
            F.struct(
                F.element_at(F.col("vit"), acc["pos"] + 1)["j"].alias(
                    "pos"
                ),
                F.concat(
                    F.array(
                        F.element_at(F.col("vit"), acc["pos"] + 1)["piece"]
                    ),
                    acc["ps"],
                ).alias("ps"),
            )
        ),
    )
    covered = F.element_at(F.col("vit"), F.col("n") + 1)["lp"] > F.lit(
        -1e299
    )
    return lat.select(
        "word",
        F.when(covered, walk["ps"]).alias("pieces"),
    )


def segment_docs(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_len: int = 16,
) -> DataFrame:
    """(id, n_tokens, n_pieces, n_oov): apply a trained unigram
    tokenizer to a corpus — the segmentation is computed ONCE per
    DISTINCT word (the same collapse the trainer uses: at 100 TB the
    Viterbi folds run over the vocabulary-sized word table, never the
    corpus) and the corpus re-acquires it through one join. Words the
    vocabulary cannot cover, and words past ``max_word_len`` (the
    training cap — consistent OOV policy both sides), count as
    ``n_oov`` and contribute no pieces. Every input row appears
    (empty docs: zeros)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).where(F.length("word") > 0)
    words = (
        toks.where(F.length("word") <= max_word_len)
        .select("word")
        .distinct()
        .withColumn("wcnt", F.lit(1).cast("long"))
    )
    segs = viterbi_segment_words(words, vocab).select(
        "word", F.size("pieces").alias("__np")
    )
    j = toks.join(segs, "word", "left")
    per_doc = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("__np") >= 0, F.col("__np")).otherwise(F.lit(0))
        ).alias("n_pieces"),
        F.count(
            F.when(F.col("__np").isNull() | (F.col("__np") < 0), 1)
        ).alias("n_oov"),
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_pieces"), F.lit(0)).alias("n_pieces"),
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
    )
