"""Unigram-LM tokenizer (operators/unigram): EM expected counts against
an independent pure-python forward-backward, full train + prune, and
Viterbi segmentation invariants."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ratatool_spark.operators.unigram import (
    candidate_pieces,
    em_expected_counts,
    unigram_train,
    viterbi_segment_words,
    word_counts,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("unigram-tests")
        .getOrCreate()
    )
    yield s


def _ref_em(wc: dict, vocab_p: dict) -> dict:
    """Independent forward-backward reference."""
    exp: dict = defaultdict(float)
    for w, c in wc.items():
        n = len(w)
        edges = [
            (j, j + l, w[j:j + l])
            for j in range(n)
            for l in range(1, n - j + 1)
            if w[j:j + l] in vocab_p
        ]
        al = [1.0] + [0.0] * n
        for i in range(1, n + 1):
            al[i] = sum(
                al[j] * vocab_p[p] for (j, i2, p) in edges if i2 == i
            )
        be = [0.0] * n + [1.0]
        for j in range(n - 1, -1, -1):
            be[j] = sum(
                vocab_p[p] * be[i] for (j2, i, p) in edges if j2 == j
            )
        if al[n] <= 0:
            continue
        for (j, i, p) in edges:
            exp[p] += c * al[j] * vocab_p[p] * be[i] / al[n]
    return dict(exp)


def _ref_viterbi(w: str, vocab_p: dict) -> list | None:
    n = len(w)
    best = [(0.0, -1, "")] + [(-math.inf, -1, "")] * n
    for i in range(1, n + 1):
        for j in range(i):
            p = w[j:i]
            if p in vocab_p and best[j][0] > -math.inf:
                lp = best[j][0] + math.log(vocab_p[p])
                if lp > best[i][0]:
                    best[i] = (lp, j, p)
    if best[n][0] == -math.inf:
        return None
    out, pos = [], n
    while pos > 0:
        out.append(best[pos][2])
        pos = best[pos][1]
    return out[::-1]


_TEXTS = [
    "internationalization is international",
    "nation station nationalization",
    "the rationalization of the nation",
    "internment stationery inter inter",
]


def _fixture(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )
    words = word_counts(df)
    seed = candidate_pieces(words, max_piece_len=5, min_count=2)
    tot = seed.agg(F.sum("cnt")).first()[0]
    vocab = seed.select(
        "piece", (F.col("cnt") / F.lit(float(tot))).alias("p")
    )
    return df, words, vocab


def test_em_expected_counts_match_reference(spark):
    df, words, vocab = _fixture(spark)
    got = {
        r["piece"]: r["expected"]
        for r in em_expected_counts(words, vocab).collect()
    }
    wc = {r["word"]: r["wcnt"] for r in words.collect()}
    vp = {r["piece"]: r["p"] for r in vocab.collect()}
    ref = _ref_em(wc, vp)
    assert set(got) == set(ref)
    for p in ref:
        assert got[p] == pytest.approx(ref[p], rel=1e-12), p


def test_unigram_train_two_rounds_and_prune(spark):
    """Two EM rounds match the reference iterated twice; prune keeps
    every single char plus the top multi-char pieces; probs normalize."""
    df, words, vocab = _fixture(spark)
    wc = {r["word"]: r["wcnt"] for r in words.collect()}
    vp = {r["piece"]: r["p"] for r in vocab.collect()}
    for _ in range(2):
        e = _ref_em(wc, vp)
        tot = sum(e.values())
        vp = {p: v / tot for p, v in e.items()}
    tok = unigram_train(
        df, vocab_size=20, max_piece_len=5, em_rounds=2, min_seed_count=2
    )
    rows = {r["piece"]: r["p"] for r in tok.collect()}
    chars = {p for p in rows if len(p) == 1}
    assert chars == {p for p in vp if len(p) == 1}
    assert len(rows) <= 20
    multi_kept = sorted(
        (p for p in rows if len(p) > 1),
        key=lambda p: (-vp[p], p),
    )
    multi_expected = sorted(
        (p for p in vp if len(p) > 1), key=lambda p: (-vp[p], p)
    )[: len(multi_kept)]
    assert set(multi_kept) == set(multi_expected)
    for p, v in rows.items():
        assert v == pytest.approx(vp[p], rel=1e-12)


def test_viterbi_matches_reference_and_concats(spark):
    df, words, vocab = _fixture(spark)
    vp = {r["piece"]: r["p"] for r in vocab.collect()}
    segs = {
        r["word"]: (list(r["pieces"]) if r["pieces"] is not None else None)
        for r in viterbi_segment_words(words, vocab).collect()
    }
    for w, ps in segs.items():
        assert ps is not None
        assert "".join(ps) == w  # segmentation is a partition of the word
        ref = _ref_viterbi(w, vp)
        assert math.isclose(
            sum(math.log(vp[p]) for p in ps),
            sum(math.log(vp[p]) for p in ref),
            rel_tol=1e-12,
        ), (w, ps, ref)


def test_viterbi_oov_when_vocab_cannot_cover(spark):
    df, words, vocab = _fixture(spark)
    crippled = vocab.where(~F.col("piece").contains("z"))
    extra = spark.createDataFrame([("zz", 1)], "word string, wcnt long")
    segs = {
        r["word"]: r["pieces"]
        for r in viterbi_segment_words(
            extra, crippled
        ).collect()
    }
    assert segs["zz"] is None


def test_word_counts_cap_and_filtering(spark):
    df = spark.createDataFrame(
        [(0, "a  bb " + "x" * 20 + " bb")], "doc_id long, text string"
    )
    got = {
        r["word"]: r["wcnt"] for r in word_counts(df, max_word_len=16).collect()
    }
    assert got == {"a": 1, "bb": 2}  # long junk excluded, empties dropped


def test_segment_docs_counts_and_oov(spark):
    """Corpus application: per-doc piece counts from one word-join; long
    words (past the training cap) and uncoverable words count as OOV;
    empty docs yield zeros."""
    from ratatool_spark.operators.unigram import segment_docs

    df, words, vocab = _fixture(spark)
    vp = {r["piece"]: r["p"] for r in vocab.collect()}
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"], r["n_oov"])
        for r in segment_docs(df, vocab).collect()
    }
    segs = {
        w: (_ref_viterbi(w, vp) if len(w) <= 16 else None)
        for w in {t for line in _TEXTS for t in line.split()}
    }  # words past the 16-char training cap are OOV by policy
    for i, line in enumerate(_TEXTS):
        ws = line.split()
        assert out[i][0] == len(ws)
        assert out[i][1] == sum(
            len(segs[w]) for w in ws if segs[w] is not None
        )
        assert out[i][2] == sum(1 for w in ws if segs[w] is None)
    extra = spark.createDataFrame(
        [(99, "nation " + "q" * 20), (100, "   ")],
        "doc_id long, text string",
    )
    out2 = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"], r["n_oov"])
        for r in segment_docs(extra, vocab).collect()
    }
    assert out2[99] == (2, len(_ref_viterbi("nation", vp)), 1)
    assert out2[100] == (0, 0, 0)


def test_cli_unigram_train_and_segment(spark, tmp_path, capsys):
    from ratatool_spark.cli import main as cli_main
    from ratatool_spark.sources.io import write_table

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )
    src = str(tmp_path / "docs.parquet")
    write_table(df, src)
    vocab_p = str(tmp_path / "vocab.parquet")
    cli_main([
        "unigramTrain", "--input", src, "--output", vocab_p,
        "--vocabSize", "24", "--maxPieceLen", "5", "--emRounds", "1",
    ])
    vocab = spark.read.parquet(vocab_p)
    assert {"piece", "p", "logp"} <= set(vocab.columns)
    assert vocab.count() <= 24
    out_p = str(tmp_path / "seg.parquet")
    cli_main([
        "unigramSegment", "--input", src, "--output", out_p,
        "--vocab", vocab_p,
    ])
    out = spark.read.parquet(out_p)
    assert out.count() == len(_TEXTS)
    assert out.where("n_pieces < n_tokens").count() == 0
