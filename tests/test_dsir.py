"""DSIR importance weighting + Gumbel-top-k selection."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.corpus import (
    build_token_freqs,
    dsir_select,
    dsir_weights,
)

S = 0.5


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "good good signal"),
            (2, "noise noise noise"),
            (3, "good noise"),
            (4, ""),  # token-free: every-row guarantee
        ],
        "doc_id long, text string",
    )


def _target(spark):
    # the target distribution loves "good"
    return spark.createDataFrame(
        [(10, "good good good signal")], "doc_id long, text string"
    )


def _py_weights(docs, target_toks, raw_toks):
    import collections

    tf = collections.Counter(target_toks)
    rf = collections.Counter(raw_toks)
    td = sum(tf.values()) + S * (len(tf) + 1)
    rd = sum(rf.values()) + S * (len(rf) + 1)
    out = {}
    for did, text in docs:
        toks = [t for t in text.strip().split(" ") if t]
        if not toks:
            out[did] = (0, None)
            continue
        lr = sum(
            math.log((tf.get(t, 0) + S) / td) - math.log((rf.get(t, 0) + S) / rd)
            for t in toks
        )
        out[did] = (len(toks), lr)
    return out


def test_dsir_weights_match_python_replay(spark):
    docs = _docs(spark)
    w = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_weights(
            docs, build_token_freqs(_target(spark)), build_token_freqs(docs)
        ).collect()
    }
    raw_toks = "good good signal noise noise noise good noise".split()
    want = _py_weights(
        [(1, "good good signal"), (2, "noise noise noise"),
         (3, "good noise"), (4, "")],
        "good good good signal".split(),
        raw_toks,
    )
    assert set(w) == {1, 2, 3, 4}
    for did, (n, lr) in want.items():
        assert w[did][0] == n
        if lr is None:
            assert w[did][1] is None
        else:
            assert w[did][1] == pytest.approx(lr)
    # target-like doc outranks pool-like doc
    assert w[1][1] > w[2][1]


def test_dsir_select_gumbel_topk_deterministic(spark):
    docs = _docs(spark)
    tf, rf = build_token_freqs(_target(spark)), build_token_freqs(docs)
    a = [r["doc_id"] for r in dsir_select(docs, tf, rf, 2, seed=7).collect()]
    b = [r["doc_id"] for r in dsir_select(docs, tf, rf, 2, seed=7).collect()]
    assert a == b and len(a) == 2
    # python replay of the gumbel keys
    w = {r["doc_id"]: r["log_ratio"]
         for r in dsir_weights(docs, tf, rf).collect()}
    keys = {}
    for did, lr in w.items():
        if lr is None:
            continue
        h = int(hashlib.md5(f"7\x01{did}".encode()).hexdigest()[:15], 16)
        u = h / float(1 << 60)
        keys[did] = lr + (-math.log(-math.log(u)))
    want = [d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))][:2]
    assert a == want
    # sample_key matches the replay
    got_keys = {r["doc_id"]: r["sample_key"]
                for r in dsir_select(docs, tf, rf, 4, seed=7).collect()}
    for d in want:
        assert got_keys[d] == pytest.approx(keys[d])


def test_dsir_tokenless_docs_order_last(spark):
    docs = _docs(spark)
    tf, rf = build_token_freqs(_target(spark)), build_token_freqs(docs)
    out = [r["doc_id"] for r in dsir_select(docs, tf, rf, 4).collect()]
    assert out[-1] == 4  # the empty doc only once scored docs exhausted
    assert set(out) == {1, 2, 3, 4}


def test_dsir_rejects_bad_smoothing(spark):
    docs = _docs(spark)
    f = build_token_freqs(docs)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_weights(docs, f, f, smoothing=0.0)


def test_cli_dsir_select(spark, tmp_path):
    from ratatool_spark.cli import main

    docs, target = _docs(spark), _target(spark)
    dp, tp, rp = str(tmp_path / "d"), str(tmp_path / "t"), str(tmp_path / "r")
    docs.write.parquet(dp)
    build_token_freqs(target).write.parquet(tp)
    build_token_freqs(docs).write.parquet(rp)
    out = str(tmp_path / "out")
    assert main([
        "dsirSelect", "--input", dp, "--targetFreqs", tp, "--rawFreqs", rp,
        "--output", out, "--n", "2", "--seed", "7",
    ]) == 0
    got = [r["doc_id"] for r in
           spark.read.parquet(out).orderBy(F.desc("sample_key")).collect()]
    want = [r["doc_id"] for r in dsir_select(
        docs, build_token_freqs(target), build_token_freqs(docs), 2, seed=7
    ).collect()]
    assert got == want


def test_dsir_hashed_weights_match_python_replay(spark):
    import collections

    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        dsir_hashed_weights,
    )

    B = 64
    docs = spark.createDataFrame(
        [(1, "good signal good signal"), (2, "noise bad noise"), (3, "")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(9, "good signal good")], "doc_id long, text string"
    )
    tf = build_hashed_ngram_freqs(tgt, n=2, n_buckets=B)
    rf = build_hashed_ngram_freqs(docs, n=2, n_buckets=B)
    got = {r["doc_id"]: (r["n_features"], r["log_ratio"])
           for r in dsir_hashed_weights(docs, tf, rf, n=2, n_buckets=B).collect()}

    def bigrams(text):
        ws = [w for w in text.strip().split(" ") if w]
        return [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]

    def bucket(g):
        return int(hashlib.md5(f"0\x01{g}".encode()).hexdigest()[:15], 16) % B

    texts = {1: "good signal good signal", 2: "noise bad noise", 3: ""}
    tcnt = collections.Counter(bucket(g) for g in bigrams("good signal good"))
    rcnt = collections.Counter(
        bucket(g) for t in texts.values() for g in bigrams(t)
    )
    td = sum(tcnt.values()) + S * B
    rd = sum(rcnt.values()) + S * B
    for did, text in texts.items():
        bs = [bucket(g) for g in bigrams(text)]
        if not bs:
            assert got[did] == (0, None)
        else:
            lr = sum(
                math.log((tcnt.get(b, 0) + S) / td)
                - math.log((rcnt.get(b, 0) + S) / rd)
                for b in bs
            )
            assert got[did][0] == len(bs)
            assert got[did][1] == pytest.approx(lr)


def test_hashed_ngram_freqs_short_docs_empty(spark):
    from ratatool_spark.operators.corpus import build_hashed_ngram_freqs

    # docs shorter than n produce NO grams (sequence(1,0) descends in
    # Spark -- the guard pins the empty case)
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert build_hashed_ngram_freqs(df, n=2, n_buckets=8).count() == 0


def test_quality_classifier_weights_complete_and_separates(spark):
    """train_quality_weights emits one row per bucket (complete closed
    feature space); quality_classifier_score gives higher prob to docs
    that look like the positive class, prob = sigmoid(logit) exactly,
    and feature-free docs keep the every-row NULL contract."""
    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        quality_classifier_score,
        train_quality_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "good clean prose flows here", "pos"),
            (2, "good clean text reads well", "pos"),
            (3, "spam junk garbage spam junk", "neg"),
            (4, "junk spam garbage noise junk", "neg"),
            (5, "good clean prose reads well", "?"),
            (6, "spam garbage noise spam junk", "?"),
            (7, "solo", "?"),  # sub-bigram: 0 features
        ],
        "doc_id long, text string, label string",
    )
    B = 64
    pos = build_hashed_ngram_freqs(docs.where(F.col("label") == "pos"), n=2, n_buckets=B)
    neg = build_hashed_ngram_freqs(docs.where(F.col("label") == "neg"), n=2, n_buckets=B)
    w = train_quality_weights(pos, neg, n_buckets=B)
    rows = w.collect()
    assert len(rows) == B
    assert sorted(r["bucket"] for r in rows) == list(range(B))
    assert all(r["weight"] is not None for r in rows)

    out = {
        r["doc_id"]: r
        for r in quality_classifier_score(docs, w, n_buckets=B, n=2).collect()
    }
    assert len(out) == 7
    assert out[5]["prob"] > 0.5 > out[6]["prob"]  # separates the classes
    assert out[7]["n_features"] == 0 and out[7]["logit"] is None and out[7]["prob"] is None
    for r in out.values():
        if r["logit"] is not None:
            assert abs(r["prob"] - 1.0 / (1.0 + math.exp(-r["logit"]))) < 1e-12

    # duplicate weight rows must not fan out the feature join
    out_dup = {
        r["doc_id"]: r
        for r in quality_classifier_score(
            docs, w.unionAll(w), n_buckets=B, n=2
        ).collect()
    }
    for k in out:
        assert out_dup[k]["n_features"] == out[k]["n_features"]
        assert out_dup[k]["logit"] == out[k]["logit"]


def test_nb_classify_separable_and_prior_fallback(spark):
    """Multi-class NB: on a class-separable vocabulary the held-out docs
    classify correctly; a feature-free doc falls back to the prior
    argmax with n_features = 0; the weight grid is complete
    (n_labels x n_buckets)."""
    from ratatool_spark.operators.corpus import (
        nb_classify,
        train_nb_class_weights,
    )

    train = spark.createDataFrame(
        [
            (1, "gato perro casa sol", "es"),
            (2, "perro sol gato luna", "es"),
            (3, "gato casa luna perro", "es"),
            (4, "cat dog house sun", "en"),
            (5, "dog sun cat moon", "en"),
            (6, None, None),  # unlabeled: excluded from training
        ],
        "doc_id long, text string, lang string",
    )
    B = 128
    w, pri = train_nb_class_weights(train, "lang", n=1, n_buckets=B)
    assert w.count() == 2 * B  # complete grid per label
    probe = spark.createDataFrame(
        [
            (10, "gato luna sol"),
            (11, "dog cat moon"),
            (12, ""),  # feature-free
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nb_classify(probe, w, pri, B, n=1).collect()}
    assert got[10]["pred_label"] == "es"
    assert got[11]["pred_label"] == "en"
    # prior argmax: es has 3 training docs vs en's 2
    assert got[12]["pred_label"] == "es" and got[12]["n_features"] == 0
    import math as m

    assert abs(got[12]["score"] - m.log(3 / 5)) < 1e-12


def test_classifier_model_roundtrip(spark, tmp_path):
    """save/load round-trip: scores from the loaded artifact (params
    taken from the sidecar) equal scores from the in-memory model."""
    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        load_classifier_model,
        nb_classify,
        quality_classifier_score,
        save_classifier_model,
        train_nb_class_weights,
        train_quality_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "good clean prose flows here", "pos"),
            (2, "spam junk garbage spam junk", "neg"),
            (3, "good clean text reads well", "pos"),
        ],
        "doc_id long, text string, label string",
    )
    B = 64
    pos = build_hashed_ngram_freqs(docs.where(F.col("label") == "pos"), n=2, n_buckets=B)
    neg = build_hashed_ngram_freqs(docs.where(F.col("label") == "neg"), n=2, n_buckets=B)
    qw = train_quality_weights(pos, neg, n_buckets=B)
    qp = str(tmp_path / "qmodel")
    save_classifier_model(qp, qw, {"n": 2, "n_buckets": B, "seed": 0})
    w2, pri2, params = load_classifier_model(spark, qp)
    assert pri2 is None and params["n_buckets"] == B
    direct = {r["doc_id"]: r["logit"]
              for r in quality_classifier_score(docs, qw, n_buckets=B, n=2).collect()}
    loaded = {r["doc_id"]: r["logit"]
              for r in quality_classifier_score(
                  docs, w2, n_buckets=params["n_buckets"], n=params["n"],
                  seed=params["seed"]).collect()}
    assert direct == loaded

    nw, npri = train_nb_class_weights(docs, "label", n=1, n_buckets=B)
    np_ = str(tmp_path / "nbmodel")
    save_classifier_model(np_, nw, {"n": 1, "n_buckets": B, "seed": 0}, priors_df=npri)
    w3, pri3, params3 = load_classifier_model(spark, np_)
    assert pri3 is not None
    d1 = {(r["doc_id"], r["pred_label"])
          for r in nb_classify(docs, nw, npri, B, n=1).collect()}
    d2 = {(r["doc_id"], r["pred_label"])
          for r in nb_classify(docs, w3, pri3, params3["n_buckets"],
                               n=params3["n"], seed=params3["seed"]).collect()}
    assert d1 == d2
