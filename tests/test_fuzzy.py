"""Blocked fuzzy join (entity resolution)."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.fuzzy import fuzzy_join


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, "b1", "alice smith"),
            (2, "b1", "bob jones"),
            (3, "b2", "carol white"),
            (4, "b3", "dan brown"),
        ],
        "lid long, blk string, name string",
    )
    right = spark.createDataFrame(
        [
            (11, "b1", "alice smyth"),   # 1 edit of 1 -> matches
            (12, "b1", "zzzzzzzzz"),     # garbage, same block
            (13, "b2", "carol white"),   # exact
            (14, "b9", "dan brown"),     # exact text but different block
        ],
        "rid long, blk string, name string",
    )
    return left, right


def test_fuzzy_join_blocks_and_threshold(spark):
    left, right = _sides(spark)
    out = {(r["lid"], r["rid"]): r["sim"] for r in fuzzy_join(
        left, right, "lid", "rid", "blk", [("name", "name")],
        threshold=0.8,
    ).collect()}
    # alice~alice (1 edit / 11 chars), carol exact; dan never pairs
    # (blocking), garbage never passes the threshold
    assert set(out) == {(1, 11), (3, 13)}
    assert out[(3, 13)] == 1.0
    assert out[(1, 11)] == pytest.approx(1 - 1 / 11)


def test_fuzzy_join_keep_best_deterministic(spark):
    left = spark.createDataFrame([(1, "b", "aaaa")], "lid long, blk string, name string")
    right = spark.createDataFrame(
        [(21, "b", "aaaa"), (22, "b", "aaaa"), (23, "b", "aaab")],
        "rid long, blk string, name string",
    )
    out = fuzzy_join(
        left, right, "lid", "rid", "blk", [("name", "name")],
        threshold=0.5, keep_best=True,
    ).collect()
    # two perfect ties -> the smaller right id wins
    assert [(r["lid"], r["rid"], r["sim"]) for r in out] == [(1, 21, 1.0)]


def test_fuzzy_join_block_size_guard_drops_both_sides(spark):
    left = spark.createDataFrame(
        [(i, "hot", "x") for i in range(5)] + [(99, "cold", "y")],
        "lid long, blk string, name string",
    )
    right = spark.createDataFrame(
        [(100, "hot", "x"), (101, "cold", "y")],
        "rid long, blk string, name string",
    )
    out = fuzzy_join(
        left, right, "lid", "rid", "blk", [("name", "name")],
        threshold=0.9, max_block_size=4,
    ).collect()
    # the hot block (5 on the left) is dropped entirely, even though the
    # right side held only one row of it
    assert [(r["lid"], r["rid"]) for r in out] == [(99, 101)]


def test_fuzzy_join_token_jaccard_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, "b", "red green blue"), (2, "b", None)],
        "lid long, blk string, name string",
    )
    right = spark.createDataFrame(
        [(11, "b", "blue red yellow"), (12, "b", "anything")],
        "rid long, blk string, name string",
    )
    out = {(r["lid"], r["rid"]): r["sim"] for r in fuzzy_join(
        left, right, "lid", "rid", "blk", [("name", "name")],
        method="token_jaccard", threshold=0.4,
    ).collect()}
    # {red,green,blue} vs {blue,red,yellow}: 2/4; NULL scores 0 everywhere
    assert set(out) == {(1, 11)}
    assert out[(1, 11)] == pytest.approx(0.5)


def test_fuzzy_join_multi_column_mean(spark):
    left = spark.createDataFrame(
        [(1, "b", "abcd", "wxyz")], "lid long, blk string, a string, b string"
    )
    right = spark.createDataFrame(
        [(11, "b", "abcd", "wxyQ")], "rid long, blk string, a string, b string"
    )
    out = fuzzy_join(
        left, right, "lid", "rid", "blk", [("a", "a"), ("b", "b")],
        threshold=0.5,
    ).collect()
    assert out[0]["sim"] == pytest.approx((1.0 + 0.75) / 2)


def test_fuzzy_join_validates_args(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="compare_cols"):
        fuzzy_join(left, right, "lid", "rid", "blk", [])
    with pytest.raises(ValueError, match="method"):
        fuzzy_join(left, right, "lid", "rid", "blk", [("name", "name")],
                   method="soundexish")


def test_cli_fuzzy_join(spark, tmp_path):
    from ratatool_spark.cli import main

    left, right = _sides(spark)
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    out = str(tmp_path / "out")
    assert main([
        "fuzzyJoin", "--leftInput", lp, "--rightInput", rp,
        "--output", out, "--leftId", "lid", "--rightId", "rid",
        "--blockField", "blk", "--compare", "name:name",
        "--threshold", "0.8", "--keepBest",
    ]) == 0
    got = {(r["lid"], r["rid"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 11), (3, 13)}


def test_fuzzy_join_same_id_name_disambiguates(spark):
    left = spark.createDataFrame([(1, "b", "abcd")], "id long, blk string, name string")
    right = spark.createDataFrame([(9, "b", "abcd")], "id long, blk string, name string")
    out = fuzzy_join(
        left, right, "id", "id", "blk", [("name", "name")],
        threshold=0.5, keep_best=True,
    )
    assert out.columns == ["id_l", "id_r", "sim"]
    assert [(r["id_l"], r["id_r"]) for r in out.collect()] == [(1, 9)]


def test_fuzzy_join_empty_strings_score_zero(spark):
    left = spark.createDataFrame([(1, "b", "")], "lid long, blk string, name string")
    right = spark.createDataFrame([(9, "b", "")], "rid long, blk string, name string")
    # two blank fields must NOT link as a perfect match
    assert fuzzy_join(
        left, right, "lid", "rid", "blk", [("name", "name")], threshold=0.5
    ).count() == 0


# ------------------------------------------------ Fellegi-Sunter linkage


def test_fellegi_sunter_weights_and_nulls(spark):
    """Agreement adds log2(m/u), disagreement log2((1-m)/(1-u)), NULL on
    either side adds exactly 0 — replayed in python."""
    import math

    from ratatool_spark.operators.fuzzy import fellegi_sunter_links

    left = spark.createDataFrame(
        [(1, "b", "x", "p"), (2, "b", "x", None)],
        "lid long, blk string, f1 string, f2 string",
    )
    right = spark.createDataFrame(
        [(9, "b", "x", "p"), (8, "b", "y", "q")],
        "rid long, blk string, f1 string, f2 string",
    )
    m1, u1, m2, u2 = 0.9, 0.1, 0.8, 0.2
    out = {
        (r["lid"], r["rid"]): (r["score"], r["n_agree"])
        for r in fellegi_sunter_links(
            left, right, "lid", "rid", "blk",
            [("f1", "f1", m1, u1), ("f2", "f2", m2, u2)],
            threshold=-100.0,
        ).collect()
    }
    wa1, wd1 = math.log2(m1 / u1), math.log2((1 - m1) / (1 - u1))
    wa2, wd2 = math.log2(m2 / u2), math.log2((1 - m2) / (1 - u2))
    assert out[(1, 9)] == (wa1 + wa2, 2)        # full agreement
    assert out[(1, 8)] == (wd1 + wd2, 0)        # full disagreement
    assert out[(2, 9)] == (wa1 + 0.0, 1)        # NULL field: no evidence
    assert out[(2, 8)] == (wd1 + 0.0, 0)


def test_fellegi_sunter_validates_params(spark):
    import pytest as _pt

    from ratatool_spark.operators.fuzzy import fellegi_sunter_links

    df = spark.createDataFrame([(1, "b", "x")], "id long, blk string, f string")
    with _pt.raises(ValueError, match="at least one"):
        fellegi_sunter_links(df, df, "id", "id", "blk", [])
    with _pt.raises(ValueError, match="m must exceed u"):
        fellegi_sunter_links(
            df, df, "id", "id", "blk", [("f", "f", 0.1, 0.9)]
        )
    with _pt.raises(ValueError, match="in \\(0,1\\)"):
        fellegi_sunter_links(
            df, df, "id", "id", "blk", [("f", "f", 1.0, 0.1)]
        )


def test_fellegi_sunter_oversized_block_guard(spark):
    """A degenerate block past max_block_size drops from BOTH sides."""
    from ratatool_spark.operators.fuzzy import fellegi_sunter_links

    rows = [(i, "hot", "v") for i in range(20)] + [(100, "ok", "v")]
    df = spark.createDataFrame(rows, "id long, blk string, f string")
    out = fellegi_sunter_links(
        df, df, "id", "id", "blk", [("f", "f", 0.9, 0.1)],
        threshold=-10.0, max_block_size=10,
    ).collect()
    assert {(r["id_l"], r["id_r"]) for r in out} == {(100, 100)}


def test_fuzzy_join_multi_pass_blocking_recovers_drifted_block(spark):
    """A pair whose FIRST block key drifted (zip typo) must still link
    through the second pass (name soundex-ish key); a pair reachable via
    both passes is scored once (pair-level dedup before verify)."""
    from pyspark.sql import Row

    from ratatool_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [
            Row(lid=1, zip="94110", nm="JONES", name="alice jones"),
            Row(lid=2, zip="10001", nm="SMITH", name="bob smith"),
        ]
    )
    right = spark.createDataFrame(
        [
            # zip typo'd: only the nm pass can reach it
            Row(rid=101, zip="94II0", nm="JONES", name="alice jonez"),
            # both keys intact: reachable via BOTH passes -> one score row
            Row(rid=102, zip="10001", nm="SMITH", name="bob smith"),
        ]
    )
    single = fuzzy_join(
        left, right, "lid", "rid", "zip", [("name", "name")], threshold=0.8
    ).collect()
    assert {(r["lid"], r["rid"]) for r in single} == {(2, 102)}

    multi = fuzzy_join(
        left,
        right,
        "lid",
        "rid",
        ["zip", "nm"],
        [("name", "name")],
        threshold=0.8,
    ).collect()
    assert {(r["lid"], r["rid"]) for r in multi} == {(1, 101), (2, 102)}
    assert len(multi) == 2  # (2,102) reachable twice but scored once


def test_fellegi_sunter_multi_pass_blocking(spark):
    """Same multi-pass recall net on the probabilistic scorer."""
    from pyspark.sql import Row

    from ratatool_spark.operators.fuzzy import fellegi_sunter_links

    left = spark.createDataFrame(
        [Row(lid=1, b1="X", b2="P", v="42"), Row(lid=2, b1="Y", b2="Q", v="77")]
    )
    right = spark.createDataFrame(
        [
            Row(rid=11, b1="DRIFTED", b2="P", v="42"),
            Row(rid=12, b1="Y", b2="Q", v="77"),
        ]
    )
    out = fellegi_sunter_links(
        left,
        right,
        "lid",
        "rid",
        ["b1", "b2"],
        [("v", "v", 0.9, 0.01)],
        threshold=0.0,
    ).collect()
    assert {(r["lid"], r["rid"]) for r in out} == {(1, 11), (2, 12)}
    assert len(out) == 2


def test_fuzzy_join_multi_pass_rejects_bad_blocks(spark):
    from pyspark.sql import Row

    import pytest as _pt

    from ratatool_spark.operators.fuzzy import fuzzy_join

    df = spark.createDataFrame([Row(id=1, b="x", name="n")])
    with _pt.raises(ValueError, match="at least one blocking key"):
        fuzzy_join(df, df, "id", "id", [], [("name", "name")])
    with _pt.raises(ValueError, match="duplicate blocking keys"):
        fuzzy_join(df, df, "id", "id", ["b", "b"], [("name", "name")])


def test_fellegi_sunter_em_learns_separating_weights(spark):
    """On a separable fixture (true twins agree on v, random pairs
    don't), EM must drive m toward 1 and u toward the random agreement
    rate, and lam toward the match fraction of candidate pairs."""
    from pyspark.sql import Row

    from ratatool_spark.operators.fuzzy import (
        fellegi_sunter_em,
        fellegi_sunter_links,
    )

    # three fields for identifiability (Winkler: a 2-class latent model
    # needs >= 3 conditionally independent comparisons): v is unique per
    # entity (agrees only on twins), w/x agree on twins AND on ~1/5,
    # ~1/7 of random pairs
    n = 40
    left = spark.createDataFrame(
        [Row(lid=i, blk=i % 4, v=f"val{i}", w=f"w{i % 5}", x=f"x{i % 7}")
         for i in range(n)]
    )
    right = spark.createDataFrame(
        [Row(rid=i + 1000, blk=i % 4, v=f"val{i}", w=f"w{i % 5}",
             x=f"x{i % 7}")
         for i in range(n)]
    )
    model = fellegi_sunter_em(
        left, right, "lid", "rid", "blk",
        [("v", "v"), ("w", "w"), ("x", "x")], n_iters=8,
    )
    (m_v, u_v), (m_w, u_w), (m_x, u_x) = model["fields"]
    # v agrees only on the 40 true twins out of 400 block pairs
    assert m_v > 0.95 and u_v < 0.05
    # w/x also agree on a chunk of random pairs -> higher u
    assert m_w > 0.9 and u_w > 0.1
    assert m_x > 0.9 and u_x > 0.05
    assert 0.05 < model["lam"] < 0.2  # 40 / 400
    assert model["n_pairs"] == 400
    # trained weights slot straight into the scorer
    links = fellegi_sunter_links(
        left, right, "lid", "rid", "blk",
        [("v", "v", m_v, u_v)], threshold=1.0,
    ).collect()
    assert {(r["lid"], r["rid"]) for r in links} == {
        (i, i + 1000) for i in range(n)
    }


def test_fellegi_sunter_em_missing_fields_attest_nothing(spark):
    """A field that is NULL on every row must stay at its initial m/u
    (no pattern ever updates it) and not poison the other field."""
    from pyspark.sql import Row

    from ratatool_spark.operators.fuzzy import fellegi_sunter_em

    left = spark.createDataFrame(
        [Row(lid=i, blk=0, v=f"v{i}", miss=None) for i in range(6)],
        "lid int, blk int, v string, miss string",
    )
    right = spark.createDataFrame(
        [Row(rid=i, blk=0, v=f"v{i}", miss=None) for i in range(6)],
        "rid int, blk int, v string, miss string",
    )
    model = fellegi_sunter_em(
        left, right, "lid", "rid", "blk",
        [("v", "v"), ("miss", "miss")], n_iters=3,
    )
    m_miss, u_miss = model["fields"][1]
    assert (m_miss, u_miss) == (0.9, 0.1)  # untouched initials
    m_v, u_v = model["fields"][0]
    assert m_v > u_v


def test_fellegi_sunter_em_is_deterministic(spark):
    from pyspark.sql import Row

    from ratatool_spark.operators.fuzzy import fellegi_sunter_em

    left = spark.createDataFrame(
        [Row(lid=i, blk=i % 3, v=f"a{i % 7}") for i in range(30)]
    )
    right = spark.createDataFrame(
        [Row(rid=i, blk=i % 3, v=f"a{i % 5}") for i in range(30)]
    )
    args = (left, right, "lid", "rid", "blk", [("v", "v")])
    m1 = fellegi_sunter_em(*args)
    m2 = fellegi_sunter_em(*args)
    assert m1["lam"] == m2["lam"] and m1["fields"] == m2["fields"]


def test_cli_linkage_train_then_score(spark, tmp_path):
    """linkage --mode train persists an EM-trained model JSON; --mode
    score consumes it and links the twins."""
    import json

    from pyspark.sql import Row

    from ratatool_spark.cli import main

    n = 40
    left = spark.createDataFrame(
        [Row(lid=i, blk=i % 4, v=f"val{i}", w=f"w{i % 5}", x=f"x{i % 7}")
         for i in range(n)]
    )
    right = spark.createDataFrame(
        [Row(rid=i + 1000, blk=i % 4, v=f"val{i}", w=f"w{i % 5}",
             x=f"x{i % 7}")
         for i in range(n)]
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    model_path = str(tmp_path / "model.json")
    assert main([
        "linkage", "--mode", "train", "--leftInput", lp,
        "--rightInput", rp, "--output", model_path,
        "--leftId", "lid", "--rightId", "rid", "--blockField", "blk",
        "--compare", "v:v,w:w,x:x", "--iters", "8",
    ]) == 0
    meta = json.loads(open(model_path).read())
    assert len(meta["fields"]) == 3
    assert meta["fields"][0]["m"] > 0.95  # v separates
    out = str(tmp_path / "links")
    assert main([
        "linkage", "--mode", "score", "--leftInput", lp,
        "--rightInput", rp, "--output", out,
        "--leftId", "lid", "--rightId", "rid", "--blockField", "blk",
        "--compare", "unused", "--model", model_path,
        "--threshold", "5.0",
    ]) == 0
    got = {(r["lid"], r["rid"]) for r in spark.read.parquet(out).collect()}
    assert got >= {(i, i + 1000) for i in range(n)}
