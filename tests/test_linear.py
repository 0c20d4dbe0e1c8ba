"""Fixed-point logistic regression (operators/linear): exact-integer
gradient accumulation, partitioning invariance, fast-sigmoid scoring."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.linear import (
    fast_sigmoid,
    lr_score,
    train_lr_fixed_point,
)


def _frame(spark, n=400):
    """Label correlates positively with f1 and negatively with f2."""
    return spark.range(n).select(
        (F.col("id") % 97).cast("long").alias("f1"),
        ((F.col("id") * 7) % 53).cast("long").alias("f2"),
        ((F.col("id") % 97) > 48).cast("int").alias("y"),
    )


def test_weight_signs_follow_correlation(spark):
    w = train_lr_fixed_point(
        _frame(spark), ["f1", "f2"], "y", scales=[97.0, 53.0], n_iters=4
    )
    assert len(w) == 3
    assert w[1] > 0  # f1 drives the label up
    assert abs(w[1]) > abs(w[2])  # f2 is noise


def test_partitioning_invariance_bitwise(spark):
    """The gradient is an exact integer sum, so weights are IDENTICAL
    (==, not approx) under any repartitioning — the fixed-point claim."""
    df = _frame(spark)
    w1 = train_lr_fixed_point(df, ["f1", "f2"], "y", n_iters=3)
    w2 = train_lr_fixed_point(
        df.repartition(17, "f2"), ["f1", "f2"], "y", n_iters=3
    )
    w3 = train_lr_fixed_point(df.coalesce(1), ["f1", "f2"], "y", n_iters=3)
    assert w1 == w2 == w3


def test_training_reduces_error(spark):
    df = _frame(spark)
    w = train_lr_fixed_point(df, ["f1"], "y", scales=[97.0], n_iters=8)
    scored = lr_score(df, ["f1"], [97.0], w)
    acc = (
        scored.select(
            ((F.col("score") >= 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc > 0.8  # separable by construction


def test_fast_sigmoid_bounds_and_midpoint(spark):
    row = spark.range(1).select(
        fast_sigmoid(F.lit(0.0)).alias("mid"),
        fast_sigmoid(F.lit(1e9)).alias("hi"),
        fast_sigmoid(F.lit(-1e9)).alias("lo"),
    ).first()
    assert row["mid"] == 0.5
    assert 0.999 < row["hi"] < 1.0
    assert 0.0 < row["lo"] < 0.001


def test_cli_logreg_train_then_score(spark, tmp_path, capsys):
    from ratatool_spark.cli import main

    inp = str(tmp_path / "in")
    _frame(spark).write.parquet(inp)
    model = str(tmp_path / "model.json")
    assert main([
        "logreg", "--mode", "train", "--input", inp,
        "--features", "f1,f2", "--label", "y",
        "--scales", "97,53", "--iters", "3", "--model", model,
    ]) == 0
    out = str(tmp_path / "scored")
    assert main([
        "logreg", "--mode", "score", "--input", inp,
        "--features", "f1,f2", "--model", model, "--output", out,
    ]) == 0
    scored = spark.read.parquet(out)
    assert "score" in scored.columns
    stats = scored.agg(F.min("score"), F.max("score")).first()
    assert 0.0 < stats[0] and stats[1] < 1.0


def test_validation_errors(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="at least one feature"):
        train_lr_fixed_point(df, [], "y")
    with pytest.raises(ValueError, match="scales length"):
        train_lr_fixed_point(df, ["f1"], "y", scales=[1.0, 2.0])
    with pytest.raises(ValueError, match="n_iters"):
        train_lr_fixed_point(df, ["f1"], "y", n_iters=0)
    with pytest.raises(ValueError, match="empty"):
        train_lr_fixed_point(df.where(F.lit(False)), ["f1"], "y")
