"""Distributed logistic-regression training with bit-reproducible
fixed-point gradient descent — the gradient-trained tier of the
classifier family (`corpus.train_quality_weights` is the closed-form
Naive-Bayes tier; `fuzzy.fellegi_sunter_em` the EM tier; this one
learns feature WEIGHTS by iterative optimization, the fastText-style
linear quality/language classifier shape).

Scale shape: per iteration exactly ONE aggregation pass over the data —
each row contributes its quantized residual times its integer features,
and the gradient is the exact integer sum of those products (map-side
combinable, order-independent, no driver-side data). The weight update
is driver arithmetic on F+1 numbers. T iterations = T jobs over a
cached feature frame, the `train_centroids_exact` / `bpe_learn`
pattern.

Bit-reproducibility across engines and partitionings (what lets a SQL
oracle replay training exactly):

* features are exact INTEGERS (counts: chars, words, occurrences);
  per-row work computes the margin ``z = w0 + Σ wᵢ·(fᵢ/cᵢ)`` with one
  fixed left-to-right float op sequence — deterministic because no
  cross-row float accumulation happens;
* the sigmoid is the "fast sigmoid" rational approximation
  ``σ̂(z) = 0.5 + z / (2·(1+|z|))`` — pure arithmetic (IEEE-identical
  in every engine), monotone, in (0,1). ``exp()`` is deliberately
  avoided: libm implementations differ in the last ulp, which would
  break cross-engine replay;
* the residual ``r = σ̂(z) − y`` is snapped to an integer grid
  ``q = floor(r·S)`` and the ONLY cross-row reduction is the exact
  integer sum ``Σ q·fᵢ`` (DECIMAL(38,0) — associative, partitioning
  can't change it);
* the update ``wᵢ ← wᵢ − lr·G/(S·n·cᵢ)`` is one fixed float op
  sequence per weight per iteration.

The fast-sigmoid gradient is a standard surrogate (same sign, same
zero as the logistic gradient); with few iterations and per-feature
scaling it converges to a useful separator, and the point here is the
REPRODUCIBLE distributed training loop, not squeezing the last AUC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(
    feats: list[str], scales: list[float], weights: list[float]
) -> Column:
    """z = w0 + Σ wᵢ₊₁·(fᵢ/cᵢ), folded left-to-right (fixed op order)."""
    z = F.lit(float(weights[0]))
    for i, (f, c) in enumerate(zip(feats, scales)):
        z = z + F.lit(float(weights[i + 1])) * (
            F.col(f).cast("double") / F.lit(float(c))
        )
    return z


def fast_sigmoid(z: Column) -> Column:
    """σ̂(z) = 0.5 + z / (2·(1+|z|)) — the rational sigmoid surrogate
    (monotone, (0,1), exactly 0.5 at 0); pure IEEE arithmetic so every
    engine computes the identical double."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def lr_score(
    df: DataFrame,
    feature_cols: list[str],
    scales: list[float],
    weights: list[float],
    out_col: str = "score",
) -> DataFrame:
    """Score rows with a trained model: σ̂(margin) in (0,1)."""
    return df.withColumn(
        out_col, fast_sigmoid(_margin(feature_cols, scales, weights))
    )


def train_lr_fixed_point(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    scales: list[float] | None = None,
    lr: float = 1.0,
    n_iters: int = 4,
    quant: int = 10**9,
) -> list[float]:
    """Train logistic-regression weights ``[bias, w_1..w_F]`` by
    ``n_iters`` full-batch gradient-descent steps. ``feature_cols`` must
    be exact integer counts; ``scales`` (default 1.0 each) bring each
    feature to O(1) so one learning rate fits all. Weights start at 0
    (σ̂ = 0.5: maximal gradient, no tie-break sensitivity).

    Per iteration: one aggregation computing ``n`` and the exact integer
    gradient sums ``Gᵢ = Σ floor((σ̂(z)−y)·quant)·fᵢ`` (bias: fᵢ = 1),
    then the driver-side update ``wᵢ −= lr·float(Gᵢ)/(quant·n·cᵢ)``
    with the denominator multiplied as doubles in fixed order (so a
    100 TB ``n`` cannot overflow an integer product). Every value any
    engine must reproduce is either an exact integer or the result of a
    pinned float op sequence — the ``quality_lr_trained`` gate's DuckDB
    oracle replays all iterations in SQL and matches bit-for-bit."""
    nf = len(feature_cols)
    if nf == 0:
        raise ValueError("need at least one feature column")
    scales = [1.0] * nf if scales is None else [float(c) for c in scales]
    if len(scales) != nf:
        raise ValueError(f"scales length {len(scales)} != {nf} features")
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")

    base = df.select(
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("int").alias("__y"),
    ).localCheckpoint(eager=False)

    w = [0.0] * (nf + 1)
    for _ in range(n_iters):
        z = _margin(feature_cols, scales, w)
        q = F.floor(
            (fast_sigmoid(z) - F.col("__y").cast("double"))
            * F.lit(float(quant))
        ).cast("decimal(38,0)")
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("g0"),
        ] + [
            F.sum(q * F.col(f).cast("decimal(38,0)")).alias(f"g{i + 1}")
            for i, f in enumerate(feature_cols)
        ]
        row = base.agg(*aggs).first()
        n = int(row["n"])
        if n == 0:
            raise ValueError("empty training frame")
        w[0] = w[0] - lr * (
            float(row["g0"]) / (float(quant) * float(n))
        )
        for i in range(nf):
            w[i + 1] = w[i + 1] - lr * (
                float(row[f"g{i + 1}"])
                / (float(quant) * float(n) * float(scales[i]))
            )
    return w
