"""Gate + oracle twins for the fixed-point logistic-regression trainer
(operators/linear). The DuckDB oracle REPLAYS TRAINING ITSELF — every
gradient-descent iteration is a CTE pair (integer gradient sums over
the data, then the scalar weight update), so the gate certifies the
whole distributed training loop, not just a final scoring pass. This
works because the trainer's cross-row reduction is an exact integer sum
and every float step is a pinned op sequence (see the operator
docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F

# model hyperparameters shared by the Spark gate and the SQL generator
_FEATS = ["f1", "f2", "f3"]  # n_chars, n_spaces, n_'e'
_SCALES = [256.0, 64.0, 64.0]
_LR = 1.0
_ITERS = 3
_QUANT = 10**9


def _doc_features(spark, sf_dir):
    """(f1, f2, f3, y, lang): exact integer text counts + the lang='en'
    label — count features both engines compute identically."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    no_sp = F.length(F.col("text")) - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    no_e = F.length(F.col("text")) - F.length(
        F.replace(F.col("text"), F.lit("e"), F.lit(""))
    )
    return docs.select(
        F.col("n_chars").cast("long").alias("f1"),
        no_sp.cast("long").alias("f2"),
        no_e.cast("long").alias("f3"),
        (F.col("lang") == "en").cast("int").alias("y"),
        "lang",
    )


def _q_quality_lr_trained(spark, sf_dir):
    """Gradient-descent-trained quality/language classifier
    (operators/linear.train_lr_fixed_point): 3 full-batch iterations
    over integer text features of `documents`, label = (lang = 'en').
    Returns the learned weights; the oracle replays all three
    iterations in SQL and must land on the same doubles (rounded to 8
    for ulp insurance on the final division chain)."""
    from ratatool_spark.operators.linear import train_lr_fixed_point

    feats = _doc_features(spark, sf_dir)
    w = train_lr_fixed_point(
        feats, _FEATS, "y", scales=_SCALES, lr=_LR, n_iters=_ITERS,
        quant=_QUANT,
    )
    names = ["bias", "n_chars", "n_spaces", "n_e"]
    rows = spark.range(len(w)).select(F.col("id").cast("int").alias("i"))
    name_expr = None
    w_expr = None
    for i, (nm, wi) in enumerate(zip(names, w)):
        cond = F.col("i") == i
        name_expr = (
            F.when(cond, F.lit(nm))
            if name_expr is None
            else name_expr.when(cond, F.lit(nm))
        )
        w_expr = (
            F.when(cond, F.lit(wi))
            if w_expr is None
            else w_expr.when(cond, F.lit(wi))
        )
    return rows.select(
        name_expr.alias("feature"), F.round(w_expr, 8).alias("weight")
    )


def _feats_cte() -> str:
    return """feats AS (
  SELECT CAST(n_chars AS BIGINT) AS f1,
         LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS f2,
         LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS f3,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         lang
  FROM documents
)"""


def _train_ctes(n_iters: int = _ITERS) -> str:
    """w0 .. w{n}: one (gradient, update) CTE pair per GD iteration,
    mirroring train_lr_fixed_point's float op order exactly."""
    q = f"{float(_QUANT):.1f}"
    parts = [_feats_cte()]
    parts.append(
        "w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,"
        " CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3)"
    )
    margin = (
        "w.w0 + w.w1*(CAST(f1 AS DOUBLE)/256.0)"
        " + w.w2*(CAST(f2 AS DOUBLE)/64.0)"
        " + w.w3*(CAST(f3 AS DOUBLE)/64.0)"
    )
    for k in range(1, n_iters + 1):
        parts.append(f"""g{k} AS (
  SELECT COUNT(*) AS n, SUM(qq) AS g0, SUM(qq*f1) AS g1,
         SUM(qq*f2) AS g2, SUM(qq*f3) AS g3
  FROM (
    SELECT f1, f2, f3,
           CAST(FLOOR(((0.5 + z/(2.0*(1.0+ABS(z)))) - CAST(y AS DOUBLE))
                      * {q}) AS HUGEINT) AS qq
    FROM (SELECT f1, f2, f3, y, {margin} AS z FROM feats, w{k - 1} w)
  )
)""")
        upd = [
            f"w.w0 - {_LR}*(CAST(g.g0 AS DOUBLE)/({q}*CAST(g.n AS DOUBLE)))"
            " AS w0"
        ]
        for i, c in enumerate(_SCALES):
            upd.append(
                f"w.w{i + 1} - {_LR}*(CAST(g.g{i + 1} AS DOUBLE)"
                f"/(({q}*CAST(g.n AS DOUBLE))*{c})) AS w{i + 1}"
            )
        parts.append(
            f"w{k} AS (SELECT {', '.join(upd)} FROM w{k - 1} w, g{k} g)"
        )
    return "WITH " + ",\n".join(parts)


def _sql_quality_lr_trained(n_iters: int = _ITERS) -> str:
    names = ["bias", "n_chars", "n_spaces", "n_e"]
    finals = "\nUNION ALL\n".join(
        f"SELECT '{nm}' AS feature, ROUND(w{i}, 8) AS weight"
        f" FROM w{n_iters}"
        for i, nm in enumerate(names)
    )
    return _train_ctes(n_iters) + "\n" + finals


def _q_quality_lr_scored(spark, sf_dir):
    """Train THEN score (the composition a curation pipeline runs): the
    3-iteration model scores every document; per lang, how many docs
    the classifier calls 'en' (σ̂ ≥ 0.5) and the exact quantized score
    mass — the oracle retrains in SQL and scores with ITS weights, so
    any training drift shows up as a scoring mismatch too."""
    from ratatool_spark.operators.linear import (
        lr_score,
        train_lr_fixed_point,
    )

    feats = _doc_features(spark, sf_dir)
    w = train_lr_fixed_point(
        feats, _FEATS, "y", scales=_SCALES, lr=_LR, n_iters=_ITERS,
        quant=_QUANT,
    )
    scored = lr_score(feats, _FEATS, _SCALES, w)
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("score") >= 0.5).cast("int")).alias("n_pred_en"),
        F.sum(
            F.floor(F.col("score") * F.lit(1000000.0)).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("sum_score_q"),
    )


def _sql_quality_lr_scored(n_iters: int = _ITERS) -> str:
    margin = (
        "w.w0 + w.w1*(CAST(f1 AS DOUBLE)/256.0)"
        " + w.w2*(CAST(f2 AS DOUBLE)/64.0)"
        " + w.w3*(CAST(f3 AS DOUBLE)/64.0)"
    )
    return f"""{_train_ctes(n_iters)},
scored AS (
  SELECT lang, (0.5 + z/(2.0*(1.0+ABS(z)))) AS score
  FROM (SELECT f1, f2, f3, lang, {margin} AS z
        FROM feats, w{n_iters} w)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_en,
       CAST(SUM(CAST(FLOOR(score * 1000000.0) AS HUGEINT)) AS BIGINT)
         AS sum_score_q
FROM scored
GROUP BY lang
"""
