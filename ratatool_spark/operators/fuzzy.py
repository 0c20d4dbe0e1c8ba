"""Blocked fuzzy join — entity resolution / record linkage.

The missing sibling of the keyed diff (operators/diffy, BigDiffy.scala
parity): BigDiffy compares records that share an EXACT key; real datasets
often need to link records whose keys drifted (typos, re-keyed ids,
OCR/entry noise). The classic scalable shape is block-then-verify, the
same candidate-bounding discipline as the dedup family
(operators/dedup):

  1. **block** — one or MORE equality keys both sides can compute
     (phone/zip prefix, soundex, shingle band): candidates come from an
     EQUI-join per key, never an all-pairs comparison; multiple keys are
     independent recall passes whose candidates are unioned and deduped
     per pair before verification (a pair missed by a typo'd zip is
     still caught by the soundex pass);
  2. **guard** — blocks bigger than ``max_block_size`` on either side are
     dropped (with the violator set tiny and broadcastable), the same
     finite-frequency guard as ``ngram_jaccard_pairs``'s ``max_doc_freq``
     — a degenerate block ("UNKNOWN", empty string) would otherwise
     re-create the n² join this operator exists to avoid;
  3. **verify** — per candidate pair, JVM-side similarity expressions
     (no Python): normalized Levenshtein ratio
     ``1 - lev(a,b) / greatest(len(a), len(b), 1)`` or whitespace-token
     Jaccard; the overall score is the mean over the compared column
     pairs. Both are engine-portable (DuckDB: ``levenshtein``,
     ``list_intersect``), so the oracle gates values exactly.

At 100 TB both joins shuffle once on the block key with sizes bounded by
Σ_b |L_b|·|R_b| ≤ max_block_size · min(|L|,|R|); the guard converts an
adversarial block distribution into bounded work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

METHODS = ("lev_ratio", "token_jaccard")


def _block_cols(block_col: str | Sequence[str]) -> list[str]:
    cols = [block_col] if isinstance(block_col, str) else list(block_col)
    if not cols:
        raise ValueError("block_col needs at least one blocking key")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate blocking keys: {cols}")
    return cols


def _blocked_candidates(
    lsel: DataFrame,
    rsel: DataFrame,
    n_blocks: int,
    max_block_size: int | None,
) -> DataFrame:
    """Candidate pairs from one or more blocking passes.

    ``lsel``/``rsel`` carry ``__lid``/``__rid``, per-pass block keys
    ``__blk0..__blk{n-1}`` and the compare columns. Each pass is an
    equi-join on its own key; multi-pass candidates are unioned and
    deduped on (``__lid``, ``__rid``) BEFORE verification, so a pair
    reachable through several passes is scored once. The oversized-block
    guard applies per pass (a block too big under key 0 still
    contributes its rows through key 1 if those blocks are fine —
    passes are independent recall nets, per the multi-pass linkage
    practice: union of zip-prefix, soundex(name), ... candidates).
    NULL block keys never join (equi-join semantics) — a row with a
    missing key simply sits that pass out."""
    passes = []
    for i in range(n_blocks):
        lkey, rkey = f"__blk{i}", f"__rblk{i}"
        lp = lsel.where(F.col(lkey).isNotNull())
        rp = rsel.where(F.col(rkey).isNotNull())
        if max_block_size is not None:
            # blocks too big on EITHER side are dropped from BOTH: a
            # one-sided drop would silently halve the guard (pairs l x r)
            big = (
                lp.groupBy(F.col(lkey).alias("__b")).count()
                .unionByName(rp.groupBy(F.col(rkey).alias("__b")).count())
                .groupBy("__b")
                .agg(F.max("count").alias("__n"))
                .where(F.col("__n") > max_block_size)
                .select("__b")
            )
            lp = lp.join(F.broadcast(big), lp[lkey] == big["__b"], "left_anti")
            rp = rp.join(F.broadcast(big), rp[rkey] == big["__b"], "left_anti")
        keep_l = [c for c in lp.columns if not c.startswith("__blk")]
        keep_r = [c for c in rp.columns if not c.startswith("__rblk")]
        passes.append(
            lp.join(rp, lp[lkey] == rp[rkey]).select(*keep_l, *keep_r)
        )
    cand = passes[0]
    for p in passes[1:]:
        cand = cand.unionByName(p)
    if n_blocks > 1:
        cand = cand.dropDuplicates(["__lid", "__rid"])
    return cand


def _sim(lc: Column, rc: Column, method: str) -> Column:
    """Similarity in [0, 1] between two string columns; NULL *or empty*
    on either side scores 0 — a missing field can't attest a match, and
    CSV-style ingests encode missing as '' (two blank fields would
    otherwise score a perfect 1.0 and, under keep_best, outrank genuine
    partial matches)."""
    if method == "lev_ratio":
        s = F.lit(1.0) - F.levenshtein(lc, rc) / F.greatest(
            F.length(lc), F.length(rc), F.lit(1)
        )
    elif method == "token_jaccard":
        lt = F.array_distinct(F.split(lc, r"\s+"))
        rt = F.array_distinct(F.split(rc, r"\s+"))
        union = F.size(F.array_union(lt, rt))
        s = F.when(
            union > 0, F.size(F.array_intersect(lt, rt)) / union
        ).otherwise(F.lit(0.0))
    else:
        raise ValueError(f"unknown method {method!r} (use one of {METHODS})")
    populated = (F.length(lc) > 0) & (F.length(rc) > 0)
    return F.coalesce(
        F.when(populated, s.cast("double")).otherwise(F.lit(0.0)), F.lit(0.0)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_col: str | Sequence[str],
    compare_cols: list[tuple[str, str]],
    method: str = "lev_ratio",
    threshold: float = 0.85,
    keep_best: bool = False,
    max_block_size: int = 1000,
) -> DataFrame:
    """(left_id, right_id, sim) — candidate links whose mean column
    similarity reaches ``threshold``. ``block_col`` names one or more
    blocking keys existing on both sides (callers derive them: phone
    prefix, soundex, shingle band); ``compare_cols`` pairs
    (left_col, right_col) to verify.

    A LIST of block keys runs one blocking PASS per key and unions the
    candidates (deduped per pair before verify) — the standard
    multi-pass recall net: a single key misses pairs whose block field
    itself drifted (a typo'd zip), so production linkage unions e.g.
    zip-prefix ∪ soundex(name) candidates. Cost is one equi-join per
    pass plus one (lid, rid) dedup shuffle; the oversized-block guard
    applies per pass independently.

    ``keep_best=True`` keeps each left id's single best link (ties break
    on the smaller right id — deterministic), via WindowGroupLimit.
    ``max_block_size`` caps the per-side block population; oversized
    blocks are dropped on BOTH sides (the violator set is aggregated —
    tiny — and broadcast as an anti-join). Raise it consciously: the
    join cost envelope is max_block_size x the smaller side.

    When both sides key on the SAME column name (the common linkage
    case), the output disambiguates to ``<left_id>_l`` / ``<right_id>_r``
    — otherwise the result would carry two identically-named columns
    (unwritable) and keep_best's window would be ambiguous."""
    if not compare_cols:
        raise ValueError("fuzzy_join needs at least one compare_cols pair")
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold {threshold} outside [0, 1]")
    _sim(F.lit("a"), F.lit("a"), method)  # validate method eagerly
    out_left, out_right = left_id, right_id
    if left_id == right_id:
        out_left, out_right = f"{left_id}_l", f"{right_id}_r"
    if "sim" in (out_left, out_right):
        raise ValueError(
            "id output column named 'sim' collides with the score column "
            "— alias the id before joining"
        )

    blocks = _block_cols(block_col)
    lsel = left.select(
        F.col(left_id).alias("__lid"),
        *[F.col(b).alias(f"__blk{i}") for i, b in enumerate(blocks)],
        *[F.col(lc).alias(f"__l{i}") for i, (lc, _) in enumerate(compare_cols)],
    )
    rsel = right.select(
        F.col(right_id).alias("__rid"),
        *[F.col(b).alias(f"__rblk{i}") for i, b in enumerate(blocks)],
        *[F.col(rc).alias(f"__r{i}") for i, (_, rc) in enumerate(compare_cols)],
    )
    cand = _blocked_candidates(lsel, rsel, len(blocks), max_block_size)
    sims = [
        _sim(F.col(f"__l{i}"), F.col(f"__r{i}"), method)
        for i in range(len(compare_cols))
    ]
    total = sims[0]
    for s in sims[1:]:
        total = total + s
    score = total / F.lit(float(len(compare_cols)))
    out = (
        cand.select(
            F.col("__lid").alias(out_left),
            F.col("__rid").alias(out_right),
            score.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
    if keep_best:
        w = Window.partitionBy(out_left).orderBy(F.desc("sim"), F.col(out_right))
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out


def fellegi_sunter_links(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_col: str | Sequence[str],
    compares: list[tuple[str, str, float, float]],
    threshold: float = 0.0,
    max_block_size: int = 1000,
) -> DataFrame:
    """(left_id, right_id, score, n_agree) — probabilistic record
    linkage (Fellegi & Sunter, JASA 1969): over block-bounded candidate
    pairs, each compared field contributes its log2 likelihood ratio —
    ``log2(m/u)`` on agreement, ``log2((1-m)/(1-u))`` on disagreement,
    0 when either side is NULL (a missing field attests nothing) — and
    pairs scoring ≥ ``threshold`` are links. ``compares`` entries are
    ``(left_col, right_col, m, u)`` with the match/unmatch probabilities
    supplied by the caller (trained offline via EM or set from priors —
    they are model parameters, not data).

    The deterministic-scoring sibling of :func:`fuzzy_join`: same
    block-then-verify shape, same oversized-block guard (the Σ|block|²
    envelope), but the verdict is a calibrated evidence sum instead of a
    string-similarity mean, so fields can carry different evidential
    weight (an agreeing phone number outweighs an agreeing market
    segment exactly by their m/u ratios). Agreement is exact equality on
    the string form — compose with normalization expressions (or a
    fuzzy_join prefilter) for typo tolerance. All weights are plan
    literals; the score is a fixed left-to-right sum of at most
    len(compares) doubles — engine-replayable, which is what lets the
    oracle gate it exactly.
    """
    if not compares:
        raise ValueError("fellegi_sunter_links needs at least one compare")
    import math

    for lc, rc, m, u in compares:
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"m/u must be in (0,1): {lc}/{rc} m={m} u={u}")
        if m <= u:
            raise ValueError(
                f"m must exceed u (agreement must be evidence FOR a "
                f"match): {lc}/{rc} m={m} u={u}"
            )
    out_left, out_right = left_id, right_id
    if left_id == right_id:
        out_left, out_right = f"{left_id}_l", f"{right_id}_r"

    blocks = _block_cols(block_col)
    lsel = left.select(
        F.col(left_id).alias("__lid"),
        *[F.col(b).alias(f"__blk{i}") for i, b in enumerate(blocks)],
        *[
            F.col(lc).cast("string").alias(f"__l{i}")
            for i, (lc, _, _, _) in enumerate(compares)
        ],
    )
    rsel = right.select(
        F.col(right_id).alias("__rid"),
        *[F.col(b).alias(f"__rblk{i}") for i, b in enumerate(blocks)],
        *[
            F.col(rc).cast("string").alias(f"__r{i}")
            for i, (_, rc, _, _) in enumerate(compares)
        ],
    )
    cand = _blocked_candidates(lsel, rsel, len(blocks), max_block_size)
    score = F.lit(0.0)
    n_agree = F.lit(0)
    for i, (_, _, m, u) in enumerate(compares):
        lc, rc = F.col(f"__l{i}"), F.col(f"__r{i}")
        wa = F.lit(math.log2(m / u))
        wd = F.lit(math.log2((1.0 - m) / (1.0 - u)))
        agree = lc == rc
        score = score + F.when(
            lc.isNull() | rc.isNull(), F.lit(0.0)
        ).otherwise(F.when(agree, wa).otherwise(wd))
        n_agree = n_agree + F.when(
            lc.isNull() | rc.isNull(), F.lit(0)
        ).otherwise(F.when(agree, 1).otherwise(0))
    return (
        cand.select(
            F.col("__lid").alias(out_left),
            F.col("__rid").alias(out_right),
            score.alias("score"),
            n_agree.alias("n_agree"),
        )
        .where(F.col("score") >= threshold)
    )


def fellegi_sunter_em(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_col: str | Sequence[str],
    compares: list[tuple[str, str]],
    n_iters: int = 5,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    max_block_size: int = 1000,
    scale: int = 10**12,
) -> dict:
    """Unsupervised estimation of the Fellegi–Sunter m/u probabilities by
    EM over the blocked candidate pairs (Winkler 1988's standard recipe)
    — the trainer :func:`fellegi_sunter_links` was missing: its m/u
    inputs are usually NOT known a priori; the normal workflow estimates
    them from the comparison data itself.

    Shape, built for 100 TB: the ONLY data-scale work is one pass that
    reduces the candidate pairs to agreement-PATTERN counts — each pair
    contributes a vector γ ∈ {agree=1, disagree=0, missing=2}^F, and the
    groupBy over patterns yields ≤ 3^F rows (F = len(compares)). EM then
    iterates driver-side over that tiny table, like every iterative
    trainer here (train_centroids, bpe_learn): per iteration the E-step
    computes each pattern's match posterior
    ``w = λ·Πᵢ fᵢ(m) / (λ·Πᵢ fᵢ(m) + (1-λ)·Πᵢ fᵢ(u))`` (missing fields
    contribute factor 1 — a missing field attests nothing, the same rule
    as the scorer), and the M-step re-estimates λ, mᵢ, uᵢ from
    w-weighted pattern counts, with missing-field patterns excluded
    from field i's numerator AND denominator.

    Bit-reproducible across engines and partitionings (the
    ``train_centroids_exact`` discipline): posteriors are snapped to an
    integer grid (``floor(w·scale)``), all M-step accumulation is EXACT
    integer arithmetic (order-independent; Python ints don't overflow),
    and each new parameter is finished with one fixed float op sequence
    ``float(num) / float(den)`` then clamped to
    [1e-9, 0.999999999]. The E-step products multiply in field order
    left-to-right — a SQL replay of the same expressions agrees to the
    last bit (pinned by the ``fellegi_sunter_em`` gate's DuckDB twin).

    Returns ``{"lam": λ, "fields": [(m_i, u_i), ...], "n_pairs": N,
    "patterns": {(γ...): count}}``; feed ``fields`` into
    :func:`fellegi_sunter_links` to score with the trained weights.
    """
    if not compares:
        raise ValueError("fellegi_sunter_em needs at least one compare")
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    nf = len(compares)
    blocks = _block_cols(block_col)
    lsel = left.select(
        F.col(left_id).alias("__lid"),
        *[F.col(b).alias(f"__blk{i}") for i, b in enumerate(blocks)],
        *[
            F.col(lc).cast("string").alias(f"__l{i}")
            for i, (lc, _) in enumerate(compares)
        ],
    )
    rsel = right.select(
        F.col(right_id).alias("__rid"),
        *[F.col(b).alias(f"__rblk{i}") for i, b in enumerate(blocks)],
        *[
            F.col(rc).cast("string").alias(f"__r{i}")
            for i, (_, rc) in enumerate(compares)
        ],
    )
    cand = _blocked_candidates(lsel, rsel, len(blocks), max_block_size)
    flags = [
        F.when(
            F.col(f"__l{i}").isNull() | F.col(f"__r{i}").isNull(), F.lit(2)
        )
        .when(F.col(f"__l{i}") == F.col(f"__r{i}"), F.lit(1))
        .otherwise(F.lit(0))
        .alias(f"g{i}")
        for i in range(nf)
    ]
    rows = (
        cand.select(*flags)
        .groupBy(*[f"g{i}" for i in range(nf)])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    pats = [
        (tuple(int(r[f"g{i}"]) for i in range(nf)), int(r["cnt"]))
        for r in rows
    ]
    n_pairs = sum(c for _, c in pats)
    if n_pairs == 0:
        raise ValueError("fellegi_sunter_em: no candidate pairs to train on")

    def clamp(x: float) -> float:
        return min(max(x, 1e-9), 0.999999999)

    import math

    lam = float(lam0)
    m = [float(m0)] * nf
    u = [float(u0)] * nf
    for _ in range(n_iters):
        lam_num = 0
        m_num = [0] * nf
        m_den = [0] * nf
        u_num = [0] * nf
        u_den = [0] * nf
        for g, c in pats:
            num = lam
            den = 1.0 - lam
            for i in range(nf):
                if g[i] == 1:
                    num = num * m[i]
                    den = den * u[i]
                elif g[i] == 0:
                    num = num * (1.0 - m[i])
                    den = den * (1.0 - u[i])
            wq = int(math.floor(num / (num + den) * float(scale)))
            lam_num += wq * c
            for i in range(nf):
                if g[i] == 2:
                    continue
                m_den[i] += wq * c
                u_den[i] += (scale - wq) * c
                if g[i] == 1:
                    m_num[i] += wq * c
                    u_num[i] += (scale - wq) * c
        lam = clamp(float(lam_num) / float(scale * n_pairs))
        m = [
            clamp(float(m_num[i]) / float(m_den[i])) if m_den[i] else m[i]
            for i in range(nf)
        ]
        u = [
            clamp(float(u_num[i]) / float(u_den[i])) if u_den[i] else u[i]
            for i in range(nf)
        ]
    return {
        "lam": lam,
        "fields": list(zip(m, u)),
        "n_pairs": n_pairs,
        "patterns": {g: c for g, c in pats},
    }
