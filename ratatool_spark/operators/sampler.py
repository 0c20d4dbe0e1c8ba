"""BigSampler re-expressed Spark-first (SURVEY.md §2.8, SA1-SA12).

The reference dispatches on (Determinism, Distribution, Precision)
(BigSampler.sample:349-435): random vs field-hash dice; none vs stratified
vs uniform distribution; approximate vs exact counts. Exact mode builds a
Chernoff-bounded candidate set and picks per-key thresholds from bounded
top-K heaps (SamplerSCollectionFunctions.scala:174-311).

Spark redesign decisions (SURVEY.md §4):

* Approximate modes are pure ``where`` filters over a dice column —
  ``F.rand(seed)`` (nondeterministic) or the portable md5 field-hash
  (deterministic, warehouse-reproducible). Narrow, codegen'd, zero shuffle.
* Per-key probabilities (uniform distribution) come from a ``groupBy.count``
  joined back with an explicit ``F.broadcast`` — the reference's hashJoin
  (BigSampler.scala:411) under its documented "all strata fit in one
  worker's memory" assumption (ratatool-sampling/README.md:118-120).
* Exact modes replace the heap/threshold machinery with per-key
  ``row_number`` over the dice ordering — simpler, spill-safe, and *more*
  exact than the reference (its own audit tolerates 1e-2 error,
  SamplerSCollectionFunctions.scala:32). To stay scalable when a stratum is
  huge, rows are pre-filtered to a Chernoff-bounded candidate region before
  the window sort (same trick as the reference's getUpperBound,
  SamplerSCollectionFunctions.scala:174-182) — the window then sorts ~f·n
  rows instead of n. With no strata the window is a single partition, so the
  global case goes through a constant synthetic stratum only after the
  prefilter has shrunk it; for very large exact global samples prefer
  stratifying on anything.
* The distribution audit (buildStratifiedDiffs/buildUniformDiffs:52-134,
  >1% ⇒ throw in exact mode) becomes a driver-side assert over two small
  aggregates.

At 100 TB: the only shuffles are (a) the strata count aggregate (partial
map-side combine, tiny result), (b) the exact-mode window over the
Chernoff-trimmed candidates. Approx modes scan+filter only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ratatool_spark.functions.localrel import local_df
from ratatool_spark.functions.hashing import dice_for

_ROLL = "__rt_roll"
_PROB = "__rt_prob"
_TARGET = "__rt_target"
_RN = "__rt_rn"
_CNT = "__rt_cnt"
_BOUND = "__rt_bound"
_BKT = "__rt_bucket"
_OFF = "__rt_offset"


@dataclass
class SampleAudit:
    """Post-sampling distribution audit (SamplerSCollectionFunctions.scala:52-134)."""

    total_in: int
    total_out: int
    fraction: float
    per_stratum: list[tuple] = field(default_factory=list)  # (key, count_in, count_out, target)

    @property
    def total_error(self) -> float:
        expect = self.total_in * self.fraction
        return abs(self.total_out - expect) / max(expect, 1.0)


def _resolve_dice(
    df: DataFrame,
    fields: list[str] | None,
    seed: int,
    portable: bool,
    hasher: str | None = None,
    byte_encoding: str = "hex",
) -> Column:
    """Dice column: deterministic field-hash when ``fields`` given, else
    per-row random. Matches diceElement (BigSampler.scala:83-90) /
    assignRandomRoll (Random.scala:84-105). ``hasher`` (portable|xx|farm|
    murmur) is the reference's ``--hashAlgorithm`` switch (Util.scala:85-103)
    and overrides the legacy ``portable`` flag when given."""
    if fields:
        dtypes = []
        for f_name in fields:
            dtypes.append(df.schema[f_name].dataType if "." not in f_name else None)
        cols = [F.col(f_name) for f_name in fields]
        backend = hasher if hasher is not None else ("portable" if portable else "xx")
        return dice_for(
            backend, cols, seed=seed, dtypes=dtypes, byte_encoding=byte_encoding
        )
    return F.rand(seed)


def _chernoff_upper(fraction: float, n: int, delta: float = 1e-6) -> float:
    """Upper bound on the dice threshold such that P(kept < target) < delta.
    Same derivation as getUpperBound (SamplerSCollectionFunctions.scala:174-182):
    one-sided Chernoff on Binomial(n, q) undershooting n*fraction."""
    if n <= 0:
        return 1.0
    q = min(1.0, fraction + math.sqrt(max(3.0 * fraction * math.log(2.0 / delta) / n, 0.0)) + 8.0 / n)
    return q


def sample(
    df: DataFrame,
    fraction: float,
    fields: list[str] | None = None,
    strata: list[str] | None = None,
    uniform: bool = False,
    exact: bool = False,
    seed: int = 42,
    portable: bool = True,
    hasher: str | None = None,
    audit: bool = False,
    error_tolerance: float = 1e-2,
    byte_encoding: str = "hex",
) -> DataFrame | tuple[DataFrame, SampleAudit]:
    """The 8-way sampling matrix (BigSampler.sample:349-435).

    Args map to the reference CLI: ``fields`` ⇒ deterministic hash dice
    (``--fields``); ``strata`` ⇒ stratified distribution
    (``--distribution=stratified --distributionFields``); ``uniform`` ⇒ equal
    target per stratum; ``exact`` ⇒ exact counts (``--exact``). ``portable``
    selects the md5 cross-engine hash vs the faster Spark-native xxhash64;
    ``hasher`` (portable|xx|farm|murmur) is the reference's
    ``--hashAlgorithm`` switch (Util.scala:85-103) and wins over
    ``portable`` when given.

    Returns the sampled DataFrame (same schema as input); with
    ``audit=True`` also returns a :class:`SampleAudit` and, in exact mode,
    raises if any stratum is off by more than ``error_tolerance`` — the
    reference's >1% throw (SamplerSCollectionFunctions.scala:79-92).
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if uniform and not strata:
        raise ValueError("uniform distribution requires strata fields")

    roll = _resolve_dice(
        df, fields, seed, portable, hasher=hasher, byte_encoding=byte_encoding
    )

    if not exact:
        out = _approx_sample(df, roll, fraction, strata, uniform, seed)
    else:
        out = _exact_sample(df, roll, fraction, strata, uniform)

    if not audit:
        return out
    return out, _audit(df, out, fraction, strata, uniform, exact, error_tolerance)


def _approx_sample(
    df: DataFrame,
    roll: Column,
    fraction: float,
    strata: list[str] | None,
    uniform: bool,
    seed: int,
) -> DataFrame:
    """SA1-SA6: pure filter (plus a broadcast prob join for uniform)."""
    if not uniform:
        # Stratified-at-constant-rate == plain Bernoulli per record: each
        # stratum is sampled at `fraction` in expectation (sampleDist:321-332).
        return df.where(roll < F.lit(fraction))
    # Uniform over strata: popPerKey = total*f/nKeys; prob_k = min(pop/n_k, 1)
    # (uniformParams:136-157). popPerKey rides the plan as an unpartitioned
    # window over the #strata-row counts table instead of an eager collect:
    # the collect cost a separate full aggregate pass over `df` at plan-build
    # time, and a broadcast-scalar cross join would duplicate the counts
    # subtree (the inner join on strata infers IsNotNull on one copy only,
    # defeating exchange reuse — measured: 3 scans). The window keeps ONE
    # counts subtree (2 scans of `df` total) and is bounded by stratum
    # cardinality, not data size. The inferred join-key IsNotNull cannot push
    # through an unpartitioned window, so NULL strata still count toward the
    # total exactly as the collected form did. Arithmetic order is unchanged
    # ((total * f) / nk, then / n_k), both sides double, so the kept rows
    # are bit-identical to the driver-literal form.
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias(_CNT))
    w_all = Window.partitionBy()
    pop_per_key = F.sum(_CNT).over(w_all) * F.lit(fraction) / F.greatest(
        F.count(F.lit(1)).over(w_all), F.lit(1)
    )
    probs = counts.select(
        *strata, F.least(pop_per_key / F.col(_CNT), F.lit(1.0)).alias(_PROB)
    )
    return (
        df.withColumn(_ROLL, roll)
        .join(F.broadcast(probs), strata)
        .where(F.col(_ROLL) < F.col(_PROB))
        .select(*df.columns)
    )


def _exact_sample(
    df: DataFrame,
    roll: Column,
    fraction: float,
    strata: list[str] | None,
    uniform: bool,
) -> DataFrame:
    """SA7-SA9: rank rows by dice within each stratum, keep the first
    ``target`` — the k-th-smallest-threshold semantics of exactSampleDist
    (SamplerSCollectionFunctions.scala:174-311) done as a window rank.

    target per stratum: ceil(n_k * fraction) (uniform: the equal share
    min(total*f/nKeys, n_k)). The Chernoff prefilter keeps the window input
    at ~f·n rows; the bound is computed PER STRATUM from that stratum's own
    count and effective fraction (getUpperBound,
    SamplerSCollectionFunctions.scala:174-182 — a single bound from the
    largest stratum would be the tightest one and over-filter small
    strata). Undershoot probability per stratum is < 1e-6 by construction;
    if one does undershoot, the audit (audit=True) detects and raises.
    """
    key = [F.col(s) for s in strata] if strata else [F.lit(1)]
    counts = (
        df.groupBy(*key) if strata else df.groupBy(F.lit(1).alias("__g"))
    ).agg(F.count(F.lit(1)).alias(_CNT))

    if strata:
        if uniform:
            # Equal share per stratum via an unpartitioned window over the
            # #strata-row counts table — same fusion rationale as
            # _approx_sample's popPerKey (the eager collect paid a full
            # aggregate pass at build time). (total * f) / k then ceil/least:
            # identical arithmetic order and types, bit-identical targets.
            w_all = Window.partitionBy()
            pop = F.sum(_CNT).over(w_all) * F.lit(fraction) / F.greatest(
                F.count(F.lit(1)).over(w_all), F.lit(1)
            )
            targets = counts.select(
                *strata,
                F.col(_CNT),
                F.least(F.ceil(pop), F.col(_CNT)).cast("long").alias(_TARGET),
            )
        else:
            targets = counts.select(
                *strata,
                F.col(_CNT),
                F.ceil(F.col(_CNT) * F.lit(fraction)).cast("long").alias(_TARGET),
            )
        # Per-stratum Chernoff threshold (column form of _chernoff_upper,
        # effective fraction = target/n_k so it is also valid for uniform
        # mode where the per-stratum rate differs from `fraction`).
        eff = F.col(_TARGET).cast("double") / F.col(_CNT)
        log_term = math.log(2.0 / 1e-6)  # ln(2/δ), δ=1e-6
        bound_col = F.least(
            F.lit(1.0),
            eff
            + F.sqrt(F.lit(3.0 * log_term) * eff / F.col(_CNT))
            + F.lit(8.0) / F.col(_CNT),
        ).alias(_BOUND)
        targets = targets.select(*strata, F.col(_TARGET), bound_col)
        w = Window.partitionBy(*strata).orderBy(_ROLL)
        return (
            df.withColumn(_ROLL, roll)
            .join(F.broadcast(targets), strata)
            .where(F.col(_ROLL) < F.col(_BOUND))
            .withColumn(_RN, F.row_number().over(w))
            .where(F.col(_RN) <= F.col(_TARGET))
            .select(*df.columns)
        )

    # Global exact: the t = ceil(n·f) smallest rolls, WITHOUT a
    # single-reducer top-t (orderBy().limit(t) merges t rows in one place —
    # a scale-killer at 100 TB × f=0.1; the reference caps the same heap at
    # 1e6/1e9, BigSampler.scala:181). Distributed selection instead:
    #   1. Chernoff prefilter to ~f·n candidates (P(losing a top-t row)
    #      < 1e-6, same bound as the stratified path);
    #   2. value-range buckets over the dice (uniform → balanced), counted
    #      with one tiny aggregate → cumulative offsets per bucket;
    #   3. local row_number within each bucket (each bucket is one window
    #      group of ~f·n/P rows) and keep offset + rank ≤ t.
    # No task ever holds more than ~f·n/P rows; results are identical to
    # the single-reducer top-t.
    n = df.count()
    target = int(math.ceil(n * fraction))
    if target <= 0:
        return df.where(F.lit(False))
    keep_cols = df.columns
    n_buckets = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    for bound in (_chernoff_upper(fraction, n), 1.0):
        cand = df.withColumn(_ROLL, roll)
        if bound < 1.0:
            cand = cand.where(F.col(_ROLL) < F.lit(bound))
        bucket = F.least(
            F.floor(F.col(_ROLL) / F.lit(bound) * n_buckets),
            F.lit(n_buckets - 1),
        ).cast("int")
        # Freeze the rolls: the bucket-count collect below and the returned
        # plan are separate jobs, and with the F.rand dice a recompute (task
        # retry, upstream reorder) would re-roll — making the collected
        # offsets inconsistent with the final bucket assignment.
        # localCheckpoint materializes the ~f·n candidate rows once
        # (executor memory/disk) and truncates lineage; blocks are freed by
        # the ContextCleaner when the plan is dropped, so nothing leaks.
        cand = cand.withColumn(_BKT, bucket).localCheckpoint()
        counts = {
            r[_BKT]: r["cnt"]
            for r in cand.groupBy(_BKT).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        if sum(counts.values()) < target:
            continue  # prefilter undershot (prob < 1e-6): retry unfiltered
        offsets, acc = {}, 0
        for b in range(n_buckets):
            offsets[b] = acc
            acc += counts.get(b, 0)
        off_df = local_df(df.sparkSession,
            [(b, o) for b, o in offsets.items() if counts.get(b, 0)],
            f"{_BKT} int, {_OFF} long",
        )
        w = Window.partitionBy(_BKT).orderBy(_ROLL)
        return (
            cand.join(F.broadcast(off_df), _BKT)
            .withColumn(_RN, F.row_number().over(w))
            .where(F.col(_OFF) + F.col(_RN) <= F.lit(target))
            .select(*keep_cols)
        )
    raise AssertionError("unreachable: unfiltered pass covers all rows")


def _audit(
    df: DataFrame,
    out: DataFrame,
    fraction: float,
    strata: list[str] | None,
    uniform: bool,
    exact: bool,
    tol: float,
) -> SampleAudit:
    """buildStratifiedDiffs/buildUniformDiffs (:52-134): compare achieved
    counts to targets; exact mode throws past tolerance (:79-92)."""
    total_in, total_out = df.count(), out.count()
    per = []
    if strata:
        cin = {tuple(r[:-1]): r[-1] for r in df.groupBy(*strata).count().collect()}
        cout = {tuple(r[:-1]): r[-1] for r in out.groupBy(*strata).count().collect()}
        if uniform:
            pop = total_in * fraction / max(len(cin), 1)
            tgt = {k: min(pop, v) for k, v in cin.items()}
        else:
            tgt = {k: v * fraction for k, v in cin.items()}
        for k, n_in in cin.items():
            n_out, t = cout.get(k, 0), tgt[k]
            per.append((k, n_in, n_out, t))
            if exact and t > 0 and abs(n_out - t) / max(t, 1.0) > tol + 1.0 / max(t, 1.0):
                raise AssertionError(
                    f"exact sample stratum {k}: got {n_out}, target {t:.1f} "
                    f"(tolerance {tol})"
                )
    audit = SampleAudit(total_in, total_out, fraction, per)
    if exact and audit.total_error > tol + 1.0 / max(total_in * fraction, 1.0):
        raise AssertionError(
            f"exact sample total off: {total_out} vs {total_in * fraction:.1f}"
        )
    return audit


def head_sample(df: DataFrame, n: int) -> DataFrame:
    """SA11 — first n records (AvroSampler.scala:55-65). ``limit`` is
    planned as CollectLimit/LocalLimit: scans stop early per partition."""
    return df.limit(n)


def reservoir_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """SA10 — exactly-n uniform random sample (reservoir semantics,
    AvroSampler.scala:105-148). Spark-first: assign rand roll, distributed
    top-n ascending (TakeOrderedAndProject) — statistically identical to a
    reservoir, no driver loop, no per-file Futures."""
    keep = df.columns
    return df.withColumn(_ROLL, F.rand(seed)).orderBy(_ROLL).limit(n).select(*keep)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    fields: list[str] | None = None,
    seed: int = 42,
    portable: bool = True,
) -> DataFrame:
    """Weighted sampling without replacement (extension; not in the
    reference) — the mixture-sampling primitive for corpus construction
    ("sample n docs with probability ∝ quality/length/domain weight").

    Efraimidis–Spirakis A-Res: each row gets key ``u^(1/w)`` with
    ``u ∈ [0,1)``; the n largest keys are the sample. With ``fields``
    the uniform is the portable field-hash dice — the identical cohort
    is re-derivable in any engine with md5 (and is this operator's
    oracle); otherwise ``F.rand(seed)``. Rows with weight <= 0 are
    excluded (their key is undefined).

    Physical plan: TakeOrderedAndProject — per-partition top-n, single
    driver merge; no global sort, same n-fits-in-memory envelope as the
    reference's reservoir (AvroSampler.scala:105-148)."""
    keep = df.columns
    u = _resolve_dice(df, fields, seed, portable)
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    tiebreak = [F.col(f) for f in (fields or [])]
    return (
        df.where(w > 0)
        .withColumn(_ROLL, key)
        .orderBy(F.desc(_ROLL), *tiebreak)
        .limit(n)
        .select(*keep)
    )


_BOOT_K = "__rt_boot_k"


def poisson_thresholds(rate: float, max_k: int = 8) -> list[float]:
    """Cumulative Poisson(rate) probabilities P(X <= k) for k in
    [0, max_k), computed ON THE DRIVER and embedded as plan literals —
    both engines compare the dice against the SAME double constants, so
    bootstrap parity never depends on either engine's exp/factorial."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    p = math.exp(-rate)
    cum, out = p, [p]
    for k in range(1, max_k):
        p *= rate / k
        cum += p
        out.append(cum)
    return out


def bootstrap_sample(
    df: DataFrame,
    rate: float = 1.0,
    fields: list[str] | None = None,
    seed: int = 42,
    max_k: int = 8,
    copy_col: str = "copy",
) -> DataFrame:
    """Poisson bootstrap resample: each row is emitted k ~ Poisson(rate)
    times with a ``copy`` index (1..k) — the distributed bootstrap for
    confidence intervals / bagging over data that never fits one machine
    (per-row independent draws; no global resample-with-replacement
    shuffle). With ``fields``, the draw is the deterministic portable
    dice, so the SAME replicate set is re-derivable in any engine (and
    is this operator's oracle); k is capped at ``max_k`` — the whole tail
    P(X >= max_k) collapses onto max_k, a bias of 1 - cdf(max_k - 1)
    (at rate 1, max_k 8: ~1.0e-5; raise max_k for tighter budgets).

    Zero shuffles: dice + CASE + explode(sequence) in the scan stage.
    """
    if copy_col in df.columns or _BOOT_K in df.columns:
        raise ValueError(
            f"input already has a {copy_col!r}/{_BOOT_K!r} column — pass a "
            "different copy_col"
        )
    u = _resolve_dice(df, fields, seed, portable=True)
    cum = poisson_thresholds(rate, max_k)
    k = F.lit(max_k)
    for j in range(max_k - 1, -1, -1):
        k = F.when(u < F.lit(cum[j]), F.lit(j)).otherwise(k)
    out = df.withColumn(_BOOT_K, k).where(F.col(_BOOT_K) > 0)
    return out.select(
        *df.columns, F.explode(F.sequence(F.lit(1), F.col(_BOOT_K))).alias(copy_col)
    )


def distributed_top_k(
    df: DataFrame,
    key_col: str,
    tie_cols: list[str],
    k: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact global top-k by ``key_col`` DESC (ties broken by
    ``tie_cols`` ASC; NULL keys order LAST) with NO single-point merge —
    the scale path for selections where k itself is huge (10⁸⁺ rows),
    where ``orderBy().limit(k)``'s TakeOrderedAndProject would funnel the
    whole selected set through one merge.

    The same bucket/offset machinery as the global exact sampler above,
    generalized from the [0,1) dice to an arbitrary real key:

    1. freeze the scored rows once (``localCheckpoint`` — the bucket
       counts and the returned plan are separate jobs; without it the
       upstream scoring job runs twice);
    2. approximate value-range bucket boundaries from
       ``percentile_approx`` (approximation affects only bucket BALANCE,
       never correctness — offsets are exact counts);
    3. per-bucket counts via one tiny aggregate → cumulative offsets
       from the top bucket down; buckets entirely below rank k are
       dropped before the window;
    4. local ``row_number`` within each surviving bucket, keep
       ``offset + rank <= k``.

    Equal keys always share a bucket (assignment is by value), so the
    result is row-for-row identical to ``orderBy(desc_nulls_last(key),
    *ties).limit(k)``. No task ever holds more than ~n/P + k/P rows."""
    spark = df.sparkSession
    keep_cols = df.columns
    if k <= 0:
        return df.where(F.lit(False))
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    frozen = df.localCheckpoint()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = frozen.agg(
        F.percentile_approx(F.col(key_col).cast("double"), qs, 10_000).alias("b")
    ).collect()[0]
    bounds = sorted({float(b) for b in (row["b"] or []) if b is not None})
    if bounds:
        lit_bounds = F.array(*[F.lit(b) for b in bounds])
        n_below = F.size(
            F.filter(lit_bounds, lambda b: b < F.col(key_col).cast("double"))
        )
    else:
        n_below = F.lit(0)  # degenerate key distribution: single bucket
    bkt = F.when(F.col(key_col).isNull(), F.lit(-1)).otherwise(n_below)
    cand = frozen.withColumn(_BKT, bkt)
    counts = {
        r[_BKT]: r["cnt"]
        for r in cand.groupBy(_BKT).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts, reverse=True):  # top bucket first; NULL (-1) last
        offsets[b] = acc
        acc += counts[b]
    live = [(b, o) for b, o in offsets.items() if o < k]
    off_df = local_df(spark, live, f"{_BKT} int, {_OFF} long")
    w = Window.partitionBy(_BKT).orderBy(
        F.desc_nulls_last(key_col), *[F.col(c) for c in tie_cols]
    )
    return (
        cand.join(F.broadcast(off_df), _BKT)
        .withColumn(_RN, F.row_number().over(w))
        .where(F.col(_OFF) + F.col(_RN) <= F.lit(k))
        .select(*keep_cols)
    )


def sample_neyman(
    df: DataFrame,
    total_n: int,
    value_col: str,
    strata: list[str],
    fields: list[str],
    seed: int = 42,
    scale: int = 1_000_000,
    hasher: str = "portable",
) -> DataFrame:
    """Exact-count stratified sample under NEYMAN (variance-optimal)
    allocation: stratum h receives n_h ∝ N_h · S_h (population × within-
    stratum stddev of ``value_col``), the allocation that minimizes the
    variance of the stratified mean at a fixed total budget — the survey-
    sampling upgrade of the reference's proportional stratified mode
    (BigSampler --distribution=stratified draws n_h ∝ N_h; skewed-value
    strata are exactly where that wastes budget).

    Determinism end-to-end (the exact-sampler discipline):
      - stratum stats are EXACT integer aggregates of fixed-point values
        (``floor(x·scale + 0.5)`` longs; sum/sumsq exact, so S_h is one
        fixed double-op sequence — no aggregation-order noise);
      - weights quantize to longs (``floor(N_h·S_h + 0.5)``) before the
        Σw normalization, so the allocation arithmetic is integer-exact
        up to one final double division per stratum;
      - integer n_h via floor + largest-remainder (ties: stratum key
        ASC), capped at N_h; if every stratum has zero variance the
        allocation falls back to proportional (w_h = N_h);
      - membership by per-stratum rank over the portable dice (ties:
        the dice fields) — reproducible across engines, runs, and
        repartitionings.

    One stats pass (map-side combined) + one broadcast of the tiny
    per-stratum allocation table + one per-stratum window rank — the
    same scale shape as the exact stratified sampler. Envelope:
    N_h · S_h·scale must fit int64 (~9·10¹⁸); raise/lower ``scale`` to
    trade quantization precision against headroom.

    Output: the sampled rows (original columns).
    """
    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    if not strata or not fields:
        raise ValueError("sample_neyman needs strata and dice fields")
    v_fx = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "long"
    )
    # sumsq in DECIMAL(38,0): v_fx² overflows int64 (a 1e5 value at the
    # default scale is 1e11 fixed-point; squared = 1e22) — decimal sums
    # stay exact integers in both engines
    v_dec = v_fx.cast("decimal(19,0)")
    stats = df.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v_fx).alias("__s1"),
        F.sum(v_dec * v_dec).alias("__s2"),
    )
    n, s1, s2 = F.col("__n"), F.col("__s1"), F.col("__s2")
    var = (
        s2.cast("double") - s1.cast("double") * s1.cast("double") / n
    ) / (n - 1)
    std = F.when(n < 2, F.lit(0.0)).otherwise(F.sqrt(F.greatest(var, F.lit(0.0))))
    stats = stats.withColumn(
        "__w", F.floor(n * std + F.lit(0.5)).cast("long")
    )
    # The allocation itself runs on the DRIVER: the stats table is one
    # row per stratum and is broadcast back onto the data anyway, so it
    # is driver-memory-sized by construction — collecting it replaces
    # two scalar cross-joins plus a single-partition ranking window with
    # a Python loop over the same exact integers (__n, __w), keeping the
    # arithmetic order identical (float(total_n)·w/t, floor, largest
    # remainder, ties by stratum key ASC with NULLs first — Spark's ASC).
    import math

    srows = stats.select(*strata, "__n", "__w").collect()
    # an all-NULL value column yields NULL stddev -> NULL weight; treat
    # as 0 so the allocation falls back to proportional (tw == 0)
    tw = sum(r["__w"] or 0 for r in srows)
    tn = sum(r["__n"] for r in srows)
    entries = []
    for r in srows:
        nh, wh = r["__n"], r["__w"] or 0
        w_eff = nh if tw == 0 else wh
        t_eff = tn if tw == 0 else tw
        raw = float(total_n) * w_eff / t_eff
        base = int(math.floor(raw))
        entries.append((tuple(r[c] for c in strata), nh, base, raw - base))
    bt = sum(e[2] for e in entries)
    extra = total_n - bt

    def _asc_nulls_first(key):
        return tuple((v is not None, v) for v in key)

    order = sorted(
        range(len(entries)),
        key=lambda i: (-entries[i][3], _asc_nulls_first(entries[i][0])),
    )
    nh_by_key = {}
    for rank0, i in enumerate(order):
        key, nh, base, _ = entries[i]
        nh_by_key[key] = min(nh, base + (1 if rank0 < extra else 0))
    key_schema = stats.select(*strata).schema
    alloc_schema = key_schema.add("__nh", "long", False)
    alloc = local_df(df.sparkSession,
        [(*k, int(v)) for k, v in nh_by_key.items()], alloc_schema
    )
    d = dice_for(hasher, [F.col(c) for c in fields], seed=seed)
    w_sel = Window.partitionBy(*strata).orderBy(
        F.col("__d").asc(), *[F.col(c).asc() for c in fields]
    )
    return (
        df.withColumn("__d", d)
        .join(F.broadcast(alloc), strata)
        .withColumn("__rn", F.row_number().over(w_sel))
        .where(F.col("__rn") <= F.col("__nh"))
        .drop("__d", "__rn", "__nh")
    )
