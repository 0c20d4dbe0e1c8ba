"""Murmur3_128 parity gates — the reference's alternate CLI hasher
(``--hashAlgorithm=murmur``: ``Hashing.murmur3_128(seed)``,
Util.scala:89-103; sampled on ``hash().asLong()``, BigSampler.scala:85).

Same three-layer strategy as tests/test_farmhash.py:
  1. pinned vectors — survive without a JVM;
  2. property parity vs Guava's murmur3_128 through the Spark JVM,
     all length paths (blocks, 1-15 tail, 8-byte tail boundary) and
     int-seed sign-extension corners;
  3. the pandas UDF / sampling dice end to end on a DataFrame.
"""

import random

import pytest
from pyspark.sql import functions as F

from ratatool_spark.functions.hashing import dice_for, murmur_dice, murmur_udf
from ratatool_spark.functions.murmur3 import murmur3_128_aslong, murmur3_x64_128

# (input, seed, asLong) — computed by this implementation and verified
# bit-identical to Guava's murmur3_128 (288 random cases through the JVM);
# ('hell', 0) additionally matches Guava's published Murmur3Hash128Test
# vector 0x629942693e10f867.
PINNED = [
    ("", 0, 0),
    ("a", 0, -8839064797231613815),
    ("hell", 0, 7104782906933966951),
    ("abc", 42, 974194376405153750),
    ("hello world", -1, 4088073208075752072),
    ("x" * 17, 1234567, 6340452536724206807),
    ("ratatool-spark" * 10, 0, -7629597040114714228),
]


def test_pinned_vectors():
    for s, seed, want in PINNED:
        assert murmur3_128_aslong(s, seed=seed) == want, (s[:20], seed)
    assert murmur3_128_aslong("hell") == 0x629942693E10F867


def test_empty_seed0_is_zero_digest():
    # murmur3 x64_128 of b'' with seed 0 is the all-zero digest
    assert murmur3_x64_128(b"", 0) == (0, 0)


def _guava(spark):
    try:
        return spark._jvm.com.google.common.hash.Hashing
    except Exception:  # pragma: no cover - guava always ships with Spark
        pytest.skip("guava unavailable in this JVM")


def test_guava_parity_all_paths(spark):
    """Randomized byte-level parity with the JVM reference across block,
    sub-8 tail, 8-15 tail, and multi-block paths, with int-seed corners
    (negative seeds sign-extend into both 64-bit lanes)."""
    H = _guava(spark)
    rng = random.Random(99)
    lens = list(range(0, 36)) + [63, 64, 65, 127, 128, 129, 500]
    seeds = (0, 42, -1, 1234567, -2147483648, 2147483647)
    for n in lens:
        for seed in seeds:
            b = bytes(rng.randrange(256) for _ in range(n))
            want = H.murmur3_128(seed).hashBytes(bytearray(b)).asLong()
            assert murmur3_128_aslong(b, seed=seed) == want, (n, seed)


def test_murmur_udf_on_dataframe(spark):
    df = spark.createDataFrame(
        [("abc",), (None,), ("hell",), ("hello world",)], "s string"
    )
    got = {
        r["s"]: r["h"]
        for r in df.select("s", murmur_udf(42)(F.col("s")).alias("h")).collect()
    }
    assert got["abc"] == 974194376405153750
    assert got[None] is None
    got0 = {
        r["s"]: r["h"]
        for r in df.select("s", murmur_udf(0)(F.col("s")).alias("h")).collect()
    }
    assert got0["hell"] == 0x629942693E10F867


def test_murmur_dice_range_and_determinism(spark, documents):
    d = documents.select(murmur_dice("doc_id", seed=7).alias("p"))
    stats = d.agg(
        F.min("p").alias("lo"), F.max("p").alias("hi"), F.avg("p").alias("mu")
    ).collect()[0]
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert 0.4 < stats["mu"] < 0.6
    a = documents.where(murmur_dice("doc_id", seed=7) < 0.3).count()
    b = documents.where(murmur_dice("doc_id", seed=7) < 0.3).count()
    assert a == b and 0 < a < documents.count()


def test_dice_for_dispatch(spark, documents):
    """dice_for is the --hashAlgorithm switch: each backend yields a valid
    deterministic dice; unknown names raise."""
    for backend in ("portable", "xx", "farm", "murmur"):
        c = documents.where(dice_for(backend, ["doc_id"], seed=3) < 0.5).count()
        c2 = documents.where(dice_for(backend, ["doc_id"], seed=3) < 0.5).count()
        assert c == c2 and c > 0, backend
    with pytest.raises(ValueError, match="unknown hasher"):
        dice_for("sha9000", ["doc_id"])


def test_sample_with_murmur_hasher(spark, documents):
    """sample(hasher='murmur') draws a deterministic cohort distinct from
    the portable one (different hash ⇒ different dice ⇒ different rows)."""
    from ratatool_spark.operators.sampler import sample

    a = sample(documents, 0.2, fields=["doc_id"], hasher="murmur", seed=5)
    b = sample(documents, 0.2, fields=["doc_id"], hasher="murmur", seed=5)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b and ids_a
    p = sample(documents, 0.2, fields=["doc_id"], hasher="portable", seed=5)
    ids_p = {r["doc_id"] for r in p.select("doc_id").collect()}
    assert ids_a != ids_p
