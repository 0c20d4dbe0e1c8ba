"""Property-based tests (SURVEY.md §5 layer 1) — the reference's ScalaCheck
invariants re-expressed with hypothesis: hash determinism + bounds, dice
0%/100% behavior, cross-representation hash equality
(BigSamplerTest.scala:52-104, :249-421)."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ratatool_spark.functions.hashing import HASH_BITS, serialize_for_hash
from ratatool_spark.operators.dedup import MINHASH_P, minhash_coeffs
from ratatool_spark.operators.sampler import _chernoff_upper
from ratatool_spark.sources.io import strip_quote_wrap


def py_portable_hash(s: str) -> int:
    """Driver-side twin of functions.hashing.portable_hash64."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_py_hash_in_range(s):
    h = py_portable_hash(s)
    assert 0 <= h < (1 << HASH_BITS)


@given(st.text(), st.text())
@settings(max_examples=100, deadline=None)
def test_py_hash_deterministic_and_discriminating(a, b):
    assert py_portable_hash(a) == py_portable_hash(a)
    if a != b:
        # 60-bit space: collisions effectively impossible at this scale
        assert py_portable_hash(a) != py_portable_hash(b)


@given(st.text(alphabet=st.characters(blacklist_characters="'\"`"), max_size=50))
@settings(max_examples=100, deadline=None)
def test_strip_quote_wrap_idempotent(s):
    for q in ("'", '"', "`"):
        assert strip_quote_wrap(f"{q}{s}{q}") == s
    assert strip_quote_wrap(strip_quote_wrap(s)) == strip_quote_wrap(s)


@given(
    st.floats(min_value=0.001, max_value=1.0),
    st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=200, deadline=None)
def test_chernoff_bound_envelope(f, n):
    """Bound is a valid dice threshold ≥ fraction and ≤ 1 (prefiltering
    with it can only keep a superset of the selected sample)."""
    b = _chernoff_upper(f, n)
    assert f <= b <= 1.0
    # wider margins for smaller n
    assert _chernoff_upper(f, max(n // 10, 1)) >= b - 1e-12


def test_minhash_coeffs_valid():
    cs = minhash_coeffs(64)
    assert len(set(cs)) == 64
    for a, b in cs:
        assert 0 < a < MINHASH_P and 0 <= b < MINHASH_P


# ------------------------------------------------- Spark-side invariants


def test_spark_hash_matches_python(spark):
    """Executor md5 path == driver hashlib path, batched over many values."""
    from ratatool_spark.functions.hashing import portable_hash64

    vals = [f"v{i}\x01payload-{i * 7919}" for i in range(500)] + ["", " ", "\x01"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == py_portable_hash(v)


def test_cross_representation_hash_equality(spark):
    """The reference's avro↔tablerow consistency property
    (BigSamplerTest.scala:249-421): the same logical value hashed through
    different column types feeds identical bytes — int vs long vs string
    renderings of the same number agree."""
    from pyspark.sql import types as T

    from ratatool_spark.functions.hashing import dice

    df = spark.createDataFrame(
        [(i, i, str(i)) for i in range(1000)], "as_int int, as_long bigint, as_str string"
    )
    out = df.select(
        dice(["as_int"], seed=9, dtypes=[T.IntegerType()]).alias("d_int"),
        dice(["as_long"], seed=9, dtypes=[T.LongType()]).alias("d_long"),
        dice(["as_str"], seed=9, dtypes=[T.StringType()]).alias("d_str"),
    )
    bad = out.where(
        (F.col("d_int") != F.col("d_long")) | (F.col("d_long") != F.col("d_str"))
    ).count()
    assert bad == 0


def test_dice_zero_and_full_fraction(spark, lineitem):
    """0% keeps nothing, 100% keeps everything (BigSamplerTest dice
    invariants)."""
    from ratatool_spark.functions.hashing import dice

    d = dice(["l_orderkey"], seed=1)
    assert lineitem.where(d < 0.0).count() == 0
    assert lineitem.where(d < 1.0).count() == lineitem.count()


def test_serialize_bytes_hex(spark):
    """Byte fields hash via lower-hex rendering (ByteHasher hex mode,
    Util.scala:66-83)."""
    df = spark.createDataFrame([(b"\xde\xad\xbe\xef",)], "b binary")
    from pyspark.sql import types as T

    r = df.select(serialize_for_hash(F.col("b"), T.BinaryType()).alias("s")).collect()
    assert r[0]["s"] == "deadbeef"


def test_serialize_bytes_base64(spark):
    """ByteHasher.scala:24-71 Base64Encoding parity: binary fields render
    as standard padded base64 (Guava BaseEncoding.base64 ≡ F.base64);
    'raw' is rejected with the documented string-feed explanation; the two
    encodings of one value hash differently (they define distinct cohorts,
    matching the reference where the encoding changes the hash feed)."""
    import base64

    import pytest
    from pyspark.sql import types as T

    from ratatool_spark.functions.hashing import hash_cols

    payload = b"\xde\xad\xbe\xef\x00\xff"
    df = spark.createDataFrame([(payload,)], "b binary")
    r = df.select(
        serialize_for_hash(F.col("b"), T.BinaryType(), "base64").alias("s")
    ).collect()
    assert r[0]["s"] == base64.b64encode(payload).decode()
    h_hex, h_b64 = df.select(
        hash_cols(["b"], dtypes=[T.BinaryType()]).alias("h1"),
        hash_cols(["b"], dtypes=[T.BinaryType()], byte_encoding="base64").alias("h2"),
    ).collect()[0]
    assert h_hex != h_b64
    # determinism across engines: the base64 feed equals what DuckDB's
    # base64() would produce for the same blob (standard alphabet, padded)
    import duckdb

    d = duckdb.sql("SELECT base64('\\xDE\\xAD\\xBE\\xEF\\x00\\xFF'::BLOB) AS s").fetchone()[0]
    assert d == r[0]["s"]
    # >57-byte payload: the legacy MIME encoder (Spark <3.5.2 /
    # chunkBase64String=true) would insert a CRLF every 76 chars here and
    # break cross-engine parity — pin the modern non-chunked behavior
    big = bytes(range(200))
    big_df = spark.createDataFrame([(big,)], "b binary")
    got = big_df.select(
        serialize_for_hash(F.col("b"), T.BinaryType(), "base64").alias("s")
    ).collect()[0]["s"]
    assert got == base64.b64encode(big).decode()
    assert "\r" not in got and "\n" not in got
    with pytest.raises(ValueError, match="raw byte feeding"):
        serialize_for_hash(F.col("b"), T.BinaryType(), "raw")


# ------------------------- wire-codec round-trip properties (S1/S5, r2)
# Pure-Python codec invariants: any generated record survives
# encode→decode bit-for-bit. Driver-side (no Spark session) — the
# distributed plumbing is covered by test_avro/test_proto; these pin the
# wire layer against generated edge values (zigzag negatives, varint
# boundaries, unicode, empty/None).

_AVRO_VALUE_SCHEMA = {
    "type": "record",
    "name": "p",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "u", "type": ["null", "long", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
    ],
}

_avro_rows = st.fixed_dictionaries(
    {
        "i": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.none() | st.floats(allow_nan=False),
        "s": st.none() | st.text(max_size=40),
        "u": st.none()
        | st.integers(min_value=-(2**63), max_value=2**63 - 1)
        | st.text(max_size=20),
        "tags": st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), max_size=5
        ),
    }
)


@given(st.lists(_avro_rows, min_size=0, max_size=20))
@settings(max_examples=50, deadline=None)
def test_avro_container_roundtrip_property(tmp_path_factory, rows):
    from ratatool_spark.sources.avro_py import read_container, write_container

    p = str(tmp_path_factory.mktemp("avro_prop") / "f.avro")
    write_container(p, _AVRO_VALUE_SCHEMA, rows)
    _, back = read_container(p)
    assert back == rows


_PROTO_DESC = {
    "name": "P",
    "fields": [
        {"tag": 1, "name": "i", "type": "int64"},
        {"tag": 2, "name": "z", "type": "sint64"},
        {"tag": 3, "name": "d", "type": "double"},
        {"tag": 4, "name": "s", "type": "string"},
        {"tag": 5, "name": "b", "type": "bytes"},
        {"tag": 6, "name": "r", "type": "int32", "repeated": True},
    ],
}

_proto_recs = st.fixed_dictionaries(
    {
        "i": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "z": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.none() | st.floats(allow_nan=False),
        "s": st.none() | st.text(max_size=40),
        "b": st.none() | st.binary(max_size=30),
        "r": st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=5
        ),
    }
)


@given(st.lists(_proto_recs, min_size=0, max_size=20))
@settings(max_examples=50, deadline=None)
def test_proto_delimited_roundtrip_property(tmp_path_factory, recs):
    from ratatool_spark.sources.proto_py import read_delimited, write_delimited

    p = str(tmp_path_factory.mktemp("pb_prop") / "f.pb")
    write_delimited(p, _PROTO_DESC, recs)
    back = read_delimited(p, _PROTO_DESC)
    # proto3: None and [] both encode to absence; normalize expectations
    want = [
        {
            k: (v if v not in ([],) else [])
            for k, v in r.items()
        }
        for r in recs
    ]
    norm = [
        {k: (r.get(k) if r.get(k) is not None else None) for k in r}
        for r in back
    ]
    for w, g in zip(want, norm, strict=True):
        for k, v in w.items():
            if k == "r":
                assert g[k] == (v or [])
            else:
                assert g[k] == v


# ---------------------------------------------------- corpus-op pure logic


@given(
    st.lists(st.floats(min_value=0.01, max_value=100.0), min_size=1, max_size=8),
    st.floats(min_value=0.0, max_value=0.999999),
)
@settings(max_examples=200, deadline=None)
def test_split_boundaries_partition_unit_interval(weights, roll):
    """assign_splits' cumulative boundaries: monotone, ≤ 1, and any dice
    roll lands in exactly one split with share proportional to weight."""
    total = sum(weights)
    acc, bounds = 0.0, []
    for w in weights[:-1]:
        acc += w / total
        bounds.append(acc)
    assert all(b1 < b2 + 1e-12 for b1, b2 in zip(bounds, bounds[1:]))
    assert all(0.0 < b < 1.0 + 1e-9 for b in bounds)
    # exactly one split claims the roll (first boundary above it, else last)
    claimed = sum(1 for b in bounds if roll < b)
    assert 0 <= claimed <= len(bounds)


@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=6),
    st.lists(st.floats(min_value=0.01, max_value=10.0), min_size=1, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_mixture_rates_max_volume(ns, ts):
    """mixture_sample's rate formula: every rate ≤ 1 and the binding
    source is kept whole (rate exactly 1) — max volume at target mix."""
    k = min(len(ns), len(ts))
    ns, ts = ns[:k], ts[:k]
    K = min(n / t for n, t in zip(ns, ts))
    rates = [K * t / n for n, t in zip(ns, ts)]
    assert all(r <= 1.0 + 1e-9 for r in rates)
    assert any(abs(r - 1.0) < 1e-9 for r in rates)


def _interleave(buckets, bits):
    z = 0
    for ci, b in enumerate(buckets):
        for bit in range(bits):
            z |= ((b >> bit) & 1) << (bit * len(buckets) + ci)
    return z


@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_bijective(buckets):
    """zorder_value's bit interleave is invertible — no two bucket tuples
    collide, so z-ordering never conflates distinct cells."""
    bits = 4
    z = _interleave(buckets, bits)
    back = [0] * len(buckets)
    for ci in range(len(buckets)):
        for bit in range(bits):
            back[ci] |= ((z >> (bit * len(buckets) + ci)) & 1) << bit
    assert back == buckets


@given(
    st.floats(min_value=-1e6, max_value=1e6),
    st.floats(min_value=-1e3, max_value=1e3),
    st.floats(min_value=0.001, max_value=1e3),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_histogram_bucket_clamps(v, lo, width, n):
    """histogram's bucket expression: always lands in [0, n-1]."""
    import math
    hi = lo + width * n
    b = min(max(math.floor((v - lo) / ((hi - lo) / n)), 0), n - 1)
    assert 0 <= b <= n - 1


def _greedy_merge(sym, a, b):
    """Reference greedy left-to-right merge (what bpe_learn's aggregate
    fold must reproduce)."""
    out = []
    for s in sym:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


@given(st.text(alphabet="ab", min_size=0, max_size=20))
@settings(max_examples=300, deadline=None)
def test_bpe_greedy_merge_reference(word):
    """Greedy fold over 'aa' merges: result has no adjacent unmerged
    (a,a) pair that a left-to-right scan would have taken."""
    merged = _greedy_merge(list(word), "a", "a")
    assert "".join(merged) == word  # merging never alters the string
    for x, y in zip(merged, merged[1:]):
        # a leftover (a, a) adjacency means the fold missed a merge
        assert not (x == "a" and y == "a")


# ------------------------------------------------ r5 operator properties


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "x", ""]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=25, deadline=None)
def test_remove_duplicate_lines_matches_reference_model(docs, max_occ):
    """remove_duplicate_lines == the obvious python model (count lines
    corpus-wide, drop over-cap countable lines, reassemble in order)
    over random small corpora — any separator-joined doc shape."""
    from pyspark.sql import Row

    from ratatool_spark.operators.corpus import remove_duplicate_lines
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    rows = [Row(doc_id=i, text="\n".join(lines)) for i, lines in enumerate(docs)]
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in remove_duplicate_lines(
            spark.createDataFrame(rows), max_occurrences=max_occ
        ).collect()
    }
    # reference model
    from collections import Counter

    counts = Counter(
        ln
        for lines in docs
        for ln in ("\n".join(lines)).split("\n")
        if len(ln) >= 2
    )
    for i, lines in enumerate(docs):
        src = ("\n".join(lines)).split("\n")
        kept = [
            ln
            for ln in src
            if len(ln) < 2 or counts[ln] <= max_occ
        ]
        assert got[i] == ("\n".join(kept), len(src) - len(kept)), (i, docs)


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=120),
    st.integers(min_value=2, max_value=5),
    st.integers(min_value=4, max_value=32),
)
@settings(max_examples=15, deadline=None)
def test_kmv_quantile_sketch_merge_lossless_any_split(keys, n_splits, k):
    """Bottom-k losslessness holds for ANY partition of the rows into
    batches: merge(sketch(batch_i)) == sketch(all) — the property that
    makes per-day sketch tables sound."""
    from pyspark.sql import Row

    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        merge_quantile_sketches,
    )
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    rows = [
        Row(rid=i, g="g", v=float(kv)) for i, kv in enumerate(keys)
    ]
    df = spark.createDataFrame(rows)
    build = lambda d: build_quantile_sketches(  # noqa: E731
        d, ["g"], "v", ["rid"], k=k
    )
    parts = [
        df.where((df.rid % n_splits) == j) for j in range(n_splits)
    ]
    merged = merge_quantile_sketches(
        *[build(p) for p in parts if p.count() > 0]
    ).collect()
    direct = build(df).collect()
    gm = {tuple(r["g"]): None for r in []}  # noqa: F841
    assert len(merged) == len(direct) == 1
    assert merged[0]["sample"] == direct[0]["sample"]
    assert merged[0]["k"] == direct[0]["k"]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_cap_per_group_is_k_smallest_hashes(rows, cap):
    """cap_per_group keeps EXACTLY each group's k smallest portable
    hashes of the dice columns — verified against a python recomputation
    of the same md5 arithmetic."""
    import hashlib

    from pyspark.sql import Row

    from ratatool_spark.operators.corpus import cap_per_group
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    df = spark.createDataFrame([Row(source=s, doc_id=i) for s, i in rows])
    got = {
        (r["source"], r["doc_id"])
        for r in cap_per_group(
            df, group_col="source", max_rows=cap, seed=4
        ).collect()
    }

    def ph(i):
        feed = f"4\x01{i}".encode()
        return int(hashlib.md5(feed).hexdigest()[:15], 16)

    expect = set()
    groups: dict = {}
    for s, i in rows:
        groups.setdefault(s, []).append(i)
    for s, ids in groups.items():
        for i in sorted(ids, key=ph)[:cap]:
            expect.add((s, i))
    assert got == expect


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=2, max_size=60),
    st.lists(st.integers(min_value=0, max_value=300), min_size=2, max_size=60),
)
@settings(max_examples=10, deadline=None)
def test_set_overlap_estimates_match_python_model(a_keys, b_keys):
    """set_overlap_estimates == a python replay of the KMV estimator on
    random key sets (k chosen below the union size so the estimator path,
    not the exact small-set shortcut, is what's checked)."""
    import hashlib

    from pyspark.sql import Row

    from ratatool_spark.operators.timeagg import (
        build_set_sketches,
        set_overlap_estimates,
    )
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    k = 16
    rows = [Row(g="a", key=x) for x in a_keys] + [
        Row(g="b", key=x) for x in b_keys
    ]
    df = spark.createDataFrame(rows)
    out = set_overlap_estimates(
        build_set_sketches(df, ["g"], "key", k=k)
    ).collect()
    assert len(out) == 1
    got = (round(out[0]["est_jaccard"], 9), round(out[0]["est_intersection"], 6))

    def ph(x):
        return int(hashlib.md5(f"0\x01{x}".encode()).hexdigest()[:15], 16)

    ka = sorted({ph(x) for x in set(a_keys)})[:k]
    kb = sorted({ph(x) for x in set(b_keys)})[:k]
    union_k = sorted(set(ka) | set(kb))[:k]
    inter = [h for h in union_k if h in set(ka) and h in set(kb)]
    ej = len(inter) / len(union_k)
    if len(union_k) >= k:
        eu = (k - 1) / (union_k[k - 1] / float(1 << 60))
    else:
        eu = float(len(union_k))
    want = (round(ej, 9), round(ej * eu, 6))
    assert got == want


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=100),
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=2, max_value=3),
    st.integers(min_value=4, max_value=32),
)
@settings(max_examples=12, deadline=None)
def test_cms_merge_equals_direct_and_python_replay_any_split(
    keys, n_splits, depth, width
):
    """Count-min counter addition is associative: merging per-batch
    sketches over ANY partition of the rows equals the direct build, and
    both equal the pure-python CMS replay (portable hash + affine bucket
    map) — the property the exact DuckDB oracle relies on."""
    import collections
    import hashlib

    from pyspark.sql import Row

    from ratatool_spark.operators.freq import (
        CMS_MIX,
        CMS_P,
        build_freq_sketches,
        merge_freq_sketches,
    )
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    rows = [Row(rid=i, g="g", k=str(kv)) for i, kv in enumerate(keys)]
    df = spark.createDataFrame(rows)
    build = lambda d: build_freq_sketches(  # noqa: E731
        d, ["g"], "k", depth=depth, width=width
    )
    parts = [df.where((df.rid % n_splits) == j) for j in range(n_splits)]
    merged = merge_freq_sketches(
        *[build(p) for p in parts if p.count() > 0]
    ).collect()
    direct = build(df).collect()
    assert len(merged) == len(direct) == 1
    assert merged[0]["cms"] == direct[0]["cms"]
    assert merged[0]["n_rows"] == direct[0]["n_rows"] == len(keys)

    cnt = collections.Counter()
    for kv in keys:
        h = int(hashlib.md5(f"0\x01{kv}".encode()).hexdigest()[:15], 16)
        for j in range(depth):
            slot = (
                (h % CMS_P) * (j * 2 + 3) + ((j + 1) * CMS_MIX) % CMS_P
            ) % CMS_P % width
            cnt[j * width + slot] += 1
    assert {i: c for i, c in enumerate(direct[0]["cms"]) if c} == dict(cnt)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["b0", "b1", "b2"]),
            st.text(alphabet="abc ", max_size=6),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["b0", "b1", "b2"]),
            st.text(alphabet="abc ", max_size=6),
        ),
        min_size=1,
        max_size=12,
    ),
    st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=12, deadline=None)
def test_fuzzy_join_matches_python_replay(lrows, rrows, threshold):
    """fuzzy_join (lev_ratio, no guard) == the quadratic python replay
    within each block: same pair set, same similarity values, including
    the NULL/empty-scores-zero rule."""
    from pyspark.sql import Row

    from ratatool_spark.operators.fuzzy import fuzzy_join
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    left = spark.createDataFrame(
        [Row(lid=i, blk=b, name=t) for i, (b, t) in enumerate(lrows)]
    )
    right = spark.createDataFrame(
        [Row(rid=i, blk=b, name=t) for i, (b, t) in enumerate(rrows)]
    )
    got = {
        (r["lid"], r["rid"]): r["sim"]
        for r in fuzzy_join(
            left, right, "lid", "rid", "blk", [("name", "name")],
            threshold=threshold, max_block_size=None,
        ).collect()
    }
    want = {}
    for i, (lb, lt) in enumerate(lrows):
        for j, (rb, rt) in enumerate(rrows):
            if lb != rb:
                continue
            if not lt or not rt:
                sim = 0.0
            else:
                sim = 1.0 - _lev(lt, rt) / max(len(lt), len(rt), 1)
            if sim >= threshold:
                want[(i, j)] = sim
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k])


@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", None]),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=12, deadline=None)
def test_skew_report_matches_python_replay(values, top_k):
    """skew_report == the python replay on one column: counts, shares,
    skew ratios, entropy over the FULL histogram, deterministic ranking
    (count desc, value asc with None first), and the top_k cut."""
    import collections
    import math

    from pyspark.sql import Row

    from ratatool_spark.operators.freq import skew_report
    from ratatool_spark.session import get_spark

    spark = get_spark("ratatool_spark_tests", shuffle_partitions=8)
    df = spark.createDataFrame(
        [Row(i=i, k=v) for i, v in enumerate(values)],
        "i long, k string",
    )
    got = {
        r["rank"]: r
        for r in skew_report(df, ["k"], top_k=top_k).collect()
    }
    cnt = collections.Counter(values)
    n, nd = len(values), len(cnt)
    h = -sum((c / n) * math.log(c / n) for c in cnt.values())
    ranked = sorted(
        cnt.items(),
        key=lambda kv: (-kv[1], kv[0] is not None, kv[0] or ""),
    )[:top_k]
    assert len(got) == len(ranked)
    for rank, (v, c) in enumerate(ranked, 1):
        r = got[rank]
        assert (r["value"], r["cnt"], r["n_distinct"]) == (v, c, nd)
        assert r["share"] == pytest.approx(c / n)
        assert r["skew_ratio"] == pytest.approx(c * nd / n)
        assert r["entropy"] == pytest.approx(h)
