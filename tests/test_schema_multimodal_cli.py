"""Schema utilities, keyed-array diff, dict diff, multimodal plumbing, CLI."""

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from ratatool_spark.plans.schema import (
    SchemaCompatibilityError,
    assert_can_read,
    get_nested_field,
    merge_schemas,
)


def test_get_nested_field(spark):
    s = T.StructType.fromDDL("a struct<b:struct<c:int>>, d string")
    f = get_nested_field(s, "a.b.c")
    assert f.dataType == T.IntegerType()
    with pytest.raises(SchemaCompatibilityError):
        get_nested_field(s, "a.x")
    with pytest.raises(SchemaCompatibilityError):
        get_nested_field(s, "d.e")


def test_merge_schemas_union_and_conflict(spark):
    a = T.StructType.fromDDL("x int, y string")
    b = T.StructType.fromDDL("y string, z double")
    m = merge_schemas(a, b)
    assert [f.name for f in m.fields] == ["x", "y", "z"]
    c = T.StructType.fromDDL("y int")
    with pytest.raises(SchemaCompatibilityError, match="type mismatch"):
        merge_schemas(a, c)


def test_assert_can_read(spark):
    writer = T.StructType.fromDDL("x int, y string")
    reader_ok = T.StructType(
        [
            T.StructField("x", T.IntegerType(), False),
            T.StructField("extra", T.StringType(), True),  # nullable → fillable
        ]
    )
    assert_can_read(reader_ok, writer)
    reader_bad = T.StructType([T.StructField("q", T.IntegerType(), False)])
    with pytest.raises(SchemaCompatibilityError):
        assert_can_read(reader_bad, writer)


# ------------------------------------------------------ keyed-array diff


def test_keyed_array_diff(spark):
    """AvroDiffyTest.scala:185-212 semantics: keyed repeated records of
    different lengths yield field[key] UnknownDelta; common keys diff per
    child as field[key].child."""
    from ratatool_spark.operators.diffy import BigDiffy

    schema = "id int, rep array<struct<k:string, v:int>>"
    lhs = spark.createDataFrame(
        [(1, [("a", 1), ("b", 2)])], schema
    )
    rhs = spark.createDataFrame(
        [(1, [("a", 5), ("c", 9)])], schema
    )
    d = BigDiffy(lhs, rhs, ["id"], unordered_keys={"rep": "k"})
    deltas = {r["field"]: r for r in d.deltas.collect()}
    assert deltas["rep[a].v"]["delta"] == 4.0
    assert deltas["rep[a].v"]["delta_type"] == "NUMERIC"
    assert deltas["rep[b]"]["delta_type"] == "UNKNOWN"  # only lhs
    assert deltas["rep[c]"]["delta_type"] == "UNKNOWN"  # only rhs
    assert set(deltas) == {"rep[a].v", "rep[b]", "rep[c]"}


def test_keyed_array_same(spark):
    from ratatool_spark.operators.diffy import BigDiffy

    schema = "id int, rep array<struct<k:string, v:int>>"
    lhs = spark.createDataFrame([(1, [("a", 1), ("b", 2)])], schema)
    rhs = spark.createDataFrame([(1, [("b", 2), ("a", 1)])], schema)  # reordered
    d = BigDiffy(lhs, rhs, ["id"], unordered_keys={"rep": "k"})
    assert d.deltas.count() == 0
    assert d.key_stats.collect()[0]["diff_type"] == "SAME"


def test_diff_dicts(spark):
    """D7 (CaseClassDiffy): plain Python records through the same engine."""
    from ratatool_spark.operators.diffy import diff_dicts

    lhs = [{"id": 1, "x": 1.0, "s": "ab"}, {"id": 2, "x": 2.0, "s": "cd"}]
    rhs = [{"id": 1, "x": 3.0, "s": "ab"}, {"id": 2, "x": 2.0, "s": "cd"}]
    d = diff_dicts(spark, lhs, rhs, ["id"], schema="id int, x double, s string")
    deltas = d.deltas.collect()
    assert len(deltas) == 1
    assert deltas[0]["field"] == "x" and deltas[0]["delta"] == 2.0


# ----------------------------------------------------------- multimodal


def test_multimodal_decode_plumbing(spark):
    from ratatool_spark.operators.multimodal import decode_media, fake_media_table

    media = fake_media_table(spark, 50)
    out = decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["checksum"] is not None for r in rows)
    # deterministic
    again = {r["media_id"]: r["checksum"] for r in decode_media(media, fake=True).collect()}
    assert all(again[r["media_id"]] == r["checksum"] for r in rows)


def test_multimodal_real_decode_raises(spark):
    from ratatool_spark.operators.multimodal import decode_media, fake_media_table

    media = fake_media_table(spark, 2)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        decode_media(media, fake=False).collect()


def test_bmp_codec_roundtrip_padding_and_row_order():
    """Real stdlib BMP codec: 24-bit BI_RGB with 4-byte stride padding and
    bottom-up storage; decode inverts encode exactly for odd widths."""
    from ratatool_spark.operators.multimodal import decode_bmp, encode_bmp

    for w, h in [(1, 1), (3, 2), (5, 3), (7, 4), (10, 6)]:
        rgb = bytes(range(256)) * ((w * h * 3) // 256 + 1)
        rgb = rgb[: w * h * 3]
        enc = encode_bmp(w, h, rgb)
        # container sanity: magic, declared size, pixel offset
        assert enc[:2] == b"BM" and len(enc) == 54 + ((w * 3 + 3) & ~3) * h
        assert decode_bmp(enc) == (w, h, rgb), (w, h)
    # first stored row is the BOTTOM image row (bottom-up order is real)
    rgb = bytes([1, 2, 3, 4, 5, 6])  # 1x2: top pixel RGB(1,2,3), bottom (4,5,6)
    enc = encode_bmp(1, 2, rgb)
    assert enc[54:57] == bytes([6, 5, 4])  # bottom row first, BGR order


def test_bmp_decode_top_down_negative_height():
    """Negative biHeight = top-down storage — decode must not flip."""
    import struct

    from ratatool_spark.operators.multimodal import decode_bmp, encode_bmp

    rgb = bytes(range(24))  # 2x4... use 2 wide, 4 high: 2*4*3 = 24
    enc = bytearray(encode_bmp(2, 4, rgb))
    # flip to top-down: negate height, reorder rows + swap channels back
    stride = (2 * 3 + 3) & ~3
    rows = [enc[54 + r * stride : 54 + (r + 1) * stride] for r in range(4)]
    body = b"".join(bytes(r) for r in reversed(rows))
    struct.pack_into("<i", enc, 22, -4)
    out = bytes(enc[:54]) + body
    assert decode_bmp(out) == (2, 4, rgb)


def test_wav_codec_roundtrip():
    from ratatool_spark.operators.multimodal import decode_wav, encode_wav

    pcm = bytes(range(256)) * 2
    for rate in (8000, 16000, 44100):
        r, n, ch, out = decode_wav(encode_wav(rate, pcm))
        assert (r, n, ch, out) == (rate, 256, 1, pcm)


def test_png_codec_roundtrip_all_filters():
    """Real stdlib PNG codec (zlib): 8-bit truecolor, filters 0-4 each
    pinned individually AND the cycling default; decode inverts encode
    exactly, including the sequential Paeth/Average reconstruction."""
    from ratatool_spark.operators.multimodal import decode_png, encode_png

    for w, h in [(1, 1), (3, 2), (5, 3), (7, 4), (10, 6)]:
        rgb = bytes((i * 31 + 7) % 256 for i in range(w * h * 3))
        for ft in [None, 0, 1, 2, 3, 4]:
            enc = encode_png(w, h, rgb, filter_type=ft)
            assert enc[:8] == b"\x89PNG\r\n\x1a\n"
            assert decode_png(enc) == (w, h, rgb), (w, h, ft)


def test_png_decode_handmade_minimal():
    """Decode a PNG built by hand (not by our encoder): 2x1 image, filter
    0, known pixel bytes — pins the chunk layout and unfiltering against
    the spec rather than against our own encoder."""
    import struct
    import zlib

    from ratatool_spark.operators.multimodal import decode_png

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    scan = b"\x00" + bytes([10, 20, 30, 40, 50, 60])  # filter 0 + 2 px RGB
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (2, 1, bytes([10, 20, 30, 40, 50, 60]))


def test_png_decode_guards():
    """Corrupt CRC and unsupported color types raise, not mis-decode."""
    import struct

    import pytest as _pt

    from ratatool_spark.operators.multimodal import decode_png, encode_png

    enc = bytearray(encode_png(3, 2, bytes(range(18))))
    enc[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with _pt.raises(ValueError, match="CRC"):
        decode_png(bytes(enc))
    # unsupported: color type 6 (RGBA) in an otherwise-valid header
    good = bytearray(encode_png(3, 2, bytes(range(18))))
    # IHDR body starts at offset 16; color type is byte 9 of the body
    good[16 + 9] = 6
    import zlib

    body = bytes(good[16 : 16 + 13])
    struct.pack_into(
        ">I", good, 16 + 13, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with _pt.raises(NotImplementedError, match="truecolor"):
        decode_png(bytes(good))


def test_png_bmp_payload_agreement(spark):
    """The same RGB payload encoded as BMP and as PNG decodes to the same
    checksum through decode_real — two independent container paths
    agreeing pins both codecs (BMP is already JVM/oracle-validated)."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    bmp = {
        r["media_id"]: r["payload_md5"]
        for r in decode_real(
            make_test_media(spark, 12, seed=9, formats=("bmp",))
        ).collect()
    }
    png = {
        r["media_id"]: r["payload_md5"]
        for r in decode_real(
            make_test_media(spark, 12, seed=9, formats=("png",))
        ).collect()
    }
    assert bmp == png and len(bmp) == 12


def test_decode_real_end_to_end(spark):
    """make_test_media synthesizes real BMP/WAV bytes; decode_real parses
    them back — dimensions and payload checksums match the generation
    formulas (the multimodal_decode_real oracle's contract)."""
    import hashlib

    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    rows = {r["media_id"]: r for r in decode_real(make_test_media(spark, 20)).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        digest = hashlib.md5(f"42:{mid}".encode()).digest()
        if mid % 2 == 0:
            w, h = 3 + mid % 8, 2 + mid % 5
            assert (r["kind"], r["width"], r["height"]) == ("image", w, h)
            payload = (digest * (w * h * 3 // 16 + 1))[: w * h * 3]
        else:
            nf = 64 + mid % 33
            assert (r["kind"], r["sample_rate"], r["n_samples"]) == (
                "audio",
                8000 + (mid % 4) * 4000,
                nf,
            )
            payload = (digest * (nf * 2 // 16 + 1))[: nf * 2]
        assert r["payload_md5"] == hashlib.md5(payload.hex().encode()).hexdigest()


def test_decode_real_unknown_format_raises(spark):
    from ratatool_spark.operators.multimodal import decode_real, fake_media_table

    with pytest.raises(Exception, match="only BMP/PNG/WAV|NotImplementedError"):
        decode_real(fake_media_table(spark, 2)).collect()


def test_multimodal_features(spark):
    from ratatool_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        fake_media_table,
    )

    out = extract_features(fake_media_table(spark, 20)).collect()
    assert len(out) == 20
    assert all(len(r["features"]) == FEATURE_DIM for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r["features"])


def test_multimodal_frame_sampling(spark):
    from ratatool_spark.operators.multimodal import fake_media_table, sample_frames

    media = fake_media_table(spark, 60)
    frames = sample_frames(media, n=4)
    rows = frames.collect()
    videos = media.where("kind = 'video'").select("media_id", "meta.n_frames").collect()
    assert len(videos) > 0
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for v in videos:
        idxs = by_id[v["media_id"]]
        assert all(0 <= i < v["n_frames"] for i in idxs)
        assert idxs == sorted(idxs)
    # only video rows have frames
    assert set(by_id) == {v["media_id"] for v in videos}


# ------------------------------------------------------------------ CLI


def test_cli_sampler_and_diffy(spark, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "in.parquet")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(src)

    out1 = str(tmp_path / "sampled")
    rc = main(
        [
            "bigSampler",
            "--input", src,
            "--output", out1,
            "--fraction", "0.5",
            "--fields", "o_orderkey",
        ]
    )
    assert rc == 0
    n = spark.read.parquet(out1).count()
    assert 0 < n < 1500

    out2 = str(tmp_path / "diffout")
    rc = main(
        ["bigDiffy", "--lhs", src, "--rhs", out1, "--key", "o_orderkey", "--output", out2]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out2, "global", "_SUCCESS"))
    text = open(glob.glob(os.path.join(out2, "global", "*.csv"))[0]).read()
    assert "num_missing_rhs" in text


def test_cli_generate(spark, tmp_path):
    from ratatool_spark.cli import main

    out = str(tmp_path / "gen")
    rc = main(["generate", "--schema", "a bigint, b string", "-n", "100", "--output", out])
    assert rc == 0
    assert spark.read.parquet(out).count() == 100


def test_resize_media_deterministic_shape(spark):
    from ratatool_spark.operators.multimodal import fake_media_table, resize_media

    media = fake_media_table(spark, n=30)
    out = resize_media(media, 8, 8)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows.values())
    assert all(len(r["content"]) >= 8 * 8 * 3 for r in rows.values())
    again = {r["media_id"]: r for r in resize_media(media, 8, 8).collect()}
    assert all(bytes(rows[k]["content"]) == bytes(again[k]["content"]) for k in rows)


def test_resize_media_real_codec_gated(spark):
    import pytest

    from ratatool_spark.operators.multimodal import fake_media_table, resize_media

    media = fake_media_table(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        resize_media(media, 8, 8, fake=False).collect()


def test_cli_exact_dedup_against(spark, tmp_path):
    """exactDedupAgainst verb: bloom and plain paths keep identical rows."""
    from pyspark.sql import functions as F

    from ratatool_spark.cli import main

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    newp, corpp = str(tmp_path / "new"), str(tmp_path / "corpus")
    docs.where(F.col("doc_id") % 5 == 0).write.parquet(newp)
    docs.where(F.col("doc_id") % 5 != 0).write.parquet(corpp)
    base = ["exactDedupAgainst", "--input", newp, "--corpus", corpp,
            "--keyFields", "n_chars"]
    o1, o2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    assert main(base + ["--output", o1]) == 0
    assert main(base + ["--output", o2, "--noBloom"]) == 0
    a = {r["doc_id"] for r in spark.read.parquet(o1).collect()}
    b = {r["doc_id"] for r in spark.read.parquet(o2).collect()}
    assert a == b


def test_cli_save_signatures_and_dedup_against(spark, tmp_path):
    """saveSignatures → dedupAgainst --corpusSigs: the precomputed path
    keeps the same rows as the fresh path; mismatched flags exit loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ratatool_spark.cli import main

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    newp, corpp = str(tmp_path / "new"), str(tmp_path / "corpus")
    docs.where(F.col("doc_id") % 4 == 0).write.parquet(newp)
    docs.where(F.col("doc_id") % 4 != 0).write.parquet(corpp)
    sigs = str(tmp_path / "sigs")
    assert main(["saveSignatures", "--input", corpp, "--output", sigs]) == 0

    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    base = ["dedupAgainst", "--input", newp, "--corpus", corpp, "--threshold", "0.4"]
    assert main(base + ["--output", out1]) == 0
    assert main(base + ["--output", out2, "--corpusSigs", sigs]) == 0
    a = {r["doc_id"] for r in spark.read.parquet(out1).collect()}
    b = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert a == b and a

    with _pytest.raises(SystemExit, match="num_hashes"):
        main(base + ["--output", str(tmp_path / "o3"), "--corpusSigs", sigs,
                     "--numHashes", "32"])


def test_cli_near_dedup(spark, tmp_path):
    """nearDedup verb: survivors written, fewer or equal rows, schema kept."""
    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    out = str(tmp_path / "deduped")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)
    rc = main(
        [
            "nearDedup",
            "--input", src,
            "--output", out,
            "--threshold", "0.5",
        ]
    )
    assert rc == 0
    result = spark.read.parquet(out)
    assert result.schema == docs.schema
    assert 0 < result.count() < docs.count()


def test_cli_near_dedup_score_field(spark, tmp_path):
    """--scoreField survivor rule: clusters keep the max-score doc."""
    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    out = str(tmp_path / "deduped")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)
    rc = main(
        [
            "nearDedup",
            "--input", src,
            "--output", out,
            "--threshold", "0.5",
            "--scoreField", "n_chars",
        ]
    )
    assert rc == 0
    result = spark.read.parquet(out)
    assert result.schema == docs.schema
    assert 0 < result.count() < docs.count()


def test_cli_substring_dedup(spark, tmp_path):
    """substringDedup verb: containment pairs written with the two id cols."""
    from pyspark.sql import Row

    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    out = str(tmp_path / "pairs")
    rows = [
        Row(doc_id=1, text="alpha bravo charlie delta echo foxtrot golf hotel india"),
        Row(
            doc_id=2,
            text="pre alpha bravo charlie delta echo foxtrot golf hotel india post",
        ),
        Row(doc_id=3, text="one two three four five six seven eight nine ten"),
    ]
    spark.createDataFrame(rows).write.parquet(src)
    rc = main(["substringDedup", "--input", src, "--output", out])
    assert rc == 0
    got = {
        (r["contained_id"], r["container_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 2)}


def test_cli_pack_sequences(spark, tmp_path):
    """packSequences verb: bin + offset columns appended, bins respect the
    concat-and-chunk assignment within each group."""
    from ratatool_spark.cli import main

    src = str(tmp_path / "docs_pack")
    out = str(tmp_path / "packed")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)
    rc = main(
        [
            "packSequences",
            "--input", src,
            "--output", out,
            "--tokenField", "n_chars",
            "--budget", "4096",
            "--orderBy", "doc_id",
            "--groupBy", "source",
            "--offsetField", "off",
        ]
    )
    assert rc == 0
    result = spark.read.parquet(out)
    assert result.count() == docs.count()
    assert {"bin_id", "off"} <= set(result.columns)
    rows = sorted(
        result.select("source", "doc_id", "n_chars", "bin_id", "off").collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    run: dict = {}
    for r in rows:
        exp = run.get(r["source"], 0)
        assert r["off"] == exp
        assert r["bin_id"] == exp // 4096
        run[r["source"]] = exp + r["n_chars"]


def test_cli_mixture_and_contamination(spark, tmp_path):
    from pyspark.sql import functions as F

    from ratatool_spark.cli import main

    src = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)

    out1 = str(tmp_path / "mixed")
    rc = main(
        [
            "mixtureSample",
            "--input", src,
            "--output", out1,
            "--shares", "src0=0.5,src1=0.5",
            "--seed", "3",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out1)
    srcs = {r["source"] for r in got.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1"} and got.count() > 0

    bench = str(tmp_path / "bench.parquet")
    spark.read.parquet(src).where(F.col("doc_id") % 7 == 0).write.parquet(bench)
    out2 = str(tmp_path / "contam")
    rc = main(
        [
            "contamination",
            "--input", src,
            "--benchmark", bench,
            "--output", out2,
        ]
    )
    assert rc == 0
    c = spark.read.parquet(out2)
    assert c.count() > 0
    mx = c.agg(F.max("contamination")).collect()[0][0]
    assert mx == 1.0  # benchmark docs are contaminated with themselves


def test_cli_bpe_learn_and_encode(spark, tmp_path):
    """bpeLearn writes an ordered merge list; bpeEncode segments with it
    and the output matches the library call."""
    import json

    from ratatool_spark.cli import main
    from ratatool_spark.operators.corpus import bpe_segment

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        50
    ).write.parquet(src)
    merges_path = str(tmp_path / "merges.json")
    out = str(tmp_path / "encoded")
    assert main(["bpeLearn", "--input", src, "--output", merges_path,
                 "--nMerges", "5"]) == 0
    merges = [tuple(m) for m in json.loads(open(merges_path).read())]
    assert len(merges) == 5
    assert main(["bpeEncode", "--input", src, "--output", out,
                 "--merges", merges_path]) == 0
    got = spark.read.parquet(out)
    assert "bpe_syms" in got.columns and "n_bpe_tokens" in got.columns
    lib = bpe_segment(spark.read.parquet(src), merges)
    assert got.count() == lib.count()
    g = {r["doc_id"]: r["n_bpe_tokens"] for r in got.collect()}
    w = {r["doc_id"]: r["n_bpe_tokens"] for r in lib.collect()}
    assert g == w


def test_cli_upsert(spark, tmp_path, capsys):
    import json

    from ratatool_spark.cli import main

    base = str(tmp_path / "base")
    upd = str(tmp_path / "upd")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.parquet(base)
    spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string").write.parquet(upd)
    assert main(["upsert", "--base", base, "--updates", upd, "--keys", "k"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"inserted": 1, "updated": 1, "deleted": 0, "total": 3}
    got = {r["k"]: r["v"] for r in spark.read.parquet(base).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_cli_reference_flag_parity(spark, tmp_path):
    """Reference-CLI spellings work end-to-end: bigSampler --sample (alias
    of --fraction) + --byteEncoding + --rowRestriction; bigDiffy
    --unorderedFieldKey path:key + --rowRestriction."""
    from ratatool_spark.cli import main

    src = str(tmp_path / "orders")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(src)

    out = str(tmp_path / "sampled")
    rc = main(
        [
            "bigSampler",
            "--input", src,
            "--output", out,
            "--sample", "0.5",
            "--fields", "o_orderkey",
            "--byteEncoding", "base64",
            "--rowRestriction", "o_totalprice > 100000",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert 0 < got.count() < spark.read.parquet(src).count()
    assert got.where("o_totalprice <= 100000").count() == 0

    # keyed unordered arrays through the CLI spelling
    lhs = str(tmp_path / "lhs")
    rhs = str(tmp_path / "rhs")
    schema = "id int, rep array<struct<k:string, v:int>>"
    spark.createDataFrame([(1, [("a", 1), ("b", 2)])], schema).write.parquet(lhs)
    spark.createDataFrame([(1, [("b", 2), ("a", 1)])], schema).write.parquet(rhs)
    stats = str(tmp_path / "stats")
    rc = main(
        [
            "bigDiffy",
            "--lhs", lhs,
            "--rhs", rhs,
            "--key", "id",
            "--output", stats,
            "--unorderedFieldKey", "rep:k",
        ]
    )
    assert rc == 0
    g = (
        spark.read.option("header", True)
        .option("sep", "\t")
        .csv(f"{stats}/global")
        .collect()[0]
    )
    # reordered keyed array must diff as SAME — the flag's whole point
    assert int(g["num_same"]) == 1 and int(g["num_diff"]) == 0

    # malformed pairs rejected cleanly
    import pytest as _pt

    with _pt.raises(SystemExit, match="non-empty path:key"):
        main(["bigDiffy", "--lhs", lhs, "--rhs", rhs, "--key", "id",
              "--output", str(tmp_path / "s2"), "--unorderedFieldKey", "rep:"])
    with _pt.raises(SystemExit, match="repeats path"):
        main(["bigDiffy", "--lhs", lhs, "--rhs", rhs, "--key", "id",
              "--output", str(tmp_path / "s3"),
              "--unorderedFieldKey", "rep:k,rep:v"])


def test_cli_dedup_lines(spark, tmp_path):
    from pyspark.sql import Row

    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    spark.createDataFrame(
        [
            Row(doc_id=1, text="boiler plate line\nreal content"),
            Row(doc_id=2, text="boiler plate line\nother words"),
        ]
    ).write.parquet(src)
    rc = main(["dedupLines", "--input", src, "--output", out])
    assert rc == 0
    got = {r["doc_id"]: (r["text"], r["n_lines_removed"])
           for r in spark.read.parquet(out).collect()}
    assert got == {1: ("real content", 1), 2: ("other words", 1)}


def test_cli_tfidf_dedup(spark, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    out = str(tmp_path / "pairs")
    rc = main(["tfidfDedup", "--input", src, "--output", out,
               "--threshold", "0.9"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id_a", "id_b", "cosine"}
    assert got.where("cosine < 0.9").count() == 0


def test_cli_quantile_sketch_pipeline(spark, tmp_path):
    """build x2 -> merge -> estimate through the CLI equals a direct
    build+estimate (the lossless-merge contract, exercised end-to-end
    through parquet artifacts)."""
    from pyspark.sql import functions as F

    from ratatool_spark.cli import main
    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        estimate_quantiles,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", names=("events",))[
        "events"
    ].select("event_id", "event_type", "value")
    a_src, b_src = str(tmp_path / "a"), str(tmp_path / "b")
    ev.where(F.col("event_id") % 2 == 0).write.parquet(a_src)
    ev.where(F.col("event_id") % 2 == 1).write.parquet(b_src)
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    for src, dst in [(a_src, sa), (b_src, sb)]:
        assert main([
            "quantileSketch", "--mode", "build", "--input", src,
            "--output", dst, "--groupBy", "event_type",
            "--valueField", "value", "--keyFields", "event_id", "--k", "128",
        ]) == 0
    merged = str(tmp_path / "merged")
    assert main(["quantileSketch", "--mode", "merge",
                 "--inputs", f"{sa},{sb}", "--output", merged]) == 0
    est = str(tmp_path / "est")
    assert main(["quantileSketch", "--mode", "estimate", "--input", merged,
                 "--output", est, "--quantiles", "0.5,0.9"]) == 0
    got = {
        r["event_type"]: (r["q_50"], r["q_90"])
        for r in spark.read.parquet(est).collect()
    }
    want = {
        r["event_type"]: (r["q_50"], r["q_90"])
        for r in estimate_quantiles(
            build_quantile_sketches(
                ev, ["event_type"], "value", ["event_id"], k=128
            ),
            [0.5, 0.9],
        ).collect()
    }
    assert got == want


def test_cli_cap_per_group(spark, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    out = str(tmp_path / "capped")
    rc = main(["capPerGroup", "--input", src, "--output", out,
               "--groupField", "source", "--maxRows", "2"])
    assert rc == 0
    got = spark.read.parquet(out).groupBy("source").count().collect()
    assert got and all(r["count"] <= 2 for r in got)


def test_cli_profile_pii(spark, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    out = str(tmp_path / "pii")
    rc = main(["profilePii", "--input", src, "--output", out])
    assert rc == 0
    got = {r["column"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"text", "lang", "source"}
    assert all(r["n_email"] == 0 for r in got.values())


def test_image_dhash_format_invariant_and_near_dup(spark):
    """dHash is a function of PIXELS, not the container: the same RGB
    payload encoded as BMP and as PNG fingerprints identically; a
    one-byte payload bump stays within a few bits; unrelated images sit
    far apart; non-image/NULL rows give NULL dhash."""
    import hashlib

    from ratatool_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
        image_dhash,
        image_near_dup_pairs,
        make_near_dup_media,
    )

    w, h = 9, 7
    need = w * h * 3
    digest = hashlib.md5(b"dhash-fixture").digest()
    rgb = (digest * (need // 16 + 1))[:need]
    bumped = bytes([(rgb[0] + 8) % 256]) + rgb[1:]
    rows = [
        (1, bytearray(encode_bmp(w, h, rgb))),
        (2, bytearray(encode_png(w, h, rgb))),
        (3, bytearray(encode_bmp(w, h, bumped))),
        (4, bytearray(encode_wav(8000, b"\x00\x01" * 64))),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in image_dhash(df).collect()}
    assert got[1]["dhash"] == got[2]["dhash"]  # BMP == PNG, same pixels
    assert got[1]["width"] == w and got[1]["height"] == h
    assert got[4]["dhash"] is None and got[5]["dhash"] is None
    ham = bin(got[1]["dhash"] ^ got[3]["dhash"]).count("1")
    assert ham <= 6

    # the pair operator finds exactly the near-dup clique {1,2,3}
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)] == 0

    # the oracle fixture: every twin pair is found, nothing else
    media = make_near_dup_media(spark, n_groups=8, seed=42)
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert got_pairs == {(2 * k, 2 * k + 1) for k in range(8)}


def test_fingerprint_pairs_matches_brute_force(spark):
    """The Manku blocked join returns EXACTLY the Hamming <= t pairs a
    brute-force all-pairs scan finds (recall 1.0 by pigeonhole, no
    spurious extras), on fingerprints engineered to straddle the
    threshold."""
    from ratatool_spark.operators.dedup import fingerprint_pairs

    base = 0b10110110_01011011_00110101_11001010
    rows = [
        (1, base),
        (2, base ^ 0b1),  # ham 1
        (3, base ^ 0b111000),  # ham 3
        (4, base ^ 0b11111),  # ham 5 -> out at t=3
        (5, 0),  # far
    ]
    df = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fingerprint_pairs(df, "id", "fp", bits=32, max_hamming=3).collect()
    }
    exp = {}
    for i, (ia, fa) in enumerate(rows):
        for ib, fb in rows[i + 1 :]:
            d = bin(fa ^ fb).count("1")
            if d <= 3:
                exp[(ia, ib)] = d
    assert got == exp and (1, 2) in got and (1, 4) not in got


def test_cli_r6_classifiers_and_dedup(spark, tmp_path):
    """The five r6 subcommands round-trip through the CLI and match
    their operator outputs: dedupSpans, semanticDedup (--keptOnly),
    nbClassify, qualityClassify, imageDedup."""
    from pyspark.sql import functions as F

    from ratatool_spark.cli import main
    from ratatool_spark.operators.multimodal import make_near_dup_media

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g", "es"),
            (2, "x y z a b c d q r", "es"),
            (3, "unique tokens only here", "en"),
            (4, "more unique english prose", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    out = str(tmp_path / "spans")
    assert main([
        "dedupSpans", "--input", src, "--output", out,
        "--spanTokens", "3", "--maxOccurrences", "1",
    ]) == 0
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[1] == "e f g" and got[2] == "x y z q r"

    out = str(tmp_path / "nb")
    assert main([
        "nbClassify", "--train", src, "--labelField", "lang",
        "--input", src, "--output", out, "--nBuckets", "64",
    ]) == 0
    assert spark.read.parquet(out).count() == 4

    out = str(tmp_path / "qc")
    assert main([
        "qualityClassify", "--posInput", src, "--negInput", src,
        "--input", src, "--output", out, "--nBuckets", "64",
    ]) == 0
    qc = spark.read.parquet(out)
    assert qc.count() == 4 and "prob" in qc.columns

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.02, 0.0, 0.0]),
            (2, [1.0, 0.00, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    esrc = str(tmp_path / "emb")
    emb.write.parquet(esrc)
    out = str(tmp_path / "sdd")
    assert main([
        "semanticDedup", "--input", esrc, "--output", out,
        "--tau", "0.995", "--nCentroids", "2", "--keptOnly",
    ]) == 0
    kept = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert 3 in kept and len(kept) == 2  # one of the twins dropped

    msrc = str(tmp_path / "media")
    make_near_dup_media(spark, n_groups=4, seed=42).write.parquet(msrc)
    out = str(tmp_path / "idd")
    assert main(["imageDedup", "--input", msrc, "--output", out]) == 0
    pairs = {
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()
    }
    assert pairs == {(2 * k, 2 * k + 1) for k in range(4)}


def test_audio_fingerprint_semantics(spark):
    """Energy-difference fingerprint: identical PCM -> identical afp; a
    one-byte amplitude bump stays within a few bits; non-audio, NULL,
    and sub-61-sample clips yield NULL afp; the wav near-dup fixture's
    twin pairs are exactly what the pair operator returns."""
    import hashlib

    from ratatool_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
        encode_bmp,
        encode_wav,
        make_near_dup_media,
    )

    digest = hashlib.md5(b"afp-fixture").digest()
    pcm = (digest * 12)[:180]  # 90 samples
    bumped = bytes([(pcm[0] + 8) % 256]) + pcm[1:]
    rows = [
        (1, bytearray(encode_wav(8000, pcm))),
        (2, bytearray(encode_wav(16000, pcm))),  # rate differs, PCM same
        (3, bytearray(encode_wav(8000, bumped))),
        (4, bytearray(encode_wav(8000, pcm[:40]))),  # 20 samples: too short
        (5, bytearray(encode_bmp(3, 2, bytes(18)))),  # image, not audio
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in audio_fingerprint(df).collect()}
    assert got[1]["afp"] == got[2]["afp"]  # fingerprint is of the PCM
    assert got[1]["n_samples"] == 90 and got[1]["sample_rate"] == 8000
    assert bin(got[1]["afp"] ^ got[3]["afp"]).count("1") <= 6
    assert got[4]["afp"] is None and got[4]["n_samples"] == 20
    assert got[5]["afp"] is None and got[6]["afp"] is None

    media = make_near_dup_media(spark, n_groups=6, seed=42, fmt="wav")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert pairs == {(2 * k, 2 * k + 1) for k in range(6)}


def test_cli_bm25_rrf_c4(spark, tmp_path):
    from ratatool_spark.cli import main

    docs = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs)
    q = str(tmp_path / "q.parquet")
    spark.createDataFrame(
        [(1, "table scan fast"), (2, "window agg")],
        "query_id long, qtext string",
    ).write.parquet(q)

    # direct search
    out1 = str(tmp_path / "bm25_direct")
    assert main(
        ["bm25Search", "--corpus", docs, "--queries", q,
         "--output", out1, "--k", "3"]
    ) == 0
    direct = spark.read.parquet(out1)
    assert direct.count() == 6
    assert set(direct.columns) == {"query_id", "doc_id", "score", "rank"}

    # build index, then query it without --corpus
    idx = str(tmp_path / "bm25_idx")
    out2 = str(tmp_path / "bm25_via_idx")
    assert main(
        ["bm25Search", "--corpus", docs, "--queries", q,
         "--saveIndex", idx, "--output", out2, "--k", "3"]
    ) == 0
    out3 = str(tmp_path / "bm25_idx_only")
    assert main(
        ["bm25Search", "--index", idx, "--queries", q,
         "--output", out3, "--k", "3"]
    ) == 0
    a = sorted(map(tuple, spark.read.parquet(out1).collect()))
    c = sorted(map(tuple, spark.read.parquet(out3).collect()))
    assert a == c

    # fuse the ranking with itself: same order, doubled contributions
    fused = str(tmp_path / "fused")
    assert main(
        ["rrfFuse", "--inputs", f"{out1},{out3}", "--output", fused,
         "--topk", "2"]
    ) == 0
    fdf = spark.read.parquet(fused)
    assert fdf.count() == 4
    assert fdf.where("n_systems != 2").count() == 0

    # c4 filter: the flat corpus has no terminal punctuation -> keepOnly
    # drops everything; without it every page row survives with flags
    out4 = str(tmp_path / "c4")
    assert main(
        ["c4Filter", "--input", docs, "--output", out4,
         "--minKeptLines", "1", "--badwords", "table,scan"]
    ) == 0
    cdf = spark.read.parquet(out4)
    assert cdf.count() == spark.read.parquet(docs).count()
    assert cdf.where("has_badword").count() > 0
    assert cdf.where("keep").count() == 0


def test_cli_normalize_text(spark, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(0, "a  b\x07c")], "doc_id long, text string"
    ).write.parquet(src)
    out = str(tmp_path / "norm")
    assert main(["normalizeText", "--input", src, "--output", out]) == 0
    r = spark.read.parquet(out).collect()[0]
    assert r.text == "a bc" and r.changed


def test_cli_graph_url_profile_verbs(spark, tmp_path):
    """The r6 planning/QC verbs: pageRank, urlNormalize, mutualInfo,
    madOutliers, sketchJoinSize, updateIvfIndex."""
    import json as _json

    from ratatool_spark.cli import main

    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    ).write.parquet(edges)
    pr_out = str(tmp_path / "pr")
    assert main(["pageRank", "--input", edges, "--output", pr_out,
                 "--iterations", "3"]) == 0
    ranks = {r["node"]: r["rank_fx"] for r in spark.read.parquet(pr_out).collect()}
    assert len(ranks) == 4 and all(v > 0 for v in ranks.values())

    urls = str(tmp_path / "urls")
    spark.createDataFrame(
        [("HTTP://WWW.Ex.CO.UK:80/A?utm_x=1&b=2#f",)], "url string"
    ).write.parquet(urls)
    un_out = str(tmp_path / "un")
    assert main(["urlNormalize", "--input", urls, "--output", un_out]) == 0
    r = spark.read.parquet(un_out).collect()[0]
    assert r["url_norm"] == "http://www.ex.co.uk/A?b=2"
    assert r["domain"] == "ex.co.uk"

    tbl = str(tmp_path / "tbl")
    spark.createDataFrame(
        [("a", "a", 1.0), ("b", "b", 2.0), ("a", "a", 3.0), ("b", "b", 100.0)],
        "x string, y string, v double",
    ).write.parquet(tbl)
    mi_out = str(tmp_path / "mi")
    assert main(["mutualInfo", "--input", tbl, "--pairs", "x:y",
                 "--output", mi_out]) == 0
    assert spark.read.parquet(mi_out).collect()[0]["nmi"] == 1.0
    mo_out = str(tmp_path / "mo")
    assert main(["madOutliers", "--input", tbl, "--valueField", "v",
                 "--exact", "--output", mo_out]) == 0
    assert {r["is_outlier"] for r in spark.read.parquet(mo_out).collect()} == {True, False}

    # sketchJoinSize over two persisted sketch tables
    from ratatool_spark.operators.freq import build_freq_sketches

    ev = spark.createDataFrame([("g", i % 3) for i in range(30)], "g string, k long")
    ska, skb = str(tmp_path / "ska"), str(tmp_path / "skb")
    build_freq_sketches(ev, ["g"], "k", depth=4, width=64).write.parquet(ska)
    build_freq_sketches(ev, ["g"], "k", depth=4, width=64).write.parquet(skb)
    sj_out = str(tmp_path / "sj")
    assert main(["sketchJoinSize", "--sketchA", ska, "--sketchB", skb,
                 "--output", sj_out]) == 0
    assert spark.read.parquet(sj_out).collect()[0]["est_join_rows"] == 300

    # updateIvfIndex appends against the stored sidecar centroids
    from ratatool_spark.operators.similarity import build_ivf_index

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(vecs.where("vec_id < 10"), idx, n_centroids=2, train_iters=0)
    newv = str(tmp_path / "newv")
    vecs.where("vec_id >= 10").write.parquet(newv)
    assert main(["updateIvfIndex", "--index", idx, "--input", newv]) == 0
    assert spark.read.parquet(idx).count() == 20


def test_cli_drift_report(spark, tmp_path):
    from ratatool_spark.cli import main

    lhs, rhs = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame([("x", 1.0)] * 10 + [("y", 2.0)] * 10,
                          "c string, v double").write.parquet(lhs)
    spark.createDataFrame([("x", 9.0)] * 18 + [("y", 2.0)] * 2,
                          "c string, v double").write.parquet(rhs)
    out = str(tmp_path / "drift")
    assert main(["driftReport", "--lhs", lhs, "--rhs", rhs,
                 "--categorical", "c", "--numeric", "v",
                 "--output", out]) == 0
    rows = {r["column"]: r["psi"] for r in spark.read.parquet(out).collect()}
    assert rows["v"] > 1.0 and rows["c"] > 0.1


def test_cli_round7_commands(spark, tmp_path):
    """neymanSampler / zorderWrite / rendezvousShard / recordLinkage /
    decontaminate end-to-end through the CLI."""
    from pyspark.sql import functions as F

    from ratatool_spark.cli import main

    src = str(tmp_path / "orders.parquet")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(src)

    out = str(tmp_path / "neyman")
    rc = main([
        "neymanSampler", "--input", src, "--output", out,
        "--totalN", "100", "--valueField", "o_totalprice",
        "--strata", "o_orderpriority", "--fields", "o_orderkey",
    ])
    assert rc == 0 and spark.read.parquet(out).count() == 100

    out = str(tmp_path / "zordered")
    rc = main([
        "zorderWrite", "--input", src, "--output", out,
        "--by", "o_custkey,o_totalprice", "--numPartitions", "4",
    ])
    assert rc == 0
    assert spark.read.parquet(out).count() == spark.read.parquet(src).count()

    out = str(tmp_path / "sharded")
    rc = main([
        "rendezvousShard", "--input", src, "--output", out,
        "--keyField", "o_orderkey", "--shards", "a,b,c",
    ])
    assert rc == 0
    shards = {r["shard"] for r in spark.read.parquet(out).select("shard").distinct().collect()}
    assert shards == {"a", "b", "c"}

    out = str(tmp_path / "links")
    rc = main([
        "recordLinkage", "--lhs", src, "--rhs", src, "--output", out,
        "--lhsId", "o_orderkey", "--rhsId", "o_orderkey",
        "--blockField", "o_custkey",
        "--compare", "o_orderpriority:0.9:0.2",
        "--compare", "o_totalprice:0.95:0.001",
        "--threshold", "5.0",
    ])
    assert rc == 0
    links = spark.read.parquet(out)
    # every row links to itself at full agreement
    n_src = spark.read.parquet(src).count()
    assert links.where(F.col("o_orderkey_l") == F.col("o_orderkey_r")).count() == n_src

    docs = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs)
    bench = str(tmp_path / "bench.parquet")
    spark.read.parquet(docs).where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text", "lang", "source", "n_chars"
    ).write.parquet(bench)
    out = str(tmp_path / "clean")
    rc = main([
        "decontaminate", "--input", docs, "--benchmark", bench,
        "--output", out, "--minEstJaccard", "0.9",
    ])
    assert rc == 0
    n_docs = spark.read.parquet(docs).count()
    survivors = spark.read.parquet(out)
    # every planted original is flagged and dropped; corpus-internal
    # near-dups of planted docs may legitimately be flagged too
    assert survivors.where(F.col("doc_id") % 10 == 0).count() == 0
    n_flagged = spark.read.parquet(docs).where(F.col("doc_id") % 10 == 0).count()
    assert 0 < survivors.count() <= n_docs - n_flagged
