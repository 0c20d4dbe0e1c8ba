"""Pure-Python baseline JPEG codec (operators/jpeg_py) + its seam into
multimodal.decode_real / image_dhash."""

import numpy as np
import pytest

from ratatool_spark.operators.jpeg_py import decode_jpeg, encode_jpeg


def _smooth(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            (128 + 100 * np.sin(xx / 9)).clip(0, 255),
            (128 + 100 * np.cos(yy / 7)).clip(0, 255),
            (128 + 80 * np.sin((xx + yy) / 11)).clip(0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    return px


def test_constant_image_roundtrips_exactly():
    w, h = 19, 13  # non-multiple-of-8: partial edge blocks
    rgb = bytes([120, 200, 40]) * (w * h)
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality=90))
    assert (ww, hh) == (w, h)
    a = np.frombuffer(rgb, np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    assert np.abs(a - b).max() == 0


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_smooth_roundtrip_bounded_error(subsample, restart):
    w, h = 53, 37
    px = _smooth(w, h)
    data = encode_jpeg(
        w, h, px.tobytes(), quality=90, subsample=subsample,
        restart_interval=restart,
    )
    ww, hh, out = decode_jpeg(data)
    assert (ww, hh) == (w, h)
    b = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(px.astype(int) - b)
    # 4:4:4 is near-lossless on smooth content; 4:2:0 adds chroma pooling
    assert err.max() <= (20 if subsample == "420" else 8)
    assert err.mean() < 4.0


def test_restart_markers_change_bytes_not_pixels():
    w, h = 40, 24
    px = _smooth(w, h).tobytes()
    d0 = encode_jpeg(w, h, px, restart_interval=0)
    d2 = encode_jpeg(w, h, px, restart_interval=2)
    assert d0 != d2 and b"\xff\xdd" in d2  # DRI present
    assert decode_jpeg(d0) == decode_jpeg(d2)  # predictor resets lossless


def test_deterministic_bitstream():
    w, h = 32, 24
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8).tobytes()
    assert encode_jpeg(w, h, px, 95) == encode_jpeg(w, h, px, 95)


def test_arithmetic_and_malformed_progressive_rejected():
    data = bytearray(encode_jpeg(8, 8, bytes(8 * 8 * 3)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9  # arithmetic coding: still unsupported
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(data))
    # SOF2 with a baseline scan header (Ss=0, Se=63) is spec-invalid
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"BMnotajpeg")


def test_decode_real_parses_jpeg(spark):
    """The multimodal seam: JPEG media rows decode to real dimensions and
    a pixel checksum through the distributed decode_real path."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    media = make_test_media(spark, n=6, seed=7, formats=("jpeg",))
    rows = {r["media_id"]: r for r in decode_real(media).collect()}
    assert len(rows) == 6
    for mid, r in rows.items():
        assert r["kind"] == "image"
        assert r["width"] == 11 + mid % 10 and r["height"] == 9 + mid % 7
        assert len(r["payload_md5"]) == 32


def test_image_dhash_works_on_jpeg(spark):
    """Perceptual dedup rides the new codec: a JPEG re-encode of the same
    pixels dhash-matches the BMP original (dhash is gradient-sign based,
    robust to quantization noise)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
        make_test_media,
    )

    media = make_test_media(spark, n=2, seed=7, formats=("jpeg",)).where(
        F.col("media_id") == 0
    )
    [jpeg_row] = image_dhash(media).collect()
    # rebuild the same pixels as a lossless BMP and compare dhash bits
    import hashlib as _hl

    digest = _hl.md5(b"7:0").digest()
    w, h = 11, 9
    rgb = (digest * (w * h * 3 // 16 + 1))[: w * h * 3]
    import pandas as pd

    bmp = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "content": [encode_bmp(w, h, rgb)]}),
        schema="media_id long, content binary",
    )
    [bmp_row] = image_dhash(bmp).collect()
    # noise images are dhash-adversarial; quality-90 JPEG still keeps the
    # gradient signs mostly intact — allow a small hamming slack
    diff = bin(jpeg_row["dhash"] ^ bmp_row["dhash"]).count("1")
    assert diff <= 12, diff


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; some encoders pad with them. Decoding must be byte-for-byte
    identical with fills inserted before segment markers."""
    w, h = 16, 8
    px = _smooth(w, h).tobytes()
    data = encode_jpeg(w, h, px, quality=90)
    assert data[:2] == b"\xff\xd8" and data[2:4] == b"\xff\xe0"
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    assert decode_jpeg(padded) == decode_jpeg(data)


def test_sos_component_order_differs_from_sof():
    """A spec-valid stream may list SOS components in a different order
    than SOF declared them; planes must map back to SOF positions (a
    scan-order indexer would decode with Cb/Cr swapped). Builds a 4:4:4
    stream whose scan order is Y, Cr, Cb and checks the pixels equal the
    normally-ordered encoding's."""
    import struct

    import ratatool_spark.operators.jpeg_py as J

    w = h = 8
    px = _smooth(w, h)
    normal = encode_jpeg(w, h, px.tobytes(), quality=90)

    # --- re-encode with SOS order (1, 3, 2): entropy blocks Y, Cr, Cb
    qy_z, qc_z = J._scaled_tables(90)
    qy = np.zeros(64, dtype=np.int64)
    qc = np.zeros(64, dtype=np.int64)
    qy[J._ZIGZAG] = qy_z
    qc[J._ZIGZAG] = qc_z
    qy8, qc8 = qy.reshape(8, 8), qc.reshape(8, 8)
    fpx = px.astype(np.float64)
    r, g, b = fpx[:, :, 0], fpx[:, :, 1], fpx[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    hdr = bytearray()
    hdr += b"\xff\xd8"
    hdr += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00])
    hdr += bytes(qy_z.astype(np.uint8))
    hdr += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01])
    hdr += bytes(qc_z.astype(np.uint8))
    hdr += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    hdr += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, (bits, vals) in (
        (0x00, J._HUFF_DC_LUMA),
        (0x10, J._HUFF_AC_LUMA),
        (0x01, J._HUFF_DC_CHROMA),
        (0x11, J._HUFF_AC_CHROMA),
    ):
        hdr += (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )
    # SOS listing components 1, 3, 2
    hdr += b"\xff\xda" + struct.pack(">HB", 12, 3)
    hdr += bytes([1, 0x00, 3, 0x11, 2, 0x11, 0, 63, 0])

    dc_y = J._huff_codes(*J._HUFF_DC_LUMA)
    ac_y = J._huff_codes(*J._HUFF_AC_LUMA)
    dc_c = J._huff_codes(*J._HUFF_DC_CHROMA)
    ac_c = J._huff_codes(*J._HUFF_AC_CHROMA)
    bw = J._BitWriter()
    py = J._encode_block(bw, y, qy8, dc_y, ac_y, 0)
    pcr = J._encode_block(bw, cr, qc8, dc_c, ac_c, 0)
    pcb = J._encode_block(bw, cb, qc8, dc_c, ac_c, 0)
    assert (py, pcr, pcb) is not None
    bw.flush()
    reordered = bytes(hdr) + bytes(bw.out) + b"\xff\xd9"

    assert decode_jpeg(reordered) == decode_jpeg(normal)


def _prog_import():
    from ratatool_spark.operators.jpeg_py import encode_jpeg_progressive

    return encode_jpeg_progressive


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_progressive_decodes_pixel_identical_to_baseline(subsample):
    """Progressive coding carries the same quantized coefficients as
    baseline at equal quality/subsampling, so the 10-scan progressive
    stream (DC first/refine, spectral bands, AC refinement) must decode
    to EXACTLY the baseline pixels."""
    encode_jpeg_progressive = _prog_import()
    w, h = 53, 37
    px = _smooth(w, h).tobytes()
    base = decode_jpeg(encode_jpeg(w, h, px, quality=90, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg_progressive(w, h, px, quality=90, subsample=subsample)
    )
    assert prog == base
    assert b"\xff\xc2" in encode_jpeg_progressive(
        w, h, px, quality=90, subsample=subsample
    )


def test_progressive_deterministic_bitstream():
    encode_jpeg_progressive = _prog_import()
    px = _smooth(24, 16).tobytes()
    assert encode_jpeg_progressive(24, 16, px) == encode_jpeg_progressive(
        24, 16, px
    )


def test_progressive_eob_run_spanning_blocks():
    """EOBn symbols (end-of-band runs covering MULTIPLE blocks) — the
    repo's encoder only emits per-block EOB0, so this hand-builds a
    2-block grayscale progressive stream whose AC scan is one EOB1
    symbol with one appended bit (EOBRUN = 2): both blocks must decode
    with zero AC, i.e. two flat blocks at their DC levels."""
    import struct

    import numpy as np

    import ratatool_spark.operators.jpeg_py as J

    qt = np.ones(64, dtype=np.uint8)  # flat quant: DC value == gray shift
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(qt)
    # SOF2, 8 rows x 16 cols, 1 component (grayscale), h=v=1
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += bytes([1, 0x11, 0])
    # DC table: Annex K luma
    bits, vals = J._HUFF_DC_LUMA
    out += (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(vals))
        + bytes([0x00]) + bytes(bits) + bytes(vals)
    )
    # custom AC table: single 1-bit code for symbol 0x10 (EOB1)
    out += (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
        + bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x10])
    )
    # scan 1: DC first, Al=0 — blocks at DC 8 and -8 (diff coded)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    dc = J._huff_codes(*J._HUFF_DC_LUMA)
    bw = J._BitWriter()
    for diff in (8, -16):  # DC values 8, -8
        t, raw = J._magnitude(diff)
        code, ln = dc[t]
        bw.write(code, ln)
        if t:
            bw.write(raw, t)
    bw.flush()
    out += bytes(bw.out)
    # scan 2: AC first 1..63, Al=0 — EOB1 + appended bit 0 => EOBRUN 2
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
    bw = J._BitWriter()
    bw.write(0, 1)  # the EOB1 code
    bw.write(0, 1)  # appended bit: EOBRUN = (1 << 1) + 0 = 2
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"

    w, h, rgb = decode_jpeg(bytes(out))
    assert (w, h) == (16, 8)
    px = np.frombuffer(rgb, np.uint8).reshape(8, 16, 3)
    # DC of an 8x8 block contributes dc/8 per sample: 128 + 8/8 = 129
    assert (px[:, :8] == 129).all()
    assert (px[:, 8:] == 127).all()


def test_decode_real_seam_handles_progressive(spark):
    """multimodal.decode_real must parse progressive payloads through
    the same FF D8 seam, yielding the SAME decoded checksums as the
    baseline rows (equal coefficients)."""
    from ratatool_spark.operators.multimodal import decode_real, make_test_media

    base = {
        r["media_id"]: r["payload_md5"]
        for r in decode_real(
            make_test_media(spark, n=6, seed=7, formats=("jpeg",))
        ).collect()
    }
    prog = {
        r["media_id"]: r["payload_md5"]
        for r in decode_real(
            make_test_media(spark, n=6, seed=7, formats=("jpeg_progressive",))
        ).collect()
    }
    assert base == prog and len(base) == 6


def _sos_offsets(data):
    """Offsets of every SOS marker with (ns, ss_off, se_off, tda_off) —
    byte positions inside the segment for patching."""
    out = []
    i = 0
    while True:
        i = data.find(b"\xff\xda", i)
        if i < 0:
            return out
        ns = data[i + 4]
        out.append(
            {
                "ns": ns,
                "tda": i + 6,  # first component's (td<<4|ta) byte
                "ss": i + 5 + 2 * ns,
                "se": i + 6 + 2 * ns,
            }
        )
        i += 2


def test_progressive_undefined_huffman_table_rejected():
    """A scan whose header references a table no DHT defined must fail
    with ValueError (the documented corrupt-input surface), not an
    AttributeError from huff.get(...) == None."""
    encode_jpeg_progressive = _prog_import()
    data = encode_jpeg_progressive(24, 16, _smooth(24, 16).tobytes())
    ac = next(s for s in _sos_offsets(data) if data[s["ss"]] > 0)
    bad = bytearray(data)
    bad[ac["tda"]] = (bad[ac["tda"]] & 0xF0) | 0x07  # AC table 7: undefined
    with pytest.raises(ValueError, match="undefined AC table"):
        decode_jpeg(bytes(bad))
    dc = next(s for s in _sos_offsets(data) if data[s["ss"]] == 0)
    bad = bytearray(data)
    bad[dc["tda"]] = 0x70 | (bad[dc["tda"]] & 0x0F)  # DC table 7: undefined
    with pytest.raises(ValueError, match="undefined DC table"):
        decode_jpeg(bytes(bad))


def test_progressive_bad_spectral_selection_rejected():
    encode_jpeg_progressive = _prog_import()
    data = encode_jpeg_progressive(24, 16, _smooth(24, 16).tobytes())
    ac = next(s for s in _sos_offsets(data) if data[s["ss"]] > 0)
    bad = bytearray(data)
    bad[ac["se"]] = 200  # Se past 63
    with pytest.raises(ValueError, match="bad spectral selection"):
        decode_jpeg(bytes(bad))


def test_progressive_ac_run_past_band_rejected():
    """Corrupt AC-first scan whose run/size symbol points past Se: a
    1-bit code for 0xF1 (run 15, size 1) in a Ss=62..Se=63 band pushes
    k to 77 — must raise ValueError, not IndexError on the 64-entry
    block."""
    import struct

    import ratatool_spark.operators.jpeg_py as J

    qt = np.ones(64, dtype=np.uint8)
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(qt)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    bits, vals = J._HUFF_DC_LUMA
    out += (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(vals))
        + bytes([0x00]) + bytes(bits) + bytes(vals)
    )
    # custom AC table: single 1-bit code for symbol 0xF1 (run 15, size 1)
    out += (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1)
        + bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0xF1])
    )
    # scan 1: DC first (one zero-diff block)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    dc = J._huff_codes(*J._HUFF_DC_LUMA)
    bw = J._BitWriter()
    code, ln = dc[0]
    bw.write(code, ln)
    bw.flush()
    out += bytes(bw.out)
    # scan 2: AC first band 62..63 — the 0xF1 symbol overruns the band
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 62, 63, 0])
    bw = J._BitWriter()
    bw.write(0, 1)  # the 0xF1 code
    bw.write(1, 1)  # its sign/size bit
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="bad AC run"):
        decode_jpeg(bytes(out))
