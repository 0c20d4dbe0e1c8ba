"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the most common real-codec seam in :mod:`multimodal` (the container
has no PIL/libjpeg): ``decode_jpeg`` parses actual JFIF bytes — marker
segments, DQT/DHT tables, Huffman-coded MCUs, dequantization, IDCT,
chroma upsampling, YCbCr→RGB — and ``encode_jpeg`` /
``encode_jpeg_progressive`` produce standard streams with the T.81
Annex K tables, so the pairs round-trip without any native library.
Decode supports grayscale and 3-component YCbCr with arbitrary (≤2)
sampling factors (4:4:4, 4:2:2, 4:2:0) plus restart markers, for BOTH
sequential baseline (SOF0/1) and progressive (SOF2: spectral selection
+ successive approximation, DC/AC first and refinement scans, EOB
runs — T.81 Annex G); arithmetic/hierarchical/12-bit streams raise
``NotImplementedError`` exactly like the other codec seams.

Everything per-block runs through numpy (the IDCT is two 8×8 GEMMs per
block against a precomputed cosine basis), so decoding inside an Arrow
batch is vectorized where it matters. Entropy decode is necessarily
bit-serial — that is the format, not the implementation.

Used by ``multimodal.decode_real`` / ``_decode_bytes`` when the payload
magic is FF D8. Reference parity: the reference repo has no media path
at all; this extends the LLM-pipeline surface (multimodal ingest) the
same way the avro/proto pure-Python codecs extend IO.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> natural position in the 8x8
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.1 quantization tables (luminance, chrominance), zigzag order
_Q_LUMA = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14,
        13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37,
        29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68,
        87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113,
        121, 112, 100, 120, 92, 101, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 18, 24, 21, 24, 47, 26,
        26, 47, 99, 66, 56, 66, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II orthonormal basis C: dct = C @ block @ C.T, idct = C.T @ X @ C
_BASIS = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _BASIS[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


# --------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-RST marker. ``restart()`` consumes an
    RSTn marker and byte-aligns (T.81 F.2.1.3.1)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _HitRestart()
            else:
                raise _HitMarker()
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        # drop partial byte, consume the RSTn marker
        self.buf = 0
        self.nbits = 0
        if not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn marker")
        self.pos += 2


class _HitRestart(Exception):
    pass


class _HitMarker(Exception):
    pass


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol} (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb_bytes) from a baseline OR progressive JPEG.

    Baseline (SOF0/1) decodes in one scan pass; progressive (SOF2,
    spectral selection + successive approximation per T.81 Annex G)
    accumulates DCT coefficients across every scan — DC first/refine,
    AC first/refine with EOB-run handling — and reconstructs once at
    EOI. Grayscale replicates Y into all three channels so the output
    layout matches decode_bmp/decode_png (3 bytes/pixel, row-major,
    top-down).
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp zigzag coefficients
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # markers may be preceded by any number of 0xFF fill bytes
        # (T.81 B.1.1.2) — some encoders pad with them
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if progressive:
                coef = _init_prog_state(width, height, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tda >> 4, tda & 0xF))
            pos += seglen
            if not progressive:
                return _decode_scan(
                    data, pos, width, height, comps, scan, qt, huff,
                    restart_interval,
                )
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos, comps, coef, scan, huff, restart_interval,
                ss, se, a >> 4, a & 0xF,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen
    if progressive and coef is not None:
        return _finish_progressive(width, height, comps, coef, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[dict],
    scan: list[tuple[dict, int, int]],
    qt: dict[int, np.ndarray],
    huff: dict,
    restart_interval: int,
) -> tuple[int, int, bytes]:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across
        c["bh"] = mcuy * c["v"]
        planes.append(np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    # planes/pred are allocated in SOF component order; the SOS scan list
    # may order components differently (spec-valid) — map each scan entry
    # back to its SOF index so a reordered scan doesn't swap planes
    scan_sof = [comps.index(c) for (c, _, _) in scan]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for si, (c, td, ta) in enumerate(scan):
                ci = scan_sof[si]
                try:
                    dc_tbl = huff[(0, td)]
                    ac_tbl = huff[(1, ta)]
                except KeyError as e:
                    raise ValueError(
                        f"scan references undefined Huffman table {e}"
                    ) from None
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(br, dc_tbl)
                        diff = _extend(br.read(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "bad AC run: coefficient index past 63"
                                )
                            coef[k] = _extend(br.read(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef
                        block = block.reshape(8, 8) * q
                        pix = _BASIS.T @ block @ _BASIS + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    return _compose_rgb(comps, planes, width, height, hmax, vmax)


def _compose_rgb(
    comps: list[dict],
    planes: list[np.ndarray],
    width: int,
    height: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, bytes]:
    """Upsample (sample replication), crop, YCbCr→RGB — shared by the
    baseline and progressive decode paths."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, out.tobytes()


# -------------------------------------------------- progressive decode


def _init_prog_state(
    width: int, height: int, comps: list[dict]
) -> list[np.ndarray]:
    """Per-component zigzag coefficient stores for progressive decode:
    the full interleaved-MCU grid (bw × bh blocks — DC scans may touch
    padding blocks) plus each component's ACTUAL block grid (abw × abh —
    what non-interleaved AC scans cover, T.81 A.2.2)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    coef = []
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        cw = (width * c["h"] + hmax - 1) // hmax
        ch = (height * c["v"] + vmax - 1) // vmax
        c["abw"] = (cw + 7) // 8
        c["abh"] = (ch + 7) // 8
        coef.append(np.zeros((c["bh"], c["bw"], 64), dtype=np.int64))
    return coef


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past entropy bytes / stuffing / stray RSTs to the next
    true marker's 0xFF."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    return pos


def _dc_prog_block(
    br: _BitReader,
    tbl: dict | None,
    b: np.ndarray,
    ah: int,
    al: int,
    pred: list[int],
    si: int,
) -> None:
    if ah == 0:  # first DC scan: diffs of the point-transformed values
        t = _huff_decode(br, tbl)
        diff = _extend(br.read(t), t) if t else 0
        pred[si] += diff
        b[0] = pred[si] << al
    else:  # refinement: one raw bit per block (G.1.2.1)
        if br.read(1):
            b[0] = int(b[0]) | (1 << al)


def _ac_first_block(
    br: _BitReader, tbl: dict, b: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, tbl)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                # corrupt stream: the run/size symbol points past the
                # scan's spectral band — fail on the documented surface
                raise ValueError("bad AC run: coefficient index past Se")
            b[k] = _extend(br.read(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                return eobrun - 1  # this block is part of the EOB run
            k += 16  # ZRL
    return 0


def _ac_refine_block(
    br: _BitReader, tbl: dict, b: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """T.81 G.2 AC successive-approximation refinement: already-nonzero
    coefficients receive one correction bit each (applied only when that
    bit isn't set yet); newly-significant ones arrive as run/1 symbols
    with a sign bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, tbl)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if br.read(1) else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                break
            while k <= se:
                if b[k] != 0:
                    if br.read(1) and (int(b[k]) & p1) == 0:
                        b[k] += p1 if b[k] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                b[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # remainder of the band: correction bits only
            if b[k] != 0:
                if br.read(1) and (int(b[k]) & p1) == 0:
                    b[k] += p1 if b[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    data: bytes,
    pos: int,
    comps: list[dict],
    coef: list[np.ndarray],
    scan: list[tuple[dict, int, int]],
    huff: dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode one progressive scan into the coefficient store; returns
    the stream position of the next marker."""
    br = _BitReader(data, pos)
    if not 0 <= ss <= se <= 63:
        raise ValueError(f"bad spectral selection Ss={ss} Se={se}")
    if ss == 0:  # DC scan (se must be 0 per A.2; multi-component allowed)
        if se != 0:
            raise ValueError("progressive DC scan requires Se=0")
        # a first (ah==0) DC scan Huffman-decodes; refinement scans read
        # raw bits only and legitimately carry no table
        if ah == 0:
            for _c, td, _ta in scan:
                if (0, td) not in huff:
                    raise ValueError(f"scan references undefined DC table {td}")
        pred = [0] * len(scan)
        cnt = 0
        if len(scan) == 1:
            c, td, _ = scan[0]
            ci = comps.index(c)
            tbl = huff.get((0, td))
            for by in range(c["abh"]):
                for bx in range(c["abw"]):
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        br.restart()
                        pred = [0] * len(scan)
                    _dc_prog_block(br, tbl, coef[ci][by, bx], ah, al, pred, 0)
                    cnt += 1
        else:
            mcux = comps[0]["bw"] // comps[0]["h"]
            mcuy = comps[0]["bh"] // comps[0]["v"]
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        br.restart()
                        pred = [0] * len(scan)
                    for si, (c, td, _) in enumerate(scan):
                        ci = comps.index(c)
                        tbl = huff.get((0, td))
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                _dc_prog_block(
                                    br, tbl,
                                    coef[ci][my * c["v"] + by, mx * c["h"] + bx],
                                    ah, al, pred, si,
                                )
                    cnt += 1
    else:  # AC scan: single component, non-interleaved (T.81 B.2.3)
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c, _, ta = scan[0]
        ci = comps.index(c)
        tbl = huff.get((1, ta))
        if tbl is None:  # both first and refine AC scans Huffman-decode
            raise ValueError(f"scan references undefined AC table {ta}")
        eobrun = 0
        cnt = 0
        for by in range(c["abh"]):
            for bx in range(c["abw"]):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    br.restart()
                    eobrun = 0
                b = coef[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, tbl, b, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, tbl, b, ss, se, al, eobrun)
                cnt += 1
    return _next_marker(data, br.pos)


def _finish_progressive(
    width: int,
    height: int,
    comps: list[dict],
    coef: list[np.ndarray],
    qt: dict[int, np.ndarray],
) -> tuple[int, int, bytes]:
    """Dequantize + IDCT the accumulated coefficients (one vectorized
    einsum per component), then the shared upsample/convert tail."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]].astype(np.float64)
        zz = coef[ci].reshape(-1, 64).astype(np.float64)
        blocks = np.zeros_like(zz)
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8) * q[None, :, :]
        pix = np.einsum("ij,njk,kl->nil", _BASIS.T, blocks, _BASIS) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        planes.append(plane)
    return _compose_rgb(comps, planes, width, height, hmax, vmax)


# --------------------------------------------------------------- encode


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables (zigzag order)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} — inverse of _build_huff."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a signed coefficient (T.81 F.1.2.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    raw = v if v > 0 else v + (1 << t) - 1
    return t, raw


def _encode_block(
    bw: _BitWriter,
    blk: np.ndarray,
    q8: np.ndarray,
    dct_tbl: dict,
    act_tbl: dict,
    pred: int,
) -> int:
    """DCT+quantize+entropy-code one level-shifted 8x8 block; returns the
    new DC predictor."""
    co = _BASIS @ (blk - 128.0) @ _BASIS.T
    quant = np.round(co / q8).astype(np.int64)
    zz = quant.reshape(64)[_ZIGZAG]  # natural -> zigzag scan
    diff = int(zz[0]) - pred
    t, raw = _magnitude(diff)
    code, ln = dct_tbl[t]
    bw.write(code, ln)
    if t:
        bw.write(raw, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_tbl[0xF0]
            bw.write(code, ln)
            run -= 16
        t, raw = _magnitude(v)
        code, ln = act_tbl[(run << 4) | t]
        bw.write(code, ln)
        bw.write(raw, t)
        run = 0
    if last_nz < 63:
        code, ln = act_tbl[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline YCbCr JPEG from packed top-down RGB bytes.

    ``subsample``: ``"444"`` (every plane full-res) or ``"420"`` (chroma
    2×2-average-pooled, the web default). ``restart_interval`` > 0 emits
    DRI + RSTn markers every that-many MCUs (the parallel-decode seam).
    Deterministic bitstream (float DCT quantized with one fixed
    rounding), Annex K quant (quality-scaled) + Huffman tables — every
    engine/row/partition produces identical bytes for identical pixels,
    which is what lets gates pin the encoded artifact."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    if subsample not in ("444", "420"):
        raise NotImplementedError(f"subsample={subsample!r} (444/420 only)")
    hy, vy = (2, 2) if subsample == "420" else (1, 1)
    qy_z, qc_z = _scaled_tables(quality)
    qy = np.zeros(64, dtype=np.int64)
    qc = np.zeros(64, dtype=np.int64)
    qy[_ZIGZAG] = qy_z
    qc[_ZIGZAG] = qc_z
    qy8, qc8 = qy.reshape(8, 8), qc.reshape(8, 8)

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    # MCU grid: hy*8 x vy*8 luma pixels per MCU
    mcux = (width + 8 * hy - 1) // (8 * hy)
    mcuy = (height + 8 * vy - 1) // (8 * vy)

    def pad_to(p: np.ndarray, rows: int, cols: int) -> np.ndarray:
        return np.pad(
            p, ((0, rows - p.shape[0]), (0, cols - p.shape[1])), mode="edge"
        )

    yp = pad_to(y, mcuy * vy * 8, mcux * hy * 8)
    if subsample == "420":
        # 2x2 average pooling on an even-padded plane
        cbp = pad_to(cb, mcuy * 16, mcux * 16)
        crp = pad_to(cr, mcuy * 16, mcux * 16)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cbp = pad_to(cb, mcuy * 8, mcux * 8)
        crp = pad_to(cr, mcuy * 8, mcux * 8)

    hdr = bytearray()
    hdr += b"\xff\xd8"  # SOI
    # JFIF APP0
    hdr += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT x2
    hdr += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(qy_z.astype(np.uint8))
    hdr += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01]) + bytes(qc_z.astype(np.uint8))
    # SOF0
    hdr += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    hdr += bytes([1, (hy << 4) | vy, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    # DHT x4
    for tc_th, (bits, vals) in (
        (0x00, _HUFF_DC_LUMA),
        (0x10, _HUFF_AC_LUMA),
        (0x01, _HUFF_DC_CHROMA),
        (0x11, _HUFF_AC_CHROMA),
    ):
        hdr += (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )
    if restart_interval:
        hdr += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    hdr += b"\xff\xda" + struct.pack(">HB", 12, 3)
    hdr += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    dc_y = _huff_codes(*_HUFF_DC_LUMA)
    ac_y = _huff_codes(*_HUFF_AC_LUMA)
    dc_c = _huff_codes(*_HUFF_DC_CHROMA)
    ac_c = _huff_codes(*_HUFF_AC_CHROMA)
    bw = _BitWriter()
    pred = [0, 0, 0]
    entropy = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                entropy += bytes(bw.out)
                bw = _BitWriter()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0, 0, 0]
            for by in range(vy):
                for bx in range(hy):
                    y0, x0 = (my * vy + by) * 8, (mx * hy + bx) * 8
                    pred[0] = _encode_block(
                        bw, yp[y0 : y0 + 8, x0 : x0 + 8], qy8, dc_y, ac_y, pred[0]
                    )
            pred[1] = _encode_block(
                bw, cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qc8, dc_c, ac_c, pred[1]
            )
            pred[2] = _encode_block(
                bw, crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qc8, dc_c, ac_c, pred[2]
            )
            mcu_count += 1
    bw.flush()
    entropy += bytes(bw.out)
    return bytes(hdr) + bytes(entropy) + b"\xff\xd9"


# ------------------------------------------------- progressive encode


def _quantized_coeffs(
    width: int, height: int, rgb: bytes, quality: int, subsample: str
):
    """Per-component quantized zigzag coefficient arrays (bh, bw, 64) —
    the shared front half of progressive encoding (color convert, pad,
    DCT, quantize; same arithmetic as the baseline encoder so the two
    codings carry identical coefficients)."""
    hy, vy = (2, 2) if subsample == "420" else (1, 1)
    qy_z, qc_z = _scaled_tables(quality)
    qy = np.zeros(64, dtype=np.int64)
    qc = np.zeros(64, dtype=np.int64)
    qy[_ZIGZAG] = qy_z
    qc[_ZIGZAG] = qc_z
    qy8, qc8 = qy.reshape(8, 8), qc.reshape(8, 8)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    mcux = (width + 8 * hy - 1) // (8 * hy)
    mcuy = (height + 8 * vy - 1) // (8 * vy)

    def pad_to(p: np.ndarray, rows: int, cols: int) -> np.ndarray:
        return np.pad(
            p, ((0, rows - p.shape[0]), (0, cols - p.shape[1])), mode="edge"
        )

    yp = pad_to(y, mcuy * vy * 8, mcux * hy * 8)
    if subsample == "420":
        cbp = pad_to(cb, mcuy * 16, mcux * 16)
        crp = pad_to(cr, mcuy * 16, mcux * 16)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cbp = pad_to(cb, mcuy * 8, mcux * 8)
        crp = pad_to(cr, mcuy * 8, mcux * 8)

    def blockify(plane: np.ndarray, q8: np.ndarray) -> np.ndarray:
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        out = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                co = _BASIS @ (blk - 128.0) @ _BASIS.T
                quant = np.round(co / q8).astype(np.int64)
                out[by, bx] = quant.reshape(64)[_ZIGZAG]
        return out

    return (
        hy, vy, mcux, mcuy, qy_z, qc_z,
        [blockify(yp, qy8), blockify(cbp, qc8), blockify(crp, qc8)],
    )


def _enc_dc_first(
    bw_: "_BitWriter", coefs, scan_comps, hv, al, mcux, mcuy, dc_tbls
) -> None:
    pred = [0] * len(scan_comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for si, ci in enumerate(scan_comps):
                h, v = hv[ci]
                for by in range(v):
                    for bx in range(h):
                        val = int(coefs[ci][my * v + by, mx * h + bx, 0]) >> al
                        diff = val - pred[si]
                        pred[si] = val
                        t, raw = _magnitude(diff)
                        code, ln = dc_tbls[ci][t]
                        bw_.write(code, ln)
                        if t:
                            bw_.write(raw, t)


def _enc_dc_refine(bw_, coefs, scan_comps, hv, al, mcux, mcuy) -> None:
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in scan_comps:
                h, v = hv[ci]
                for by in range(v):
                    for bx in range(h):
                        bw_.write(
                            (int(coefs[ci][my * v + by, mx * h + bx, 0]) >> al) & 1,
                            1,
                        )


def _enc_ac_first_scan(bw_, cf, abw, abh, tbl, ss, se, al) -> None:
    """AC first scan over the component's actual block grid: run/size
    coding of the point-transformed band, EOB0 per block (legal EOB run
    of 1 — the Annex K tables carry no EOBn symbols)."""
    for by in range(abh):
        for bx in range(abw):
            zz = cf[by, bx]
            run = 0
            vals = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                a = abs(v) >> al
                vals.append(a if v >= 0 else -a)
            nz = [i for i, v in enumerate(vals) if v]
            last = nz[-1] if nz else -1
            for i in range(last + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = tbl[0xF0]
                    bw_.write(code, ln)
                    run -= 16
                t, raw = _magnitude(v)
                code, ln = tbl[(run << 4) | t]
                bw_.write(code, ln)
                bw_.write(raw, t)
                run = 0
            if last < se - ss:
                code, ln = tbl[0x00]  # EOB
                bw_.write(code, ln)


def _enc_ac_refine_scan(bw_, cf, abw, abh, tbl, ss, se, al) -> None:
    """AC refinement scan (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients, run/1 + sign for newly-significant
    ones, pending correction bits flushed after each emitted symbol."""
    for by in range(abh):
        for bx in range(abw):
            zz = cf[by, bx]
            run = 0
            br_bits: list[int] = []
            eobpos = -1
            for k in range(ss, se + 1):
                if (abs(int(zz[k])) >> al) == 1:
                    eobpos = k
            for k in range(ss, se + 1):
                temp = abs(int(zz[k])) >> al
                if temp == 0:
                    run += 1
                    continue
                while run > 15 and k <= eobpos:
                    code, ln = tbl[0xF0]
                    bw_.write(code, ln)
                    run -= 16
                    for bit in br_bits:
                        bw_.write(bit, 1)
                    br_bits = []
                if temp > 1:  # already significant: correction bit
                    br_bits.append(temp & 1)
                    continue
                code, ln = tbl[(run << 4) | 1]
                bw_.write(code, ln)
                bw_.write(1 if int(zz[k]) > 0 else 0, 1)
                for bit in br_bits:
                    bw_.write(bit, 1)
                br_bits = []
                run = 0
            if run > 0 or br_bits:
                code, ln = tbl[0x00]  # EOB covers the tail
                bw_.write(code, ln)
                for bit in br_bits:
                    bw_.write(bit, 1)


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 85,
    subsample: str = "444",
) -> bytes:
    """Progressive (SOF2) YCbCr JPEG from packed top-down RGB bytes.

    Scan script exercises BOTH progressive mechanisms: spectral
    selection (luma AC split into bands 1-5 and 6-63) and successive
    approximation (every band coded at Al=1 first, refined to Al=0):

      1. DC, all components, Al=1     6. DC refinement, all components
      2. Y  AC 1-5,  Al=1             7. Y  AC 1-5,  refine
      3. Y  AC 6-63, Al=1             8. Y  AC 6-63, refine
      4. Cb AC 1-63, Al=1             9. Cb AC 1-63, refine
      5. Cr AC 1-63, Al=1            10. Cr AC 1-63, refine

    Coefficients are quantized with the exact baseline-encoder
    arithmetic, so decode(progressive) == decode(baseline) pixel-for-
    pixel at the same quality/subsampling — which is what the
    jpeg_decode_progressive gate pins. Deterministic bitstream, Annex K
    tables (EOB runs are emitted per block: the K tables carry no EOBn
    symbols)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    if subsample not in ("444", "420"):
        raise NotImplementedError(f"subsample={subsample!r} (444/420 only)")
    hy, vy, mcux, mcuy, qy_z, qc_z, coefs = _quantized_coeffs(
        width, height, rgb, quality, subsample
    )
    hv = [(hy, vy), (1, 1), (1, 1)]
    hmax, vmax = hy, vy
    ab = []
    for h, v in hv:
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        ab.append(((cw + 7) // 8, (ch + 7) // 8))

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(qy_z.astype(np.uint8))
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01]) + bytes(qc_z.astype(np.uint8))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, (hy << 4) | vy, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, (bits, vals) in (
        (0x00, _HUFF_DC_LUMA),
        (0x10, _HUFF_AC_LUMA),
        (0x01, _HUFF_DC_CHROMA),
        (0x11, _HUFF_AC_CHROMA),
    ):
        out += (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )

    dc_tbls = [_huff_codes(*_HUFF_DC_LUMA)] + [_huff_codes(*_HUFF_DC_CHROMA)] * 2
    ac_tbls = [_huff_codes(*_HUFF_AC_LUMA)] + [_huff_codes(*_HUFF_AC_CHROMA)] * 2

    def sos(specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        seg = bytes([len(specs)])
        for cid, tda in specs:
            seg += bytes([cid, tda])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    def flush(bw_: _BitWriter) -> bytes:
        bw_.flush()
        return bytes(bw_.out)

    # 1. DC first, interleaved, Al=1
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    bw_ = _BitWriter()
    _enc_dc_first(bw_, coefs, [0, 1, 2], hv, 1, mcux, mcuy, dc_tbls)
    out += flush(bw_)
    # 2-5. AC first scans, Al=1
    bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]
    for ci, ss_, se_ in bands:
        out += sos([(ci + 1, 0x00 | (0 if ci == 0 else 1))], ss_, se_, 0, 1)
        bw_ = _BitWriter()
        _enc_ac_first_scan(
            bw_, coefs[ci], ab[ci][0], ab[ci][1], ac_tbls[ci], ss_, se_, 1
        )
        out += flush(bw_)
    # 6. DC refinement, interleaved, Ah=1 -> Al=0 (raw bits, no Huffman)
    out += sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    bw_ = _BitWriter()
    _enc_dc_refine(bw_, coefs, [0, 1, 2], hv, 0, mcux, mcuy)
    out += flush(bw_)
    # 7-10. AC refinement scans, Ah=1 -> Al=0
    for ci, ss_, se_ in bands:
        out += sos([(ci + 1, 0x00 | (0 if ci == 0 else 1))], ss_, se_, 1, 0)
        bw_ = _BitWriter()
        _enc_ac_refine_scan(
            bw_, coefs[ci], ab[ci][0], ab[ci][1], ac_tbls[ci], ss_, se_, 0
        )
        out += flush(bw_)
    out += b"\xff\xd9"
    return bytes(out)
