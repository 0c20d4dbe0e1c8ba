"""Multimodal (image/audio/video) column plumbing for training pipelines.

Design: media lives as opaque ``binary`` columns plus a typed metadata
struct — the lakehouse-standard layout (same shape as Spark's built-in
``binaryFile`` source: path/length/content). Everything Spark-side is real
and tested: schemas, Arrow batch flow through ``mapInPandas``, partition
sizing, deterministic frame sampling. The codec boundary is
``_decode_bytes``: BMP, PNG, baseline JPEG (:mod:`.jpeg_py`), and WAV
decode for REAL via the repo's pure-Python codecs (no native library);
remaining formats (mp3/mp4, progressive JPEG) raise
``NotImplementedError`` — swap in PIL/ffmpeg there in a real deployment,
nothing else changes. ``fake=True`` keeps the hash-derived stub for
plumbing tests.

Scale notes: media rows are large — ``mapInPandas`` keeps memory bounded
per Arrow batch (tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down for big blobs); decode parallelism is partition parallelism, so
``repartition`` by size-bucket before decoding to avoid stragglers.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def _decode_bytes(content: bytes, fake: bool) -> tuple[int, int, str]:
    """The codec boundary. ``fake=True`` yields a deterministic
    hash-derived result so the distributed plumbing is testable without
    any codec. ``fake=False`` performs a REAL decode for the formats the
    repo's pure-Python codecs parse — BMP/PNG (here), baseline JPEG
    (:mod:`.jpeg_py`), WAV (wave module) — and raises
    ``NotImplementedError`` for anything else (mp3/mp4 need libav, not
    in this container; swap this branch in a real deployment, nothing
    else changes)."""
    if not fake:
        if content and content[:2] == b"BM":
            w, h, pixels = decode_bmp(content)
            return w, h, hashlib.md5(pixels.hex().encode()).hexdigest()
        if content and content[:8] == _PNG_SIG:
            w, h, pixels = decode_png(content)
            return w, h, hashlib.md5(pixels.hex().encode()).hexdigest()
        if content and content[:2] == b"\xff\xd8":
            from ratatool_spark.operators.jpeg_py import decode_jpeg

            w, h, pixels = decode_jpeg(content)
            return w, h, hashlib.md5(pixels.hex().encode()).hexdigest()
        if content and content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            rate, nframes, _ch, pcm = decode_wav(content)
            return rate, nframes, hashlib.md5(pcm.hex().encode()).hexdigest()
        raise NotImplementedError(
            "real decoding implemented for BMP, PNG, baseline JPEG, and "
            "WAV only; other formats require a media library (torchaudio, "
            "pyav) — install one and extend _decode_bytes"
        )
    h = hashlib.md5(content or b"").hexdigest()
    return int(h[:4], 16) % 4096, int(h[4:8], 16) % 4096, h


# ------------------------------------------------------------------ codecs
# Pure-stdlib encoders/decoders for the two container-decodable formats.
# The BMP side exercises the real format quirks: 4-byte row stride padding
# and bottom-up row order. Provenance: BITMAPFILEHEADER/BITMAPINFOHEADER
# layout per the public Windows BMP spec; WAV via the stdlib wave module.


def _swap_rb(row: bytes) -> bytes:
    """RGB↔BGR channel swap (symmetric) via vectorized slice assignment."""
    arr = bytearray(row)
    arr[0::3], arr[2::3] = row[2::3], row[0::3]
    return bytes(arr)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) bottom-up BMP from row-major RGB
    top-down pixel bytes (len == width*height*3)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(rgb)}")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        # BMP stores BGR
        body += _swap_rb(rgb[y * width * 3 : (y + 1) * width * 3])
        body += pad
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP → (width, height, top-down row-major RGB
    bytes). Handles bottom-up and top-down (negative height) storage and
    strips the 4-byte row padding."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = []
    for r in range(height):
        src = off + r * stride
        rows.append(_swap_rb(data[src : src + width * 3]))
    if not top_down:
        rows.reverse()
    return width, height, b"".join(rows)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, raw: bytes, prior: bytes, bpp: int) -> bytes:
    """Apply PNG scanline filter ``ftype`` to one raw row (encoder side)."""
    out = bytearray(len(raw))
    for x in range(len(raw)):
        a = raw[x - bpp] if x >= bpp else 0  # left
        b = prior[x]  # up
        c = prior[x - bpp] if x >= bpp else 0  # upper-left
        if ftype == 0:
            p = raw[x]
        elif ftype == 1:
            p = (raw[x] - a) & 0xFF
        elif ftype == 2:
            p = (raw[x] - b) & 0xFF
        elif ftype == 3:
            p = (raw[x] - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            pp = a + b - c
            pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            p = (raw[x] - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[x] = p
    return bytes(out)


def _png_unfilter_row(ftype: int, filt: bytes, prior: bytes, bpp: int) -> bytes:
    """Invert PNG scanline filter ``ftype`` (decoder side). Reconstruction
    must read already-reconstructed neighbors, so it is sequential in x."""
    out = bytearray(len(filt))
    for x in range(len(filt)):
        a = out[x - bpp] if x >= bpp else 0
        b = prior[x]
        c = prior[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = filt[x]
        elif ftype == 1:
            v = (filt[x] + a) & 0xFF
        elif ftype == 2:
            v = (filt[x] + b) & 0xFF
        elif ftype == 3:
            v = (filt[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            pp = a + b - c
            pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = (filt[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype} not in spec")
        out[x] = v
    return bytes(out)


def encode_png(
    width: int, height: int, rgb: bytes, filter_type: int | None = None
) -> bytes:
    """8-bit truecolor (color type 2, no alpha/interlace) PNG from
    top-down row-major RGB bytes — pure stdlib (zlib + struct), per the
    public PNG spec (RFC 2083 §6: IHDR/IDAT/IEND chunk layout, §6.3-6.6
    scanline filters). ``filter_type=None`` cycles filters 0-4 by row so
    every decoder filter path is exercised on round-trip; pass an int to
    pin one."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(rgb)}")
    bpp, stride = 3, width * 3
    prior = b"\x00" * stride
    scan = bytearray()
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ft = (y % 5) if filter_type is None else filter_type
        scan.append(ft)
        scan += _png_filter_row(ft, row, prior, bpp)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bit truecolor PNG → (width, height, top-down row-major
    RGB bytes). Implements all five scanline filters; multi-IDAT streams
    are concatenated per spec. CRCs are verified; palette/alpha/16-bit/
    interlaced images raise NotImplementedError (the PIL seam)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, ctype_col, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or ctype_col != 2 or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNGs supported "
                    f"(depth={depth}, color={ctype_col}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp, stride = 3, width * 3
    scan = zlib.decompress(bytes(idat))
    if len(scan) != height * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    prior = b"\x00" * stride
    rows = []
    for y in range(height):
        off = y * (1 + stride)
        row = _png_unfilter_row(scan[off], scan[off + 1 : off + 1 + stride], prior, bpp)
        rows.append(row)
        prior = row
    return width, height, b"".join(rows)


def encode_wav(sample_rate: int, pcm16: bytes, n_channels: int = 1) -> bytes:
    """Mono/stereo 16-bit PCM WAV bytes via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16)
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse WAV → (sample_rate, n_frames, n_channels, pcm bytes)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        return (
            w.getframerate(),
            w.getnframes(),
            w.getnchannels(),
            w.readframes(w.getnframes()),
        )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary content → (media_id, width, height, checksum) via
    ``mapInPandas`` — per-partition Arrow batch iterator, bounded memory,
    no per-row serialization."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, c = _decode_bytes(content, fake)
                rows.append((mid, w, h, c))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "checksum"]
            )

    return df.select("media_id", "content").mapInPandas(run, _DECODED_SCHEMA)


_DECODED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("payload_md5", T.StringType(), True),
    ]
)


def decode_real(df: DataFrame) -> DataFrame:
    """REAL media decode over the binary column — parses actual BMP, PNG,
    baseline JPEG, and WAV bytes (pure-Python codecs; no fake path,
    no native library). Output per row:
    image → (width, height), audio → (sample_rate, n_samples), both with
    the md5 of the lowercase-hex of the recovered raw payload (RGB pixels
    with BMP padding stripped and rows un-flipped / PCM frames) — so a
    wrong stride, row order, or channel swap changes the checksum.
    Unknown formats raise NotImplementedError (the PIL/libav seam).

    Same scale envelope as decode_media: mapInPandas Arrow batches,
    bounded memory, partition-parallel decode."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                if b is None:
                    rows.append((mid, None, None, None, None, None, None))
                elif b[:2] == b"BM":
                    w, h, pixels = decode_bmp(b)
                    md5 = hashlib.md5(pixels.hex().encode()).hexdigest()
                    rows.append((mid, "image", w, h, None, None, md5))
                elif b[:8] == _PNG_SIG:
                    w, h, pixels = decode_png(b)
                    md5 = hashlib.md5(pixels.hex().encode()).hexdigest()
                    rows.append((mid, "image", w, h, None, None, md5))
                elif b[:2] == b"\xff\xd8":
                    from ratatool_spark.operators.jpeg_py import decode_jpeg

                    w, h, pixels = decode_jpeg(b)
                    md5 = hashlib.md5(pixels.hex().encode()).hexdigest()
                    rows.append((mid, "image", w, h, None, None, md5))
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    rate, nframes, _ch, pcm = decode_wav(b)
                    md5 = hashlib.md5(pcm.hex().encode()).hexdigest()
                    rows.append((mid, "audio", None, None, rate, nframes, md5))
                else:
                    raise NotImplementedError(
                        f"media_id={mid}: unknown format (magic={b[:4]!r}); "
                        f"only BMP/PNG/JPEG/WAV decodable here"
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _DECODED_REAL_SCHEMA])

    return df.select("media_id", "content").mapInPandas(run, _DECODED_REAL_SCHEMA)


def make_test_media(
    spark, n: int = 48, seed: int = 42, formats: tuple[str, ...] = ("bmp", "wav")
) -> DataFrame:
    """Deterministic REAL media rows, format cycling by ``media_id %
    len(formats)`` over ``formats`` (any of "bmp", "wav", "png", "jpeg" —
    "jpeg_progressive" — the default pair keeps the r4 oracle fixture
    byte-stable). Payloads
    are md5-digest repetitions so an external engine can reconstruct the
    expected checksums with pure string math (the oracles for
    ``multimodal_decode_real`` / ``_png``), while the Spark side must
    genuinely encode and re-parse the container format. Widths cycle
    through non-multiple-of-4 strides so BMP row padding is exercised;
    PNG rows cycle all five scanline filters; JPEG rows alternate 4:4:4 /
    4:2:0 subsampling and cycle restart intervals (lossy — their decoded
    checksums are PINNED in the gate rather than string-math replayed)."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                digest = hashlib.md5(f"{seed}:{mid}".encode()).digest()
                fmt = formats[mid % len(formats)]
                if fmt in ("bmp", "png", "jpeg", "jpeg_progressive"):
                    if fmt.startswith("jpeg"):
                        # big enough to span multiple MCUs incl. partial
                        # edge blocks in both subsampling modes
                        w, h = 11 + mid % 10, 9 + mid % 7
                    else:
                        w, h = 3 + mid % 8, 2 + mid % 5
                    need = w * h * 3
                    rgb = (digest * (need // 16 + 1))[:need]
                    if fmt == "bmp":
                        content, mime = encode_bmp(w, h, rgb), "image/bmp"
                    elif fmt == "png":
                        content, mime = encode_png(w, h, rgb), "image/png"
                    elif fmt == "jpeg_progressive":
                        # same pixels/quality/subsampling as the "jpeg"
                        # rows: progressive coding carries identical
                        # coefficients, so decoded md5s match the
                        # baseline pins (the cross-pin the progressive
                        # gate leans on)
                        from ratatool_spark.operators.jpeg_py import (
                            encode_jpeg_progressive,
                        )

                        content = encode_jpeg_progressive(
                            int(w),
                            int(h),
                            rgb,
                            quality=90,
                            subsample="420" if mid % 2 else "444",
                        )
                        mime = "image/jpeg"
                    else:
                        from ratatool_spark.operators.jpeg_py import encode_jpeg

                        content = encode_jpeg(
                            int(w),
                            int(h),
                            rgb,
                            quality=90,
                            subsample="420" if mid % 2 else "444",
                            restart_interval=int(mid % 3),
                        )
                        mime = "image/jpeg"
                    kind = "image"
                    meta = (mime, w, h, None, None)
                else:
                    rate = 8000 + int(mid % 4) * 4000
                    nframes = 64 + mid % 33
                    pcm = (digest * (nframes * 2 // 16 + 1))[: nframes * 2]
                    content, kind = encode_wav(rate, pcm), "audio"
                    meta = ("audio/wav", None, None, None, rate)
                rows.append((mid, kind, content, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction: binary → fixed-dim float vector. Same Arrow
    batch shape a real vision/audio encoder would use (batched inference
    inside the iterator — load the model once per partition, not per row).
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # model init would go here, once per partition
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if not fake:
                    raise NotImplementedError("real encoder not available here")
                seed_bytes = hashlib.md5(content or b"").digest()
                rng = np.frombuffer(seed_bytes, dtype=np.uint8).astype(np.float32)
                v = np.resize(rng, FEATURE_DIM) / 255.0
                feats.append(v.tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.select("media_id", "content").mapInPandas(run, _FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize image rows to (width, height): binary in → binary out, the
    same mapInPandas batch shape as decode_media. Stub codec: the fake
    payload is a deterministic function of (content, width, height) so
    re-runs and retries produce identical bytes — idempotent-sink safe."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                if not fake:
                    raise NotImplementedError(
                        "real resize requires an image library (PIL); "
                        "install one and replace this branch"
                    )
                h = hashlib.md5(
                    (content or b"") + f"{width}x{height}".encode()
                ).digest()
                out.append(h * ((width * height * 3) // len(h) + 1))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "content").mapInPandas(run, _RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    n: int = 4,
    id_col: str = "media_id",
    frames_col: str = "meta.n_frames",
) -> DataFrame:
    """Deterministic frame-index sampling for video rows: n evenly-spaced
    indices over [0, n_frames) — pure expressions, no UDF. The downstream
    decode step consumes (media_id, frame_idx) pairs."""
    total = F.col(frames_col)
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: (i * total / F.lit(n)).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.when(total.isNotNull() & (total > 0), F.array_distinct(idx)).otherwise(
                F.array()
            )
        ).alias("frame_idx"),
    )


def fake_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows for tests: content bytes derived
    from the portable hash, metadata populated per kind."""
    from ratatool_spark.functions.hashing import hash_cols

    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string")))).alias(
            "content"
        ),
        (hash_cols([F.col("id")], seed=seed) % 240 + 1).cast("int").alias("__nf"),
    )
    return base.select(
        "media_id",
        "kind",
        "content",
        F.struct(
            F.concat(F.lit("application/x-fake-"), F.col("kind")).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(F.col("kind") == "video", F.col("__nf")).alias("n_frames"),
            F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
        ).alias("meta"),
    )


_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def dhash_bits(
    width: int, height: int, luma_at, rows: int = 10, cols: int = 6
) -> int:
    """The dHash fingerprint arithmetic, shared verbatim with the DuckDB
    oracle twin: sample a (cols+1) x rows luma grid by INTEGER
    nearest-neighbor (px = ((2*cx+1)*w) // (2*(cols+1)), py = ((2*cy+1)*h)
    // (2*rows) — pure integer math, so any engine replays it exactly; a
    box-filter resize would drag in float resampling conventions), then
    bit (cy*cols + cx) = 1 iff luma(cx+1) > luma(cx) in row cy — the
    classic difference hash (Krawetz, "Kind of Like That", 2013).
    ``luma_at(px, py)`` supplies the integer luma of a source pixel.
    rows*cols defaults to 60 bits: fits a signed 64-bit long in every
    engine (bit 63 would overflow DuckDB's checked BIGINT) and rides the
    same Manku block layout as the 60-bit text simhash."""
    fp = 0
    for cy in range(rows):
        py = ((2 * cy + 1) * height) // (2 * rows)
        lumas = [
            luma_at(((2 * cx + 1) * width) // (2 * (cols + 1)), py)
            for cx in range(cols + 1)
        ]
        for cx in range(cols):
            if lumas[cx + 1] > lumas[cx]:
                fp |= 1 << (cy * cols + cx)
    return fp


def image_dhash(df: DataFrame, rows: int = 10, cols: int = 6) -> DataFrame:
    """(media_id, dhash, width, height) — perceptual difference-hash
    fingerprints over the REAL image decoders (BMP/PNG codecs above,
    baseline JPEG via :mod:`.jpeg_py`; the PIL seam for anything
    else): decode to RGB, integer luma
    (ITU-R 601: (299r + 587g + 114b) // 1000), nearest-neighbor sample
    onto a (cols+1) x rows grid, adjacent-comparison bits. Two images
    whose content differs by noise/recompression land within a few bits;
    pair them with ``operators.dedup.fingerprint_pairs`` (the Manku
    blocked equi-join — no all-pairs scan) for near-duplicate image
    dedup at corpus scale. Non-image rows (NULL/audio magic) yield NULL
    dhash. Same Arrow-batch envelope as decode_real."""
    if rows < 1 or cols < 1 or rows * cols > 63:
        raise ValueError(
            f"need 1 <= rows*cols <= 63 signed-long bits, got {rows}x{cols}"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                if b is None:
                    out.append((mid, None, None, None))
                    continue
                if b[:2] == b"BM":
                    w, h, pixels = decode_bmp(b)
                elif b[:8] == _PNG_SIG:
                    w, h, pixels = decode_png(b)
                elif b[:2] == b"\xff\xd8":
                    from ratatool_spark.operators.jpeg_py import decode_jpeg

                    w, h, pixels = decode_jpeg(b)
                else:
                    out.append((mid, None, None, None))
                    continue

                def luma_at(px, py, _p=pixels, _w=w):
                    i = 3 * (py * _w + px)
                    return (
                        299 * _p[i] + 587 * _p[i + 1] + 114 * _p[i + 2]
                    ) // 1000

                out.append((mid, dhash_bits(w, h, luma_at, rows, cols), w, h))
            yield pd.DataFrame(out, columns=[f.name for f in _DHASH_SCHEMA])

    return df.select("media_id", "content").mapInPandas(run, _DHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame, max_hamming: int = 6, rows: int = 10, cols: int = 6
) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate IMAGE pairs: dHash
    fingerprints + the Manku blocked self-join
    (:func:`~ratatool_spark.operators.dedup.fingerprint_pairs`).
    Fingerprints are persisted before the self-join (the simhash_pairs
    discipline: the two join sides are different subplans, so without it
    the decode pipeline — the expensive part here — would run twice).
    Non-image rows drop out (NULL dhash)."""
    from ratatool_spark.cache import persist_tracked as _persist
    from ratatool_spark.operators.dedup import fingerprint_pairs

    fps = _persist(image_dhash(df, rows, cols).where(F.col("dhash").isNotNull()))
    return fingerprint_pairs(fps, "media_id", "dhash", rows * cols, max_hamming)


def make_near_dup_media(
    spark, n_groups: int = 20, seed: int = 42, fmt: str = "bmp"
) -> DataFrame:
    """(media_id, content) — a deterministic near-duplicate MEDIA
    fixture: ``2*n_groups`` real BMP rows (or WAV with ``fmt="wav"``:
    nframes = 64 + k%33 int16 mono frames at 8 kHz, the odd twin's first
    PCM byte bumped +8 mod 256) where ids (2k, 2k+1) share the
    md5-digest-derived pixel payload of group k, the odd twin with its
    first payload byte bumped by +8 (mod 256) — a perceptually-invisible
    perturbation that leaves the twins within a few dHash bits while
    unrelated groups sit ~rows*cols/2 bits apart. Payload construction is
    pure string math (the make_test_media convention), so an external
    engine can rebuild the exact pixels — and therefore the exact
    fingerprints — without a BMP codec; the Spark side must genuinely
    encode and re-decode the container. Sizes vary per GROUP
    (w = 4 + k%7, h = 3 + k%4, non-multiple-of-4 strides exercise BMP
    row padding)."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                grp = int(mid) // 2
                digest = hashlib.md5(f"{seed}:{grp}".encode()).digest()
                if fmt == "wav":
                    nframes = 64 + grp % 33
                    pcm = bytearray(
                        (digest * (nframes * 2 // 16 + 1))[: nframes * 2]
                    )
                    if mid % 2 == 1:
                        pcm[0] = (pcm[0] + 8) % 256
                    rows.append((mid, encode_wav(8000, bytes(pcm))))
                    continue
                w, h = 4 + grp % 7, 3 + grp % 4
                need = w * h * 3
                rgb = bytearray((digest * (need // 16 + 1))[:need])
                if mid % 2 == 1:
                    rgb[0] = (rgb[0] + 8) % 256
                rows.append((mid, encode_bmp(w, h, bytes(rgb))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    return spark.range(2 * n_groups).mapInPandas(gen, schema)


_AFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("afp", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]
)


def audio_fingerprint(df: DataFrame, bits: int = 60) -> DataFrame:
    """(media_id, afp, sample_rate, n_samples) — a 60-bit ENERGY-
    DIFFERENCE fingerprint over the real WAV decoder: the PCM stream is
    cut into ``bits + 1`` segments (sample j → segment (bits+1)·j // n —
    pure integer math, engine-replayable), each segment's energy is the
    integer sum of absolute int16 amplitudes, and bit i = 1 iff
    energy(i+1) > energy(i) — the audio analogue of the image dHash
    (time-envelope shape, invariant to container details and robust to
    small amplitude perturbations; a spectral fingerprint is the
    higher-fidelity tier and drops in behind the same (id, 60-bit)
    contract). Clips shorter than ``bits + 1`` samples, non-audio magic,
    and NULL content yield NULL afp. Same Arrow-batch envelope as
    decode_real; pair with ``operators.dedup.fingerprint_pairs``."""
    if not (1 <= bits <= 63):
        raise ValueError(f"need 1 <= bits <= 63 signed-long bits, got {bits}")
    nseg = bits + 1

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                if b is None or not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                    out.append((mid, None, None, None))
                    continue
                rate, nframes, _ch, pcm = decode_wav(b)
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                n = len(s)
                if n < nseg:
                    out.append((mid, None, rate, n))
                    continue
                seg = (nseg * np.arange(n)) // n
                e = np.bincount(seg, weights=np.abs(s), minlength=nseg)
                fp = 0
                for i in range(bits):
                    if e[i + 1] > e[i]:
                        fp |= 1 << i
                out.append((mid, fp, rate, n))
            yield pd.DataFrame(out, columns=[f.name for f in _AFP_SCHEMA])

    return df.select("media_id", "content").mapInPandas(run, _AFP_SCHEMA)


def audio_near_dup_pairs(df: DataFrame, max_hamming: int = 6, bits: int = 60) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate AUDIO pairs: energy-
    difference fingerprints + the Manku blocked self-join (the
    image_near_dup_pairs shape for the audio modality). Non-audio rows
    drop out (NULL afp); fingerprints persist so the decode pipeline
    runs once across the two join sides."""
    from ratatool_spark.cache import persist_tracked as _persist
    from ratatool_spark.operators.dedup import fingerprint_pairs

    fps = _persist(
        audio_fingerprint(df, bits).where(F.col("afp").isNotNull())
    )
    return fingerprint_pairs(fps, "media_id", "afp", bits, max_hamming)
