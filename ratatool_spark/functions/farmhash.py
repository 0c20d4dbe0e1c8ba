"""Pure-Python FarmHash Fingerprint64 — exact BigQuery FARM_FINGERPRINT.

Implements ``farmhashna::Hash64`` from the public FarmHash algorithm
(github.com/google/farmhash, src/farmhash.cc, ``namespace farmhashna``),
which is what ``farmhash::Fingerprint64`` — and therefore BigQuery's
``FARM_FINGERPRINT`` and Guava's ``Hashing.farmHashFingerprint64()`` —
dispatches to for every input length. No C extension, no jar: this closes
the reference's BigQuery-reproducibility contract (F5;
ratatool-sampling Util.scala:93-98, README.md:90-97) in a container
without ``pyfarmhash``.

Parity gates (tests/test_farmhash.py):
  * property test against Guava's FarmHashFingerprint64 via the Spark JVM
    (guava ships in Spark's jars/) across lengths 0..~1000 covering all
    four code paths (0-16, 17-32, 33-64, >64 loop);
  * pinned vectors so the contract survives without a JVM.

Seeded layout matches the reference exactly: ``putInt(seed)`` on a Guava
hasher prepends the seed as 4 little-endian bytes before the field bytes
(Util.scala:93-96; README.md: ``FARM_FINGERPRINT(CONCAT(b'\\x2A\\x00\\x00\\x00',
...))`` for seed=42).

Performance note: this is driver/executor Python — use it through the
Arrow-batched pandas UDF (``hashing.farmhash_udf``), and prefer
``portable_hash64`` (JVM md5, whole-stage codegen) when BigQuery bit
parity is not required.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F

_U64 = struct.Struct("<Q")
_U32 = struct.Struct("<I")


def _fetch64(s: bytes, i: int) -> int:
    return _U64.unpack_from(s, i)[0]


def _fetch32(s: bytes, i: int) -> int:
    return _U32.unpack_from(s, i)[0]


def _rot(v: int, r: int) -> int:
    # r is never 0 in the algorithm, so the undefined-behavior guard of the
    # C macro is unnecessary
    return ((v >> r) | (v << (64 - r))) & _MASK


def _shift_mix(v: int) -> int:
    return v ^ (v >> 47)


def _hash_len_16_mul(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _MASK
    a ^= a >> 47
    b = ((v ^ a) * mul) & _MASK
    b ^= b >> 47
    return (b * mul) & _MASK


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (K2 + n * 2) & _MASK
        a = (_fetch64(s, 0) + K2) & _MASK
        b = _fetch64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & _MASK
        d = ((_rot(a, 25) + b) * mul) & _MASK
        return _hash_len_16_mul(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & _MASK
        a = _fetch32(s, 0)
        return _hash_len_16_mul((n + (a << 3)) & _MASK, _fetch32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2 ^ z * K0) & _MASK) * K2) & _MASK
    return K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & _MASK
    a = (_fetch64(s, 0) * K1) & _MASK
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & _MASK
    d = (_fetch64(s, n - 16) * K2) & _MASK
    return _hash_len_16_mul(
        (_rot((a + b) & _MASK, 43) + _rot(c, 30) + d) & _MASK,
        (a + _rot((b + K2) & _MASK, 18) + c) & _MASK,
        mul,
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & _MASK
    a = (_fetch64(s, 0) * K2) & _MASK
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & _MASK
    d = (_fetch64(s, n - 16) * K2) & _MASK
    y = (_rot((a + b) & _MASK, 43) + _rot(c, 30) + d) & _MASK
    z = _hash_len_16_mul(y, (a + _rot((b + K2) & _MASK, 18) + c) & _MASK, mul)
    e = (_fetch64(s, 16) * mul) & _MASK
    f = _fetch64(s, 24)
    g = ((y + _fetch64(s, n - 32)) * mul) & _MASK
    h = ((z + _fetch64(s, n - 24)) * mul) & _MASK
    return _hash_len_16_mul(
        (_rot((e + f) & _MASK, 43) + _rot(g, 30) + h) & _MASK,
        (e + _rot((f + a) & _MASK, 18) + g) & _MASK,
        mul,
    )


def _weak_hash_len_32_with_seeds(
    w: int, x: int, y: int, z: int, a: int, b: int
) -> tuple[int, int]:
    a = (a + w) & _MASK
    b = _rot((b + a + z) & _MASK, 21)
    c = a
    a = (a + x + y) & _MASK
    b = (b + _rot(a, 44)) & _MASK
    return (a + z) & _MASK, (b + c) & _MASK


def fingerprint64(s: bytes) -> int:
    """Unsigned 64-bit FarmHash Fingerprint64 of ``s``."""
    n = len(s)
    if n <= 32:
        if n <= 16:
            return _hash_len_0_to_16(s)
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    # >64 bytes: 56 bytes of rolling state over 64-byte blocks.
    seed = 81
    x = seed
    y = (seed * K1 + 113) & _MASK
    z = (_shift_mix((y * K2 + 113) & _MASK) * K2) & _MASK
    v0 = v1 = w0 = w1 = 0
    x = (x * K2 + _fetch64(s, 0)) & _MASK

    # end: after the loop, 1..64 bytes remain; last64: final 64-byte tail
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    p = 0
    while p != end:
        x = (_rot((x + y + v0 + _fetch64(s, p + 8)) & _MASK, 37) * K1) & _MASK
        y = (_rot((y + v1 + _fetch64(s, p + 48)) & _MASK, 42) * K1) & _MASK
        x ^= w1
        y = (y + v0 + _fetch64(s, p + 40)) & _MASK
        z = (_rot((z + w0) & _MASK, 33) * K1) & _MASK
        v0, v1 = _weak_hash_len_32_with_seeds(
            _fetch64(s, p),
            _fetch64(s, p + 8),
            _fetch64(s, p + 16),
            _fetch64(s, p + 24),
            (v1 * K1) & _MASK,
            (x + w0) & _MASK,
        )
        w0, w1 = _weak_hash_len_32_with_seeds(
            _fetch64(s, p + 32),
            _fetch64(s, p + 40),
            _fetch64(s, p + 48),
            _fetch64(s, p + 56),
            (z + w1) & _MASK,
            (y + _fetch64(s, p + 16)) & _MASK,
        )
        z, x = x, z
        p += 64

    mul = (K1 + ((z & 0xFF) << 1)) & _MASK
    p = last64
    w0 = (w0 + ((n - 1) & 63)) & _MASK
    v0 = (v0 + w0) & _MASK
    w0 = (w0 + v0) & _MASK
    x = (_rot((x + y + v0 + _fetch64(s, p + 8)) & _MASK, 37) * mul) & _MASK
    y = (_rot((y + v1 + _fetch64(s, p + 48)) & _MASK, 42) * mul) & _MASK
    x ^= (w1 * 9) & _MASK
    y = (y + v0 * 9 + _fetch64(s, p + 40)) & _MASK
    z = (_rot((z + w0) & _MASK, 33) * mul) & _MASK
    v0, v1 = _weak_hash_len_32_with_seeds(
        _fetch64(s, p),
        _fetch64(s, p + 8),
        _fetch64(s, p + 16),
        _fetch64(s, p + 24),
        (v1 * mul) & _MASK,
        (x + w0) & _MASK,
    )
    w0, w1 = _weak_hash_len_32_with_seeds(
        _fetch64(s, p + 32),
        _fetch64(s, p + 40),
        _fetch64(s, p + 48),
        _fetch64(s, p + 56),
        (z + w1) & _MASK,
        (y + _fetch64(s, p + 16)) & _MASK,
    )
    z, x = x, z
    return _hash_len_16_mul(
        (_hash_len_16_mul(v0, w0, mul) + (_shift_mix(y) * K0) + z) & _MASK,
        (_hash_len_16_mul(v1, w1, mul) + x) & _MASK,
        mul,
    )


def farm_fingerprint(data: bytes | str, seed: int | None = None) -> int:
    """Signed 64-bit FARM_FINGERPRINT, the BigQuery/reference contract.

    ``seed`` (when given) is prepended as 4 little-endian bytes — the exact
    byte layout of the reference's ``newHasher().putInt(seed)``
    (Util.scala:93-96) and of the README's
    ``FARM_FINGERPRINT(CONCAT(b'\\x2A\\x00\\x00\\x00', ...))`` recipe.
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    if seed is not None:
        data = struct.pack("<i", seed) + data
    u = fingerprint64(data)
    return u - (1 << 64) if u >= (1 << 63) else u
