"""Pure-Python MurmurHash3 x64 128-bit — exact Guava ``murmur3_128`` parity.

The reference's alternate CLI hasher (``--hashAlgorithm=murmur``) builds
``Hashing.murmur3_128(seed).newHasher()`` and samples on
``hash().asLong()`` (ratatool-sampling Util.scala:89-103,
BigSampler.scala:63,74-75,85).  Guava's ``Murmur3_128HashFunction`` is a
faithful port of Austin Appleby's public-domain ``MurmurHash3_x64_128``
(github.com/aappleby/smhasher, MurmurHash3.cpp) with the int seed
sign-extended into both 64-bit lanes, and ``asLong()`` returning the first
8 digest bytes little-endian — i.e. the final ``h1``.

This port closes the murmur side of the hasher-parity contract the same
way ``functions.farmhash`` closed FARM_FINGERPRINT: jar-free, bit-identical
(property-tested against Guava through the Spark JVM in
tests/test_murmur3.py), with the seeded layout matching
``murmur3_128(seed)`` exactly — the seed initialises state, it is NOT a
byte prefix (unlike the farmhash ``putInt(seed)`` layout).

Performance note: executor Python — use through the Arrow-batched pandas
UDF (``hashing.murmur_udf``); prefer ``portable_hash64`` (JVM md5 inside
whole-stage codegen) when murmur bit parity is not required.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

_U64X2 = struct.Struct("<QQ")


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _MASK


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl(k1, 31)
    return (k1 * _C2) & _MASK


def _mix_k2(k2: int) -> int:
    k2 = (k2 * _C2) & _MASK
    k2 = _rotl(k2, 33)
    return (k2 * _C1) & _MASK


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Full 128-bit digest as (h1, h2), each unsigned 64-bit.

    ``seed`` follows Guava's int-seed semantics: sign-extended to 64 bits
    into both lanes (Murmur3_128Hasher assigns the int seed to long h1/h2).
    """
    # sign-extend a 32-bit seed the way Java's int→long widening does
    seed &= 0xFFFFFFFF
    if seed >= 1 << 31:
        seed -= 1 << 32
    h1 = h2 = seed & _MASK

    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = _U64X2.unpack_from(data, i * 16)
        h1 ^= _mix_k1(k1)
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        h2 ^= _mix_k2(k2)
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[nblocks * 16 :]
    if tail:
        # zero-pad to 16 and unpack LE — byte-identical to the C/Guava
        # switch-fallthrough construction of k1 (bytes 0-7) / k2 (8-15)
        k1, k2 = _U64X2.unpack(tail + b"\x00" * (16 - len(tail)))
        h1 ^= _mix_k1(k1)
        h2 ^= _mix_k2(k2)

    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def murmur3_128_aslong(data: bytes | str, seed: int = 0) -> int:
    """Guava ``murmur3_128(seed).hashBytes(data).asLong()`` — the signed
    64-bit value the reference's murmur sampling dice bounds into [0,1)
    (BigSampler.scala:74-75,85)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h1, _ = murmur3_x64_128(data, seed=seed)
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1
