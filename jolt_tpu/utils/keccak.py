"""Keccak-256 (original padding, as used by Ethereum — NOT SHA3-256).

The reference's Fiat-Shamir transcript hashes with sha3::Keccak256
(jolt-core/src/utils/transcript.rs:4).  hashlib only ships SHA3 (0x06
padding), so we implement Keccak-f[1600] with the original 0x01 padding.
Host-side only: transcript traffic is a few KB per proof.
"""
from __future__ import annotations

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_MASK = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[int]) -> None:
    """In-place Keccak-f[1600] on a 5x5 lane state (state[x + 5*y])."""
    for rc in _RC:
        # theta
        c = [state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] ^= d[x]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rol(state[x + 5 * y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y] & _MASK)
        # iota
        state[0] ^= rc


_RATE = 136  # bytes, for 256-bit output

# Native fast path: the verifier replays ~10k transcript events per
# full-VM proof; the C implementation is ~1000x the pure-Python
# permutation (jolt_tpu/native/keccak.cpp).  Falls back silently if the
# toolchain is unavailable.  keccak256_py stays as the oracle.
_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        try:
            import ctypes

            from ..native import _compile
            lib = ctypes.CDLL(_compile("keccak.cpp", "libjolt_keccak"))
            lib.jolt_keccak256.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                           ctypes.c_char_p]
            lib.jolt_keccak256.restype = None

            def fast(data: bytes) -> bytes:
                out = ctypes.create_string_buffer(32)
                lib.jolt_keccak256(data, len(data), out)
                return out.raw

            _NATIVE = fast
        except Exception:
            _NATIVE = False
    return _NATIVE


def keccak256(data: bytes) -> bytes:
    fast = _native()
    if fast:
        return fast(data)
    return keccak256_py(data)


def keccak256_py(data: bytes) -> bytes:
    state = [0] * 25
    # absorb with original Keccak padding 0x01 ... 0x80
    padded = bytearray(data)
    pad_len = _RATE - (len(padded) % _RATE)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 \
        else b"\x81"
    for off in range(0, len(padded), _RATE):
        block = padded[off:off + _RATE]
        for i in range(_RATE // 8):
            state[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        _keccak_f(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out
