"""Vectorized operand-chunking helpers (reference: utils/instruction_utils.rs).

All helpers map numpy u64 operand arrays [N] -> index arrays [C, N]; chunk 0
is the MOST significant (big-endian chunk order, instruction_utils.rs:62-70).
"""
from __future__ import annotations

import numpy as np


def _u(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


def chunk_operand_vec(x, C: int, chunk_len: int) -> np.ndarray:
    """[N] -> [C, N]: chunk_len-bit chunks, most significant first."""
    x = _u(x)
    mask = np.uint64((1 << chunk_len) - 1)
    out = np.zeros((C, x.size), dtype=np.uint64)
    for i in range(C):
        shift = (C - i - 1) * chunk_len
        out[i] = ((x >> np.uint64(shift)) if shift < 64 else np.zeros_like(x)) & mask
    return out


def chunk_and_concatenate_operands_vec(x, y, C: int, log_M: int) -> np.ndarray:
    """Per-chunk (x_chunk || y_chunk) indices [C, N] (instruction_utils.rs:~100)."""
    b = log_M // 2
    cx = chunk_operand_vec(x, C, b)
    cy = chunk_operand_vec(y, C, b)
    return (cx << np.uint64(b)) | cy


def add_and_chunk_operands_vec(x, y, C: int, log_M: int) -> np.ndarray:
    """Chunks of (x + y) as a 128-bit-safe sum (instruction_utils.rs:172+)."""
    z = _u(x).astype(object) + _u(y).astype(object)  # python ints, no overflow
    return chunk_sum_vec(z, C, log_M)


def multiply_and_chunk_operands_vec(x, y, C: int, log_M: int) -> np.ndarray:
    z = _u(x).astype(object) * _u(y).astype(object)
    return chunk_sum_vec(z, C, log_M)


def chunk_sum_vec(z, C: int, log_M: int) -> np.ndarray:
    """Chunk python-int array (possibly >64-bit) into C log_M-bit chunks."""
    mask = (1 << log_M) - 1
    out = np.zeros((C, len(z)), dtype=np.uint64)
    for i in range(C):
        shift = (C - i - 1) * log_M
        for j, v in enumerate(z):
            out[i, j] = (int(v) >> shift) & mask
    return out


def chunk_and_concatenate_for_shift_vec(x, y, C: int, log_M: int) -> np.ndarray:
    """Shift instructions: chunk x normally, concatenate with the shift
    amount (lowest log2(word_size) bits of y) in every chunk
    (instruction_utils.rs:242+)."""
    b = log_M // 2
    cx = chunk_operand_vec(x, C, b)
    y_low = _u(y) & np.uint64((1 << (b.bit_length() + 2)) - 1)  # placeholder; see shift instrs
    return (cx << np.uint64(b)) | y_low[None, :]


def concatenate_lookups(vals, C: int, operand_bits: int):
    """sum_i 2^{operand_bits * i} * vals[C-1-i] (instruction_utils.rs:31-42).

    Generic over FElt / DevF.
    """
    assert len(vals) == C
    result = None
    for i in range(C):
        term = vals[C - i - 1] * (1 << (operand_bits * i))
        result = term if result is None else result + term
    return result
