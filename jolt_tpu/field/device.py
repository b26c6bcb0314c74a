"""Device (JAX) BN254 field arithmetic over limb tensors.

A field array of logical shape `s` is a uint32 tensor of shape
``(NUM_LIMBS,) + s`` holding 16-bit little-endian limbs in Montgomery form
(R = 2^256).  The limb axis is FIRST so that the logical batch dimensions map
onto TPU sublanes/lanes — every limb op is then a full-width VPU vector op.

All kernels are static-shape, jit-friendly, and written as short unrolled
Python loops over the 16 limbs (XLA fuses the resulting elementwise chains).
Montgomery multiplication uses carry-save (redundant uint32) accumulation:
16x16-bit limb products are split into lo/hi halves and accumulated without
intermediate carry propagation — bounds stay < 2^23 << 2^32 — followed by a
single carry-propagation pass and one conditional subtraction.

This replaces the reference's arkworks 4x64-bit Montgomery arithmetic
(jolt-core/src/field/ark.rs:1-58); semantics (and therefore every proof byte
derived from them) are identical, only the layout is TPU-native.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .spec import (FieldSpec, LIMB_BITS, LIMB_MASK, NUM_LIMBS, fr_spec,
                   int_to_limbs, limbs_to_int)

W = LIMB_BITS
L = NUM_LIMBS
MASK = jnp.uint32(LIMB_MASK)
U32 = jnp.uint32


def _plimbs(spec: FieldSpec, ndim: int) -> jnp.ndarray:
    """Modulus limbs shaped [L, 1, 1, ...] for broadcasting."""
    return jnp.asarray(spec.p_limbs, dtype=U32).reshape((L,) + (1,) * ndim)


# ---------------------------------------------------------------------------
# carry / borrow primitives
# ---------------------------------------------------------------------------

def _carry_full(t: jnp.ndarray) -> jnp.ndarray:
    """Propagate carries over the (leading) limb axis; returns 16-bit limbs.

    Input limbs may hold redundant values up to 2^32; the represented integer
    must fit in t.shape[0] limbs (the final carry must be zero).
    """
    n = t.shape[0]
    out = []
    c = jnp.zeros(t.shape[1:], dtype=U32)
    for k in range(n):
        v = t[k] + c
        out.append(v & MASK)
        c = v >> W
    return jnp.stack(out)


def _sub_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limbwise; returns (diff 16-bit limbs, final borrow 0/1)."""
    n = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=U32)
    one = jnp.uint32(1 << W)
    for k in range(n):
        v = a[k] + one - b[k] - borrow
        out.append(v & MASK)
        borrow = jnp.uint32(1) - (v >> W)
    return jnp.stack(out), borrow


def _cond_sub_p(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """x - p if x >= p else x, for x < 2p with 16-bit limbs."""
    d, borrow = _sub_borrow(x, _plimbs(spec, x.ndim - 1))
    return jnp.where((borrow == 0)[None], d, x)


# ---------------------------------------------------------------------------
# modular add / sub / neg
# ---------------------------------------------------------------------------

def fadd(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _cond_sub_p(spec, _carry_full(a + b))


def fsub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_borrow(a, b)
    dp = _carry_full(d + _plimbs(spec, a.ndim - 1))
    return jnp.where((borrow == 1)[None], dp, d)


def fneg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    zero = jnp.zeros_like(a)
    return fsub(spec, zero, a)


# ---------------------------------------------------------------------------
# Montgomery multiplication (the hot kernel)
# ---------------------------------------------------------------------------

def _schoolbook(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 512-bit product in carry-save form: uint32[2L+1, ...], < 2^21."""
    batch = a.shape[1:]
    acc = jnp.zeros((2 * L + 1,) + batch, dtype=U32)
    for i in range(L):
        prod = a[i][None] * b  # [L, ...] — 16x16-bit products, full 32 bits
        acc = acc.at[i:i + L].add(prod & MASK)
        acc = acc.at[i + 1:i + L + 1].add(prod >> W)
    return acc


def _mont_reduce(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of a carry-save 512-bit value t (< p*R).

    Returns canonical 16-bit limbs of t * R^{-1} mod p.
    """
    pl = _plimbs(spec, t.ndim - 1)
    n0inv = jnp.uint32(spec.n0inv)
    for i in range(L):
        m = (t[i] * n0inv) & MASK
        prod = m[None] * pl
        t = t.at[i:i + L].add(prod & MASK)
        t = t.at[i + 1:i + L + 1].add(prod >> W)
        # retire position i: its low 16 bits are now 0 mod 2^16
        t = t.at[i + 1].add(t[i] >> W)
    hi = _carry_full(t[L:])  # [L+1, ...]; top limb is 0 since value < 2p
    return _cond_sub_p(spec, hi[:L])


def fmul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: (a * b * R^{-1}) mod p, both operands Montgomery."""
    return _mont_reduce(spec, _schoolbook(a, b))


def fsquare(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return fmul(spec, a, a)


def from_mont_device(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> canonical residue, on device (mont-mul by 1)."""
    t = jnp.zeros((2 * L + 1,) + a.shape[1:], dtype=U32)
    t = t.at[:L].set(a)
    return _mont_reduce(spec, t)


def to_mont_device(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical residue limbs -> Montgomery form, on device (mul by R^2)."""
    r2 = jnp.asarray(spec.r2_limbs, dtype=U32).reshape((L,) + (1,) * (a.ndim - 1))
    return fmul(spec, a, jnp.broadcast_to(r2, a.shape))


def fselect(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise select over logical shape (cond has logical shape)."""
    return jnp.where(cond[None], a, b)


def fsum(spec: FieldSpec, a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Modular sum along a logical axis via log-depth halving (fadd tree)."""
    ax = axis + 1 if axis >= 0 else axis  # account for limb axis
    n = a.shape[ax]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(a, 0, half, axis=ax)
        hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=ax)
        s = fadd(spec, lo, hi)
        if n % 2:
            tail = jax.lax.slice_in_dim(a, 2 * half, n, axis=ax)
            s = jnp.concatenate([fadd(spec, jax.lax.slice_in_dim(s, 0, 1, axis=ax), tail),
                                 jax.lax.slice_in_dim(s, 1, half, axis=ax)], axis=ax)
        a = s
        n = a.shape[ax]
    return jnp.squeeze(a, axis=ax)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def pack_ints(values, shape=None) -> np.ndarray:
    """Python ints / numpy ints -> canonical limb array uint32[L, *shape]."""
    arr = np.asarray(values, dtype=object)
    if shape is None:
        shape = arr.shape
    flat = arr.ravel()
    out = np.zeros((L, flat.size), dtype=np.uint32)
    for j, v in enumerate(flat.tolist()):
        v = int(v)
        for i in range(L):
            out[i, j] = (v >> (W * i)) & LIMB_MASK
    return out.reshape((L,) + tuple(shape))


def pack_u64(values: np.ndarray) -> np.ndarray:
    """Vectorized u64 numpy array -> canonical limb array uint32[L, *shape]."""
    v = np.asarray(values, dtype=np.uint64)
    out = np.zeros((L,) + v.shape, dtype=np.uint32)
    for i in range(4):
        out[i] = ((v >> np.uint64(W * i)) & np.uint64(LIMB_MASK)).astype(np.uint32)
    return out


def unpack_ints(limbs: np.ndarray) -> np.ndarray:
    """Canonical limb array uint32[L, *shape] -> numpy object array of ints."""
    limbs = np.asarray(limbs)
    shape = limbs.shape[1:]
    flat = limbs.reshape(L, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for j in range(flat.shape[1]):
        out[j] = limbs_to_int(flat[:, j])
    return out.reshape(shape) if shape else out


def scalar_to_device(spec: FieldSpec, x: int) -> jnp.ndarray:
    """Single host int -> Montgomery limb vector uint32[L] (host-converted)."""
    return jnp.asarray(int_to_limbs(spec.to_mont(x % spec.p)), dtype=U32)


def ints_to_device(spec: FieldSpec, values, shape=None) -> jnp.ndarray:
    """Host ints -> device Montgomery limbs (conversion mul done on device)."""
    arr = np.asarray(values, dtype=object)
    if shape is None:
        shape = arr.shape
    canonical = pack_ints([int(v) % spec.p for v in arr.ravel().tolist()],
                          shape=shape)
    return to_mont_device(spec, jnp.asarray(canonical))


def device_to_ints(spec: FieldSpec, a: jnp.ndarray) -> np.ndarray:
    """Device Montgomery limbs -> host numpy object array of canonical ints."""
    canonical = np.asarray(jax.device_get(from_mont_device(spec, a)))
    return unpack_ints(canonical)


def zeros(spec: FieldSpec, shape) -> jnp.ndarray:
    return jnp.zeros((L,) + tuple(shape), dtype=U32)


def ones(spec: FieldSpec, shape) -> jnp.ndarray:
    one = jnp.asarray(spec.r_limbs, dtype=U32)  # Montgomery 1 = R mod p
    return jnp.broadcast_to(one.reshape((L,) + (1,) * len(shape)),
                            (L,) + tuple(shape)).copy()
