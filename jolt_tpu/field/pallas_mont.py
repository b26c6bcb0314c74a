"""Fused Montgomery-multiply Pallas kernel for TPU.

The XLA fmul path (field/device.py) materializes the [512, N] limb-product
tensor in HBM three times per multiply (~7 KB of HBM traffic per field
element) — measured ~15M muls/s/chip on v5e, ~1% of roofline.  This kernel
fuses the whole SOS Montgomery pipeline (schoolbook products -> collector
matmul on the MXU -> carry -> m = T*N' mod R -> (T + m*p)/R -> conditional
subtract) inside VMEM: HBM traffic drops to the 128 B in + 64 B out per
element that is information-theoretically required.

Layout: operands are uint32[16, N] 16-bit limbs, limbs-first (the same
layout the XLA path uses), N padded to a multiple of the block size.
Each grid step processes a [16, NB] block entirely in VMEM.  The collector
matrix and the field constants ride along as (tiny, replicated) inputs —
Pallas kernels cannot capture array constants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spec import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldSpec

W = LIMB_BITS            # 16
L = NUM_LIMBS            # 16
NB = 512                 # elements per block (lane-dim multiple of 128)

# JOLT_PALLAS_INTERPRET=1 runs every kernel through the Pallas interpreter
# (any backend) — lets CPU CI check bit-parity of kernel changes without a
# TPU in the loop.  lru_caches key only on (spec, shape); flip before use.
import os as _os
_INTERPRET = _os.environ.get("JOLT_PALLAS_INTERPRET", "") not in ("", "0")


@functools.lru_cache(maxsize=None)
def _collector_T(nl: int) -> np.ndarray:
    """f32 [4, 2*nl+1, nl*nl]: plane k collects the k-th 8-BIT chunk of
    product (i, j) with weight {1, 256} — chunks 0/1 (low 16 bits) land at
    row i+j, chunks 2/3 at row i+j+1.  Every matrix entry (1 or 256 = 2^8)
    and every input chunk (< 2^8) is bf16-EXACT, so the collector runs as
    default-precision bf16 MXU passes instead of the 6-pass
    Precision.HIGHEST f32 product the 16-bit-part formulation needed —
    2x the MACs, ~3x fewer MXU cycles (docs/PERF.md gap #1).  Kept as FOUR
    [2nl+1, nl*nl] planes applied chunk-by-chunk: one [nl, nl, NB] f32
    chunk tensor live at a time instead of a [4*nl*nl, NB] concatenation —
    the fused kernel's VMEM high-water mark stays under the 16 MB scoped
    limit (the single-matrix version hit 47 MB at NB=512 and failed to
    compile on v5e)."""
    ncols = 2 * nl + 1
    mat = np.zeros((4, ncols, nl * nl), dtype=np.float32)
    for i in range(nl):
        for j in range(nl):
            mat[0, i + j, i * nl + j] = 1.0
            mat[1, i + j, i * nl + j] = 256.0
            mat[2, i + j + 1, i * nl + j] = 1.0
            mat[3, i + j + 1, i * nl + j] = 256.0
    return mat


_INT8_COLLECT = _os.environ.get("JOLT_MONT_INT8", "0") not in ("", "0")


@functools.lru_cache(maxsize=None)
def _collector_T8(nl: int) -> np.ndarray:
    """int8 [4, 2*nl+1, nl*nl] 0/1 collector planes + f32 [4, 2*nl+1]
    row-count correction vectors for the zero-point trick (see
    _products_cols_i8).  Plane weights ({1, 256}) move OUT of the matrix
    (applied as a shift on the s32 outputs) so every entry is 0/1."""
    ncols = 2 * nl + 1
    mat = np.zeros((4, ncols, nl * nl), dtype=np.int8)
    for i in range(nl):
        for j in range(nl):
            mat[0, i + j, i * nl + j] = 1
            mat[1, i + j, i * nl + j] = 1
            mat[2, i + j + 1, i * nl + j] = 1
            mat[3, i + j + 1, i * nl + j] = 1
    rowcnt = mat.astype(np.float32).sum(axis=2) * 128.0   # 128 * (M @ 1)
    return mat, rowcnt.astype(np.int32)


def _products_cols_i8(a, b, coll8, rowcnt):
    """Column sums of the double-width product via INT8 MXU dots.

    The 8-bit product chunks c (0..255) do not fit int8, so each dot runs
    on c' = c - 128 with the correction M@c = M@c' + 128*(M@1): the
    matrices are 0/1, so 128*(M@1) is a per-row constant (precomputed).
    s32 accumulation is exact; v5e int8 MXU runs at 2x the bf16 rate.
    Bit-identical to the bf16 chunk-plane path."""
    prod = a[:, None, :] * b[None, :, :]                  # [L, L, NB] u32
    nb = prod.shape[-1]
    flat = prod.reshape(L * L, nb)
    cols = jnp.zeros((2 * L + 1, nb), jnp.int32)
    for k in range(4):
        # mask AFTER the shift (see _products_cols); cast the small masked
        # byte, never the full-range u32.  (A u8 bitcast of the products
        # would drop 2 VPU ops per plane, but Mosaic rejects bitwidth-
        # changing bitcasts: "Changing bitwidths not supported".)
        ch = (((flat >> (8 * k)) & 0xFF) if k else (flat & 0xFF)) \
            .astype(jnp.int32)
        ch8 = (ch - 128).astype(jnp.int8)
        d = jax.lax.dot_general(
            coll8[k], ch8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # [2L+1, NB]
        d = d + rowcnt[k][:, None]
        cols = cols + (d if k % 2 == 0 else (d << 8))
    return cols.astype(jnp.uint32)


def _products_cols(a, b, coll):
    """Column sums of the double-width product of two [L, NB] u32 limb
    blocks -> [2L+1, NB] u32 (each < 2^22, exact in f32 accumulation).

    coll: [4, 2L+1, L*L] chunk-plane collector (see _collector_T); the
    four bf16 dots accumulate in f32 (sums < 2^22, exact) and are
    bit-identical to a single concatenated pass.  With JOLT_MONT_INT8
    (default on) coll is the int8 (mat, rowcnt) pair instead and the dots
    run on the 2x-rate int8 MXU path."""
    if _INT8_COLLECT:
        return _products_cols_i8(a, b, coll[0], coll[1])
    prod = a[:, None, :] * b[None, :, :]                  # [L, L, NB] u32
    nb = prod.shape[-1]
    flat = prod.reshape(L * L, nb)
    cols = jnp.zeros((2 * L + 1, nb), jnp.float32)
    for k in range(4):
        # Mosaic lacks u32<->f32 casts; round-trip through i32.  Mask AFTER
        # the shift: Mosaic may lower u32 >> as an arithmetic i32 shift,
        # sign-extending products with the top bit set.
        ch = (((flat >> (8 * k)) & 0xFF) if k else (flat & 0xFF)) \
            .astype(jnp.int32).astype(jnp.float32)
        cols = cols + jax.lax.dot_general(
            coll[k].astype(jnp.bfloat16), ch.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2L+1, NB] exact
    return cols.astype(jnp.int32).astype(jnp.uint32)


def _lookahead(g, p):
    """Kogge-Stone inclusive prefix of (generate, propagate) -> carry-in."""
    K = g.shape[0]
    G, P = g, p
    d = 1
    while d < K:
        Gs = jnp.concatenate([jnp.zeros_like(G[:d]), G[:-d]], axis=0)
        Ps = jnp.concatenate([jnp.ones_like(P[:d]), P[:-d]], axis=0)
        G = G | (P & Gs)
        P = P & Ps
        d *= 2
    return G


def _carry_ks(t):
    """In-register carry propagation (log-depth lookahead), [K, NB]."""
    s = (t & 0xFFFF) + jnp.concatenate(
        [jnp.zeros_like(t[:1]), (t >> W)[:-1]], axis=0)
    g = s >> W
    p = jnp.where((s & 0xFFFF) == 0xFFFF, jnp.uint32(1), jnp.uint32(0))
    G = _lookahead(g, p)
    c = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    return (s + c) & 0xFFFF


def _cond_sub_p(x, p_limbs):
    """x - p if x >= p (x < 2p), via log-depth borrow lookahead."""
    d = x + (1 << W) - p_limbs
    g = 1 - (d >> W)
    pr = jnp.where(d == (1 << W), jnp.uint32(1), jnp.uint32(0))
    G = _lookahead(g, pr)
    borrow = G[-1:]
    c = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    diff = (d - c) & 0xFFFF
    return jnp.where(borrow == 0, diff, x)


def _coll_arg(coll_ref, rowcnt_ref):
    """The collector argument `_products_cols` expects: the (mat, rowcnt)
    pair on the int8 path, the f32 chunk-plane tensor otherwise."""
    return (coll_ref[:], rowcnt_ref[:]) if _INT8_COLLECT else coll_ref[:]


def _mont_mul_kernel(a_ref, b_ref, coll_ref, rowcnt_ref, mnp_ref, mp_ref,
                     p_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    nb = a.shape[-1]
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, nb))
    out_ref[:] = _mul_k(a, b, _coll_arg(coll_ref, rowcnt_ref), p_l,
                        mnp_ref[:], mp_ref[:])


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, n: int):
    grid = (n // NB,)
    full = lambda i: (0, 0)
    return pl.pallas_call(
        _mont_mul_kernel,
        interpret=_INTERPRET,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, NB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, NB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 2 * L + 1, L * L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 2 * L + 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * L, 3 * L), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * L, 2 * L), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, NB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * L + 1) * (L * L * 4) * n,
            bytes_accessed=3 * L * n * 4,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=None)
def _consts(spec: FieldSpec):
    """HOST numpy constants — jnp arrays created here would become tracers
    of whatever transformation first calls this (and the lru_cache would
    leak them into later traces).  Returns (collector, rowcnt, raw M_N',
    M_p, p_limbs); on the int8 path collector/rowcnt are the 0/1 int8
    planes + zero-point corrections, otherwise the f32 planes + a dummy."""
    from .spec import redc_matrices, redc_matrix_raw
    if _INT8_COLLECT:
        coll, rowcnt = _collector_T8(L)
    else:
        coll = _collector_T(L)
        rowcnt = np.zeros((4, 2 * L + 1), np.int32)
    _, mp = redc_matrices(spec)
    mnpu = redc_matrix_raw(spec)
    p_limbs = np.asarray(spec.p_limbs, np.uint32).reshape(L, 1)
    return coll, rowcnt, mnpu, mp, p_limbs


def mont_mul_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray
                    ) -> jnp.ndarray:
    """Montgomery product of [L, *batch] limb tensors via the fused kernel.

    Pads the flattened batch to a multiple of NB; caller shapes restored.
    """
    shape = a.shape
    batch = 1
    for s in shape[1:]:
        batch *= s
    af = a.reshape(L, batch)
    bf = jnp.broadcast_to(b, shape).reshape(L, batch)
    # pad the flatten to a POWER OF TWO (>= NB): every mont-mul in every
    # program then maps onto ~16 canonical pallas geometries total.  A
    # fresh geometry's per-process REMOTE setup through the tunnel costs
    # up to minutes (docs/PERF.md round-4/5 cost model); <2x padded lanes
    # execute in microseconds.
    n = max(NB, 1 << (batch - 1).bit_length())
    if n != batch:
        pad = jnp.zeros((L, n - batch), dtype=jnp.uint32)
        af = jnp.concatenate([af, pad], axis=1)
        bf = jnp.concatenate([bf, pad], axis=1)
    coll, rowcnt, mnp, mp, p_limbs = _consts(spec)
    out = _mont_mul_call(spec, n)(af, bf, coll, rowcnt, mnp, mp, p_limbs)
    return out[:, :batch].reshape(shape)


# ---------------------------------------------------------------------------
# in-kernel modular add/sub (building blocks for fused protocol kernels)
# ---------------------------------------------------------------------------

def _fadd_k(a, b, p_l):
    """Modular add of [L, n] limb blocks (columns < 2^17 pre-carry)."""
    return _cond_sub_p(_carry_ks(a + b), p_l)


def _sub_borrow_k(a, b):
    d = a + (1 << W) - b
    g = 1 - (d >> W)
    pr = jnp.where(d == (1 << W), jnp.uint32(1), jnp.uint32(0))
    G = _lookahead(g, pr)
    c = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    return (d - c) & 0xFFFF, G[-1:]


def _fsub_k(a, b, p_l):
    d, borrow = _sub_borrow_k(a, b)
    dp = _carry_ks(d + p_l)
    return jnp.where(borrow == 0, d, dp)


# ---------------------------------------------------------------------------
# 8-bit constant-matrix multiplies: ONE bf16 MXU pass, exactly
# ---------------------------------------------------------------------------
#
# Multiplying by a value known per kernel launch (the REDC constants N' and
# p, Fiat-Shamir challenges, batching coefficients) is a LINEAR map of the
# other operand, so it compiles to a tiny [rows<=64, 32] x [32, n] matmul
# instead of the [2L+1, 512] x [512, n] collector product.  Operating on
# 8-BIT chunks keeps every matrix entry and input < 2^8 (bf16-exact) and
# every f32-accumulated column < 2^21 (f32-exact), so a single
# Precision.DEFAULT pass is bit-exact — 6x fewer MXU passes AND 16x fewer
# MACs than the general path.  Matrix rows are ordered [even-weight chunks;
# odd-weight chunks] so recombining to 16-bit limbs is a contiguous
# half-split (no sublane shuffles).

C8 = 2 * L               # 32 8-bit chunks per 256-bit value


def _split8_f(x):
    """[K, n] u32 16-bit limbs -> [2K, n] f32 8-bit chunks (lo/hi
    interleaved: chunk 2k = limb k low byte, 2k+1 = high byte)."""
    k, n = x.shape
    lo = (x & 0xFF).astype(jnp.int32).astype(jnp.float32)
    hi = ((x >> 8) & 0xFF).astype(jnp.int32).astype(jnp.float32)
    return jnp.concatenate(
        [lo[:, None, :], hi[:, None, :]], axis=1).reshape(2 * k, n)


_INT8_AUX = _os.environ.get("JOLT_MONT_INT8AUX", "0") not in ("", "0")


def _dot8(M, x8):
    """Single-pass matmul of 8-bit-exact operands -> exact u32 cols.

    bf16 path: entries/inputs < 2^8 are bf16-exact, f32-accumulated sums
    < 2^21 are exact.  int8 path (JOLT_MONT_INT8AUX): both sides shift by
    the 128 zero-point into int8 range and the four bilinear correction
    terms (row-sums, col-sums, 128^2*K) restore the exact value — the MXU
    runs at 2x the bf16 rate on v5e.  Bit-identical outputs."""
    if _INT8_AUX:
        K = M.shape[1]
        Mi = (M.astype(jnp.int32) - 128).astype(jnp.int8)
        xi = (x8.astype(jnp.int32) - 128).astype(jnp.int8)
        d = jax.lax.dot_general(
            Mi, xi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rs = jnp.sum(Mi.astype(jnp.int32), axis=1, keepdims=True)
        cs = jnp.sum(xi.astype(jnp.int32), axis=0, keepdims=True)
        out = d + (rs << 7) + (cs << 7) + (K << 14)
        return out.astype(jnp.uint32)
    out = jax.lax.dot_general(
        M.astype(jnp.bfloat16), x8.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.astype(jnp.int32).astype(jnp.uint32)


def _fold16(cols):
    """[2K, n] (even-rows ++ odd-rows) 8-bit-weighted columns ->
    [K, n] 16-bit-weighted values (< 2^30)."""
    k2 = cols.shape[0]
    return cols[: k2 // 2] + (cols[k2 // 2:] << 8)


def _carry_wide(t):
    """Carry 16-bit-weighted values < 2^30 to canonical limbs (one
    pre-fold brings columns under 2^17, then the log-depth lookahead)."""
    s = (t & 0xFFFF) + jnp.concatenate(
        [jnp.zeros_like(t[:1]), (t >> 16)[:-1]], axis=0)
    return _carry_ks(s)


def _prefold(t):
    """One carry-free fold of 16-bit-weighted columns: each column's high
    bits move one row up (< 2^32 in -> < 2^17 out).  NOT canonical — just
    narrow enough for the 3-chunk split of the raw REDC."""
    return (t & 0xFFFF) + jnp.concatenate(
        [jnp.zeros_like(t[:1]), (t >> 16)[:-1]], axis=0)


def _split24_f(t16):
    """[K, n] u32 raw columns (< 2^24) -> [3K, n] f32 8-bit chunks,
    row 3k+j = chunk j of column k (the redc_matrix_raw input layout)."""
    k, n = t16.shape
    c0 = (t16 & 0xFF).astype(jnp.int32).astype(jnp.float32)
    c1 = ((t16 >> 8) & 0xFF).astype(jnp.int32).astype(jnp.float32)
    c2 = ((t16 >> 16) & 0xFF).astype(jnp.int32).astype(jnp.float32)
    return jnp.concatenate(
        [c0[:, None, :], c1[:, None, :], c2[:, None, :]],
        axis=1).reshape(3 * k, n)


def _carry_mont_hi(s, p_l):
    """Final Montgomery carry, exploiting T + m*p ≡ 0 (mod R).

    s: [2L+1, n] prefolded columns (< 2^17) of T + m*p.  Because the fully
    carried low 16 limbs are ZERO by Montgomery construction, each low
    step satisfies (s_k + c_k) ≡ 0 mod 2^16, which forces
    c_{k+1} = (s_k >> 16) + [c_k > 0] — so the carry into limb 16 needs
    only an OR-reduction over the low columns' high bits instead of a
    full-width Kogge-Stone, and the real carry chain runs on the 17 high
    rows alone (~half the lookahead cost of the 33-row chain)."""
    hi_bits = s[:L] >> 16                                        # each <= 1
    # Mosaic lacks unsigned reductions; the bits are 0/1, i32 is exact.
    low_max = jnp.max(hi_bits[: L - 1].astype(jnp.int32), axis=0,
                      keepdims=True)
    any_low = jnp.where(low_max > 0, jnp.uint32(1), jnp.uint32(0))
    c16 = hi_bits[L - 1: L] + any_low
    h = jnp.concatenate([s[L: L + 1] + c16, s[L + 1:]], axis=0)  # 17 rows
    return _cond_sub_p(_carry_ks(h)[:L], p_l)


def _redc8_k(t, mnpu, mp, p_l):
    """Montgomery REDC of RAW 16-bit-weighted columns t [2L+1, n]
    (each column < 2^24 — collector output, prefolded scalar product, or
    prefolded lazy-carry sum) via constant-matrix muls.

    m = T*N' mod R straight from the uncarried chunks (redc_matrix_raw),
    then (T + m*p)/R with the half-width Montgomery carry + conditional
    subtract — the mod-p result is bit-identical to the carried schoolbook
    REDC, but the input-side 33-row Kogge-Stone carry is gone entirely."""
    n = t.shape[-1]
    m = _carry_wide(_fold16(_dot8(mnpu, _split24_f(t[:L]))))     # [L, n] mod R
    u = _fold16(_dot8(mp, _split8_f(m)))                         # [2L, n] < 2^30
    u33 = jnp.concatenate([u, jnp.zeros((1, n), jnp.uint32)], axis=0)
    s = _prefold(u33 + t)                                        # exact T + m*p
    return _carry_mont_hi(s, p_l)


def _mul_k(a, b, coll, p_l, mnpu, mp):
    """Full in-kernel Montgomery multiply of [L, n] blocks: general
    schoolbook product + raw-column constant-matrix REDC (no carry chain
    between them — the collector columns < 2^22 feed REDC directly)."""
    return _redc8_k(_products_cols(a, b, coll), mnpu, mp, p_l)


def _mul_scalar_k(mc, x, p_l, mnpu, mp):
    """Montgomery multiply by a launch-constant scalar c, given as its
    [2L, 2L] conv matrix (see scalar_mul_matrix): three tiny single-pass
    matmuls total — ~12x cheaper than the general product.  The raw conv
    columns (< 2^30) take one carry-free prefold, then REDC directly."""
    t = _fold16(_dot8(mc, _split8_f(x)))                         # [2L, n]
    t33 = jnp.concatenate(
        [t, jnp.zeros((1, x.shape[-1]), jnp.uint32)], axis=0)
    return _redc8_k(_prefold(t33), mnpu, mp, p_l)


def _mod_reduce_lanes(u, p_l_col):
    """Log-tree modular sum over the lane axis: [L, n] -> [L, 1]."""
    n = u.shape[-1]
    while n > 1:
        half = n // 2
        u = _fadd_k(u[:, :half], u[:, half:], p_l_col[:, :half])
        n = half
    return u


# ---------------------------------------------------------------------------
# batch-leading Montgomery multiply (grand-product tree levels)
# ---------------------------------------------------------------------------

def _mont_mul_bl_kernel(a_ref, b_ref, coll_ref, rowcnt_ref, mnp_ref, mp_ref,
                        p_ref, out_ref):
    n = a_ref.shape[-1]
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, n))
    out = _mul_k(a_ref[:].reshape(L, n), b_ref[:].reshape(L, n),
                 _coll_arg(coll_ref, rowcnt_ref), p_l, mnp_ref[:], mp_ref[:])
    out_ref[:] = out.reshape(1, L, n)


@functools.lru_cache(maxsize=None)
def _mont_mul_bl_call(spec: FieldSpec, B: int, n: int):
    full = lambda b, i: (0, 0)
    blk = pl.BlockSpec((1, L, NB), lambda b, i: (b, 0, i),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mont_mul_bl_kernel,
        interpret=_INTERPRET,
        out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=(B, n // NB),
            in_specs=[blk, blk,
                      pl.BlockSpec((4, 2 * L + 1, L * L),
                                   lambda b, i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((4, 2 * L + 1), lambda b, i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2 * L, 3 * L), full,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((4 * L, 2 * L), full,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM)],
            out_specs=blk,
        ),
    )


def mont_mul_bl_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray
                       ) -> jnp.ndarray:
    """Montgomery product of batch-leading [B, L, n] limb tensors
    (n a multiple of NB)."""
    B, _, n = a.shape
    coll, rowcnt, mnp, mp, p_limbs = _consts(spec)
    return _mont_mul_bl_call(spec, B, n)(a, b, coll, rowcnt, mnp, mp,
                                         p_limbs)


# ---------------------------------------------------------------------------
# fused batched-GKR grand-product round kernels (bit-reversed pair layout)
# ---------------------------------------------------------------------------
#
# A GP layer is a PAIR of batch-leading tensors l, r: [B, L, s] holding the
# left/right polynomials in bit-reversed evaluation order, so the per-round
# sibling pairs (2i, 2i+1) sit at positions (i, i + s/2): every slice below
# is a CONTIGUOUS half selected purely by BlockSpec index maps — no strided
# de-interleaving, no moveaxis, no HBM prep copies at all.  Grid is
# (nblocks, B) with the batch dim innermost: the per-block partial sums
# accumulate in VMEM scratch across the b sweep and the eq-weighted
# reduction runs once at b == B-1 (mod-p addition is order-independent, so
# results stay bit-identical to the XLA path).

GP_MB = 512              # pairs per block


def _gp_pair_evals_kernel(l0_ref, l1_ref, r0_ref, r1_ref, eq0_ref, eq1_ref,
                          cmats_ref, coll_ref, rowcnt_ref, mnp_ref, mp_ref,
                          p_ref, out_ref):
    """Cubic round-poly partial sums at t = 0, 2, 3 for one half-block.

    l*/r*: [B, L, mb] blocks cut from the lo/hi halves of the pair tensors
    purely by BlockSpec index maps; eq*: [L, mb]; cmats: [B, 4L, 2L] conv
    matrices of the batching coefficients; out: [1, L, 3] (summed over
    batch AND the block's pairs — grand_product.rs:335-396 semantics,
    coefficient folded into `left`).

    LAZY-CARRY batching (docs/PERF.md gap #2), reference mul order
    (grand_product.rs:363-390): the coefficient multiplies l0 and l1 via
    the scalar-matrix fast path (2 coeff muls per entry — the reference's
    own trick), the three cubic products are taken on the coeff-scaled
    left operands and kept as RAW collector columns, and those columns
    accumulate across a group of 4 batch entries — each product < p², so
    a 4-term sum stays < 4p² < R*p (REDC-valid) and each column
    < 4*2^22 < 2^24 (prefold-safe).  ONE carry+REDC+add flushes each
    group — 11 REDCs per 4-entry group instead of 15, and 8 conv matmuls
    instead of 12.  Mod-p result per group is identical, so the full
    batch sum — and the transcript — is unchanged."""
    B = l0_ref.shape[0]
    mb = l0_ref.shape[2]
    coll = _coll_arg(coll_ref, rowcnt_ref)
    mnp = mnp_ref[:]
    mp = mp_ref[:]
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, mb))
    zero = jnp.zeros((L, mb), jnp.uint32)
    zero_w = jnp.zeros((2 * L + 1, mb), jnp.uint32)

    def entry_raw(b):
        """One entry's coeff-scaled cubic products as raw [2L+1] columns."""
        sl = lambda ref: ref[pl.ds(b, 1), :, :].reshape(L, mb)
        l0, l1, r0, r1 = sl(l0_ref), sl(l1_ref), sl(r0_ref), sl(r1_ref)
        mc = cmats_ref[pl.ds(b, 1), :, :].reshape(4 * L, 2 * L)
        cl0 = _mul_scalar_k(mc, l0, p_l, mnp, mp)
        cl1 = _mul_scalar_k(mc, l1, p_l, mnp, mp)
        m_l = _fsub_k(cl1, cl0, p_l)
        m_r = _fsub_k(r1, r0, p_l)
        le2 = _fadd_k(cl1, m_l, p_l)
        le3 = _fadd_k(le2, m_l, p_l)
        re2 = _fadd_k(r1, m_r, p_l)
        re3 = _fadd_k(re2, m_r, p_l)
        t0 = _products_cols(cl0, r0, coll)
        t2 = _products_cols(le2, re2, coll)
        t3 = _products_cols(le3, re3, coll)
        return t0, t2, t3

    def flush(acc, w):
        """REDC a group's raw column sums and fold into the accumulators."""
        return tuple(
            _fadd_k(a, _redc8_k(_prefold(wi), mnp, mp, p_l), p_l)
            for a, wi in zip(acc, w))

    n_groups, tail = divmod(B, 4)

    def group_body(g, acc):
        w = (zero_w, zero_w, zero_w)
        for k in range(4):                     # static unroll inside a group
            v = entry_raw(g * 4 + k)
            w = tuple(a + x for a, x in zip(w, v))
        return flush(acc, w)

    acc = (zero, zero, zero)
    if n_groups:
        acc = jax.lax.fori_loop(0, n_groups, group_body, acc)
    if tail:
        w = (zero_w, zero_w, zero_w)
        for k in range(tail):
            v = entry_raw(n_groups * 4 + k)
            w = tuple(a + x for a, x in zip(w, v))
        acc = flush(acc, w)
    s0, s2, s3 = acc

    eq0 = eq0_ref[:]
    eq1 = eq1_ref[:]
    m_eq = _fsub_k(eq1, eq0, p_l)
    eqe2 = _fadd_k(eq1, m_eq, p_l)
    eqe3 = _fadd_k(eqe2, m_eq, p_l)
    u0 = _mul_k(eq0, s0, coll, p_l, mnp, mp)
    u2 = _mul_k(eqe2, s2, coll, p_l, mnp, mp)
    u3 = _mul_k(eqe3, s3, coll, p_l, mnp, mp)
    e0 = _mod_reduce_lanes(u0, p_l)
    e2 = _mod_reduce_lanes(u2, p_l)
    e3 = _mod_reduce_lanes(u3, p_l)
    vals = jnp.concatenate([e0, e2, e3], axis=-1)          # [L, 3]
    # Accumulate across grid steps in VMEM (constant output index map):
    # removes the per-round [nblocks] partial-sum glue that dominated the
    # small tail rounds.  Mod-p addition is order-independent, so the
    # result is bit-identical to summing the partials afterwards.
    i = pl.program_id(0)
    p_l3 = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, 3))

    @pl.when(i == 0)
    def _init():
        out_ref[:] = vals

    @pl.when(i != 0)
    def _accum():
        out_ref[:] = _fadd_k(out_ref[:], vals, p_l3)


def _gp_pair_bind_kernel(l0_ref, l1_ref, r0_ref, r1_ref, eq0_ref, eq1_ref,
                         rmat_ref, mnp_ref, mp_ref, p_ref,
                         nl_ref, nr_ref, neq_ref):
    """Bind: new = lo + r*(hi - lo) on contiguous halves; outputs ARE the
    next round's layer pair.  All three muls are by the round challenge —
    pure scalar-matrix fast path, no collector product at all."""
    B = l0_ref.shape[0]
    mb = l0_ref.shape[2]
    mr = rmat_ref[:]
    mnp = mnp_ref[:]
    mp = mp_ref[:]
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, mb))

    def body(b, _):
        sl = lambda ref: ref[pl.ds(b, 1), :, :].reshape(L, mb)
        l0, l1, r0, r1 = sl(l0_ref), sl(l1_ref), sl(r0_ref), sl(r1_ref)
        nl = _fadd_k(
            l0, _mul_scalar_k(mr, _fsub_k(l1, l0, p_l), p_l, mnp, mp), p_l)
        nr = _fadd_k(
            r0, _mul_scalar_k(mr, _fsub_k(r1, r0, p_l), p_l, mnp, mp), p_l)
        nl_ref[pl.ds(b, 1), :, :] = nl.reshape(1, L, mb)
        nr_ref[pl.ds(b, 1), :, :] = nr.reshape(1, L, mb)
        return 0

    jax.lax.fori_loop(0, B, body, 0)
    eq0 = eq0_ref[:]
    eq1 = eq1_ref[:]
    neq_ref[:] = _fadd_k(
        eq0, _mul_scalar_k(mr, _fsub_k(eq1, eq0, p_l), p_l, mnp, mp), p_l)


def _pair_specs(B: int, h: int):
    """BlockSpecs addressing the lo/hi halves of [B, L, 2h] pair tensors and
    the [L, 2h] eq tensor via index-map offsets (h in whole GP_MB blocks)."""
    hb = h // GP_MB
    lo = pl.BlockSpec((B, L, GP_MB), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((B, L, GP_MB), lambda i: (0, 0, hb + i),
                      memory_space=pltpu.VMEM)
    eqlo = pl.BlockSpec((L, GP_MB), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    eqhi = pl.BlockSpec((L, GP_MB), lambda i: (0, hb + i),
                        memory_space=pltpu.VMEM)
    consts = [
        pl.BlockSpec((4, 2 * L + 1, L * L), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, 2 * L + 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * L, 3 * L), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return lo, hi, eqlo, eqhi, consts


@functools.lru_cache(maxsize=None)
def _gp_pair_evals_call(spec: FieldSpec, B: int, s: int):
    h = s // 2
    nblocks = h // GP_MB
    lo, hi, eqlo, eqhi, consts = _pair_specs(B, h)
    cmats = pl.BlockSpec((B, 4 * L, 2 * L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gp_pair_evals_kernel,
        interpret=_INTERPRET,
        out_shape=jax.ShapeDtypeStruct((L, 3), jnp.uint32),
        grid=(nblocks,),
        in_specs=[lo, hi, lo, hi, eqlo, eqhi, cmats] + consts,
        out_specs=pl.BlockSpec((L, 3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )


@functools.lru_cache(maxsize=None)
def _gp_pair_bind_call(spec: FieldSpec, B: int, s: int):
    h = s // 2
    nblocks = h // GP_MB
    lo, hi, eqlo, eqhi, consts = _pair_specs(B, h)
    rmat = pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gp_pair_bind_kernel,
        interpret=_INTERPRET,
        out_shape=(jax.ShapeDtypeStruct((B, L, h), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L, h), jnp.uint32),
                   jax.ShapeDtypeStruct((L, h), jnp.uint32)),
        grid=(nblocks,),
        in_specs=[lo, hi, lo, hi, eqlo, eqhi, rmat] + consts[2:],
        out_specs=(pl.BlockSpec((B, L, GP_MB), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, L, GP_MB), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((L, GP_MB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )


@functools.lru_cache(maxsize=1)
def _conv_index():
    """Host (idx, valid) for on-device conv-matrix builds, rows reordered
    [evens ++ odds] to match _fold16."""
    k = np.arange(4 * L)[:, None]
    n = np.arange(2 * L)[None, :]
    idx = k - n
    valid = (idx >= 0) & (idx < 2 * L)
    perm = np.concatenate([np.arange(0, 4 * L, 2), np.arange(1, 4 * L, 2)])
    return np.clip(idx, 0, 2 * L - 1)[perm], valid[perm]


def scalar_conv_mats(limbs: jnp.ndarray) -> jnp.ndarray:
    """Device build of the [*, 4L, 2L] f32 conv matrices of Montgomery
    scalars given as [L, *batch] 16-bit limb tensors (tiny gather — lets
    challenges computed ON DEVICE feed the scalar-mul fast path)."""
    batch = limbs.shape[1:]
    lo = limbs & 0xFF
    hi = (limbs >> 8) & 0xFF
    c8 = jnp.concatenate([lo[:, None], hi[:, None]], axis=1).reshape(
        (2 * L,) + batch)                                  # [2L, *batch]
    idx, valid = _conv_index()
    g = c8[jnp.asarray(idx)]                               # [4L, 2L, *batch]
    g = jnp.where(jnp.asarray(valid).reshape(valid.shape + (1,) * len(batch)),
                  g, 0)
    g = jnp.moveaxis(g.astype(jnp.float32), (0, 1), (-2, -1))  # [*batch, 4L, 2L]
    return g


def gp_pair_evals_pallas(spec: FieldSpec, l: jnp.ndarray, r: jnp.ndarray,
                         eq: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Fused cubic round evals at t=0,2,3 over bit-reversed pair layers.

    l, r: [B, L, s]; eq: [L, s]; coeffs: [L, B] Montgomery limbs (turned
    into scalar-mul conv matrices on device).  Returns [L, 3]
    (bit-identical to the XLA pair path; block partials accumulate inside
    the kernel across grid steps, so no host-graph reduction remains)."""
    B, _, s = l.shape
    coll, rowcnt, mnp, mp, p_limbs = _consts(spec)
    cmats = scalar_conv_mats(coeffs)                       # [B, 4L, 2L]
    return _gp_pair_evals_call(spec, B, s)(
        l, l, r, r, eq, eq, cmats, coll, rowcnt, mnp, mp, p_limbs)


def gp_pair_bind_pallas(spec: FieldSpec, l: jnp.ndarray, r: jnp.ndarray,
                        eq: jnp.ndarray, r_chal: jnp.ndarray):
    """Fused bind of bit-reversed pair layers: returns (nl, nr, neq) with
    nl, nr: [B, L, s/2] — directly the next round's layer pair.  r_chal:
    [L] Montgomery limb vector of the round challenge."""
    B, _, s = l.shape
    _, _, mnp, mp, p_limbs = _consts(spec)
    r_mat = scalar_conv_mats(r_chal.reshape(L, 1))[0]      # [4L, 2L]
    return _gp_pair_bind_call(spec, B, s)(
        l, l, r, r, eq, eq, r_mat, mnp, mp, p_limbs)
