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


@functools.lru_cache(maxsize=None)
def _collector_T(nl: int) -> np.ndarray:
    """f32 [2*nl+1, nl*nl*2]: row k collects lo/hi product parts with
    i+j(+1) == k (transposed collector of field/device.py)."""
    ncols = 2 * nl + 1
    mat = np.zeros((ncols, nl * nl * 2), dtype=np.float32)
    for i in range(nl):
        for j in range(nl):
            mat[i + j, (i * nl + j) * 2 + 0] = 1.0
            mat[i + j + 1, (i * nl + j) * 2 + 1] = 1.0
    return mat


def _products_cols(a, b, coll):
    """Column sums of the double-width product of two [L, NB] u32 limb
    blocks -> [2L+1, NB] u32 (each < 2^22, exact in f32)."""
    prod = a[:, None, :] * b[None, :, :]                  # [L, L, NB] u32
    # Mosaic lacks u32<->f32 casts; round-trip through i32 (values < 2^22).
    # Mask AFTER the shift: Mosaic may lower u32 >> as an arithmetic i32
    # shift, sign-extending products with the top bit set.
    lo = (prod & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
    hi = ((prod >> W) & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
    flat = jnp.concatenate(
        [lo[:, :, None, :], hi[:, :, None, :]], axis=2
    ).reshape(L * L * 2, -1)                              # [2L^2, NB]
    cols = jax.lax.dot_general(
        coll, flat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,              # exact f32 on MXU
        preferred_element_type=jnp.float32)               # [2L+1, NB]
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


def _mont_mul_kernel(a_ref, b_ref, coll_ref, np_ref, p_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    coll = coll_ref[:]
    nb = a.shape[-1]
    np_l = jnp.broadcast_to(np_ref[:].reshape(L, 1), (L, nb))
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, nb))

    t = _carry_ks(_products_cols(a, b, coll))             # [2L+1, NB]
    m = _carry_ks(_products_cols(t[:L], np_l, coll))[:L]
    u = _products_cols(m, p_l, coll)
    s = _carry_ks(u + t)                                  # exact T + m*p
    hi = s[L:2 * L]                                       # / R
    out_ref[:] = _cond_sub_p(hi, p_l)


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, n: int):
    grid = (n // NB,)
    full = lambda i: (0, 0)
    return pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, NB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, NB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * L + 1, L * L * 2), full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, NB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * (2 * L + 1) * (L * L * 2) * n,
            bytes_accessed=3 * L * n * 4,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=None)
def _consts(spec: FieldSpec):
    coll = jnp.asarray(_collector_T(L))
    nprime = jnp.asarray(np.asarray(spec.nprime_limbs, np.uint32)
                         .reshape(L, 1))
    p_limbs = jnp.asarray(np.asarray(spec.p_limbs, np.uint32).reshape(L, 1))
    return coll, nprime, p_limbs


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
    n = max(NB, -(-batch // NB) * NB)
    if n != batch:
        pad = jnp.zeros((L, n - batch), dtype=jnp.uint32)
        af = jnp.concatenate([af, pad], axis=1)
        bf = jnp.concatenate([bf, pad], axis=1)
    coll, nprime, p_limbs = _consts(spec)
    out = _mont_mul_call(spec, n)(af, bf, coll, nprime, p_limbs)
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


def _mul_k(a, b, coll, p_l, np_l):
    """Full in-kernel Montgomery multiply of [L, n] blocks."""
    t = _carry_ks(_products_cols(a, b, coll))
    m = _carry_ks(_products_cols(t[:L], np_l, coll))[:L]
    u = _products_cols(m, p_l, coll)
    s = _carry_ks(u + t)
    return _cond_sub_p(s[L:2 * L], p_l)


def _mod_reduce_lanes(u, p_l_col):
    """Log-tree modular sum over the lane axis: [L, n] -> [L, 1]."""
    n = u.shape[-1]
    while n > 1:
        half = n // 2
        u = _fadd_k(u[:, :half], u[:, half:], p_l_col[:, :half])
        n = half
    return u


# ---------------------------------------------------------------------------
# fused batched-GKR grand-product round kernels
# ---------------------------------------------------------------------------

def _gp_evals_kernel(l0_ref, r0_ref, l1_ref, r1_ref, eq0_ref, eq1_ref,
                     coeffs_ref, coll_ref, np_ref, p_ref, out_ref):
    """Cubic round-poly partial sums at t = 0, 2, 3 for one quad block.

    l*/r*: [B, L, mb] (batch LEADING, untiled, so dynamic indexing needs no
    tile alignment); eq*: [L, mb]; coeffs: [B, L]; out: [1, L, 3]
    (summed over batch AND the block's quads — grand_product.rs:335-396
    semantics, coefficient folded into `left`)."""
    B = l0_ref.shape[0]
    mb = l0_ref.shape[2]
    coll = coll_ref[:]
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, mb))
    np_l = jnp.broadcast_to(np_ref[:].reshape(L, 1), (L, mb))
    # fori_loop over the batch: the body (9 Montgomery muls) compiles ONCE —
    # unrolling B copies explodes Mosaic compile time.  Dynamic indexing
    # happens on the refs (VMEM loads), not on loaded values.
    def body(b, acc):
        s0, s2, s3 = acc
        sl = lambda ref: ref[pl.ds(b, 1), :, :].reshape(L, mb)
        l0, r0, l1, r1 = sl(l0_ref), sl(r0_ref), sl(l1_ref), sl(r1_ref)
        c = jnp.broadcast_to(
            coeffs_ref[pl.ds(b, 1), :].reshape(L, 1), (L, mb))
        cl0 = _mul_k(c, l0, coll, p_l, np_l)
        cl1 = _mul_k(c, l1, coll, p_l, np_l)
        m_l = _fsub_k(cl1, cl0, p_l)
        m_r = _fsub_k(r1, r0, p_l)
        le2 = _fadd_k(cl1, m_l, p_l)
        le3 = _fadd_k(le2, m_l, p_l)
        re2 = _fadd_k(r1, m_r, p_l)
        re3 = _fadd_k(re2, m_r, p_l)
        t0 = _mul_k(cl0, r0, coll, p_l, np_l)
        t2 = _mul_k(le2, re2, coll, p_l, np_l)
        t3 = _mul_k(le3, re3, coll, p_l, np_l)
        return (_fadd_k(s0, t0, p_l), _fadd_k(s2, t2, p_l),
                _fadd_k(s3, t3, p_l))

    zero = jnp.zeros((L, mb), jnp.uint32)
    s0, s2, s3 = jax.lax.fori_loop(0, B, body, (zero, zero, zero))

    eq0 = eq0_ref[:]
    eq1 = eq1_ref[:]
    m_eq = _fsub_k(eq1, eq0, p_l)
    eqe2 = _fadd_k(eq1, m_eq, p_l)
    eqe3 = _fadd_k(eqe2, m_eq, p_l)
    u0 = _mul_k(eq0, s0, coll, p_l, np_l)
    u2 = _mul_k(eqe2, s2, coll, p_l, np_l)
    u3 = _mul_k(eqe3, s3, coll, p_l, np_l)
    e0 = _mod_reduce_lanes(u0, p_l)
    e2 = _mod_reduce_lanes(u2, p_l)
    e3 = _mod_reduce_lanes(u3, p_l)
    out_ref[:] = jnp.concatenate([e0, e2, e3], axis=-1).reshape(1, L, 3)


def _gp_bind_kernel(l0_ref, r0_ref, l1_ref, r1_ref, eq0_ref, eq1_ref,
                    r_ref, coll_ref, np_ref, p_ref,
                    nl_ref, nr_ref, neq_ref):
    """Bottom-variable bind: new = lo + r*(hi - lo), batch + eq fused."""
    B = l0_ref.shape[0]
    mb = l0_ref.shape[2]
    coll = coll_ref[:]
    p_l = jnp.broadcast_to(p_ref[:].reshape(L, 1), (L, mb))
    np_l = jnp.broadcast_to(np_ref[:].reshape(L, 1), (L, mb))
    r = jnp.broadcast_to(r_ref[:].reshape(L, 1), (L, mb))

    def body(b, _):
        sl = lambda ref: ref[pl.ds(b, 1), :, :].reshape(L, mb)
        l0, l1, r0, r1 = sl(l0_ref), sl(l1_ref), sl(r0_ref), sl(r1_ref)
        nl = _fadd_k(
            l0, _mul_k(r, _fsub_k(l1, l0, p_l), coll, p_l, np_l), p_l)
        nr = _fadd_k(
            r0, _mul_k(r, _fsub_k(r1, r0, p_l), coll, p_l, np_l), p_l)
        nl_ref[pl.ds(b, 1), :, :] = nl.reshape(1, L, mb)
        nr_ref[pl.ds(b, 1), :, :] = nr.reshape(1, L, mb)
        return 0

    jax.lax.fori_loop(0, B, body, 0)
    eq0 = eq0_ref[:]
    eq1 = eq1_ref[:]
    neq_ref[:] = _fadd_k(
        eq0, _mul_k(r, _fsub_k(eq1, eq0, p_l), coll, p_l, np_l), p_l)


GP_MB = 512              # quads per block


@functools.lru_cache(maxsize=None)
def _gp_evals_call(spec: FieldSpec, B: int, m: int):
    nblocks = m // GP_MB
    full = lambda i: (0, 0)
    big = pl.BlockSpec((B, L, GP_MB), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((L, GP_MB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gp_evals_kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks, L, 3), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=(nblocks,),
            in_specs=[big, big, big, big, vec, vec,
                      pl.BlockSpec((B, L), full, memory_space=pltpu.VMEM),
                      pl.BlockSpec((2 * L + 1, L * L * 2), full,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, L, 3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )


@functools.lru_cache(maxsize=None)
def _gp_bind_call(spec: FieldSpec, B: int, m: int):
    nblocks = m // GP_MB
    full = lambda i: (0, 0)
    big = pl.BlockSpec((B, L, GP_MB), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((L, GP_MB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gp_bind_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, L, m), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L, m), jnp.uint32),
                   jax.ShapeDtypeStruct((L, m), jnp.uint32)),
        grid_spec=pl.GridSpec(
            grid=(nblocks,),
            in_specs=[big, big, big, big, vec, vec,
                      pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM),
                      pl.BlockSpec((2 * L + 1, L * L * 2), full,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM),
                      pl.BlockSpec((L, 1), full, memory_space=pltpu.VMEM)],
            out_specs=(big, big, vec),
        ),
    )


def gp_cubic_evals_pallas(spec: FieldSpec, layer: jnp.ndarray,
                          eq: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Fused cubic round evals at t=0,2,3 -> [L, 3] (bit-identical to the
    XLA _gp_cubic_evals)."""
    from . import device as fd
    B = layer.shape[1]
    m = layer.shape[-1] // 4
    bf = lambda t: jnp.moveaxis(t, 1, 0)      # [L,B,m] -> [B,L,m]
    l0, r0 = bf(layer[..., 0::4]), bf(layer[..., 1::4])
    l1, r1 = bf(layer[..., 2::4]), bf(layer[..., 3::4])
    eq0, eq1 = eq[..., 0::2], eq[..., 1::2]
    coll, nprime, p_limbs = _consts(spec)
    partials = _gp_evals_call(spec, B, m)(
        l0, r0, l1, r1, eq0, eq1, coeffs.T, coll, nprime, p_limbs)
    return fd.fsum(spec, jnp.moveaxis(partials, 0, -1), axis=-1)  # [L, 3]


def gp_bind_pallas(spec: FieldSpec, layer: jnp.ndarray, eq: jnp.ndarray,
                   r: jnp.ndarray):
    """Fused bottom bind; returns (new interleaved layer [L,B,2m], new eq)."""
    B = layer.shape[1]
    m = layer.shape[-1] // 4
    bf = lambda t: jnp.moveaxis(t, 1, 0)      # [L,B,m] -> [B,L,m]
    l0, r0 = bf(layer[..., 0::4]), bf(layer[..., 1::4])
    l1, r1 = bf(layer[..., 2::4]), bf(layer[..., 3::4])
    eq0, eq1 = eq[..., 0::2], eq[..., 1::2]
    coll, nprime, p_limbs = _consts(spec)
    nl, nr, neq = _gp_bind_call(spec, B, m)(
        l0, r0, l1, r1, eq0, eq1, r.reshape(L, 1), coll, nprime, p_limbs)
    nl, nr = jnp.moveaxis(nl, 0, 1), jnp.moveaxis(nr, 0, 1)
    new_layer = jnp.stack([nl, nr], axis=-1).reshape(layer.shape[:-1]
                                                     + (2 * m,))
    return new_layer, neq
