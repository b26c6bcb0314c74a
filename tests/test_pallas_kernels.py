"""Fused Pallas kernels vs the XLA field path — bit-identical results.

Runs only on TPU backends (JOLT_TEST_PLATFORM=axon); on CPU the kernels are
covered in interpret mode.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jolt_tpu.field import fr_spec
from jolt_tpu.field import device as fd

ON_TPU = jax.default_backend() in ("tpu", "axon")
# JOLT_PALLAS_INTERPRET=1 routes every kernel through the Pallas
# interpreter, so the parity checks below are meaningful on any backend.
INTERPRET = os.environ.get("JOLT_PALLAS_INTERPRET", "") not in ("", "0")
RUN = ON_TPU or INTERPRET


def _rand_mont(spec, shape, seed):
    rng = np.random.default_rng(seed)
    return fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=shape, dtype=np.uint64))))


@pytest.mark.skipif(not RUN, reason="TPU or interpret mode only")
def test_pallas_mont_mul_matches_xla():
    spec = fr_spec()
    a = _rand_mont(spec, (1 << 11,), 1)
    b = _rand_mont(spec, (1 << 11,), 2)
    from jolt_tpu.field.pallas_mont import mont_mul_pallas
    want = fd._mont_redc(spec, fd._carry(fd._mul_columns(a, b)))
    got = mont_mul_pallas(spec, a, b)
    assert bool(jnp.all(want == got))


@pytest.mark.skipif(not RUN, reason="TPU or interpret mode only")
def test_pallas_mont_mul_bl_matches_xla():
    spec = fr_spec()
    B, n = 3, 1 << 11
    a = jnp.moveaxis(_rand_mont(spec, (B, n), 6), 0, 1)   # [B, L, n]
    b = jnp.moveaxis(_rand_mont(spec, (B, n), 7), 0, 1)
    from jolt_tpu.field.pallas_mont import mont_mul_bl_pallas
    af, bf = jnp.moveaxis(a, 0, 1), jnp.moveaxis(b, 0, 1)
    want = jnp.moveaxis(
        fd._mont_redc(spec, fd._carry(fd._mul_columns(af, bf))), 0, 1)
    got = mont_mul_bl_pallas(spec, a, b)
    assert bool(jnp.all(want == got))


@pytest.mark.skipif(not RUN, reason="TPU or interpret mode only")
def test_pallas_gp_pair_round_matches_xla():
    """Pair round kernels vs the XLA pair math (contiguous halves)."""
    spec = fr_spec()
    B, s = 3, 1 << 12                   # h = s//2 = 2048 = 4 * GP_MB
    h = s // 2
    l = jnp.moveaxis(_rand_mont(spec, (B, s), 3), 0, 1)   # [B, L, s]
    rt = jnp.moveaxis(_rand_mont(spec, (B, s), 8), 0, 1)
    eq = _rand_mont(spec, (s,), 4)
    coeffs = _rand_mont(spec, (B,), 5)
    r = fd.scalar_to_device(spec, 31337133713371337)
    from jolt_tpu.field.pallas_mont import (gp_pair_bind_pallas,
                                            gp_pair_evals_pallas)
    from jolt_tpu.subprotocols.grand_product import _bcast_coeffs
    # XLA reference on limb-first views
    lf, rf = jnp.moveaxis(l, 0, 1), jnp.moveaxis(rt, 0, 1)
    l0, l1 = lf[..., :h], lf[..., h:]
    r0, r1 = rf[..., :h], rf[..., h:]
    cl0 = fd.fmul(spec, _bcast_coeffs(coeffs, l0), l0)
    cl1 = fd.fmul(spec, _bcast_coeffs(coeffs, l1), l1)
    m_l = fd.fsub(spec, cl1, cl0)
    m_r = fd.fsub(spec, r1, r0)
    le2 = fd.fadd(spec, cl1, m_l)
    le3 = fd.fadd(spec, le2, m_l)
    re2 = fd.fadd(spec, r1, m_r)
    re3 = fd.fadd(spec, re2, m_r)
    s0 = fd.fsum(spec, fd.fmul(spec, cl0, r0), axis=0)
    s2 = fd.fsum(spec, fd.fmul(spec, le2, re2), axis=0)
    s3 = fd.fsum(spec, fd.fmul(spec, le3, re3), axis=0)
    eq0, eq1 = eq[..., :h], eq[..., h:]
    m_eq = fd.fsub(spec, eq1, eq0)
    eqe2 = fd.fadd(spec, eq1, m_eq)
    eqe3 = fd.fadd(spec, eqe2, m_eq)
    e0 = fd.fsum(spec, fd.fmul(spec, eq0, s0), axis=0)
    e2 = fd.fsum(spec, fd.fmul(spec, eqe2, s2), axis=0)
    e3 = fd.fsum(spec, fd.fmul(spec, eqe3, s3), axis=0)
    want_e = jnp.stack([e0, e2, e3], axis=1)

    got_e = gp_pair_evals_pallas(spec, l, rt, eq, coeffs)
    assert bool(jnp.all(want_e == got_e))

    rb = jnp.broadcast_to(r.reshape((fd.L, 1, 1)), l0.shape)
    want_nl = fd.fadd(spec, l0, fd.fmul(spec, rb, fd.fsub(spec, l1, l0)))
    want_nr = fd.fadd(spec, r0, fd.fmul(spec, rb, fd.fsub(spec, r1, r0)))
    want_neq = fd.fadd(spec, eq0, fd.fmul(
        spec, jnp.broadcast_to(r.reshape((fd.L, 1)), eq0.shape),
        fd.fsub(spec, eq1, eq0)))
    got_nl, got_nr, got_neq = gp_pair_bind_pallas(spec, l, rt, eq, r)
    assert bool(jnp.all(jnp.moveaxis(want_nl, 0, 1) == got_nl))
    assert bool(jnp.all(jnp.moveaxis(want_nr, 0, 1) == got_nr))
    assert bool(jnp.all(want_neq == got_neq))


@pytest.mark.skipif(not RUN, reason="TPU or interpret mode only")
def test_pallas_point_ops_match_xla():
    """Fused jac_add/jac_double kernels vs the XLA point path, including
    the masked special cases (P+P, P+(-P), P+inf, inf+inf)."""
    import os
    from jolt_tpu.curve import device as cd
    from jolt_tpu.curve.bn254 import G1Affine
    from jolt_tpu.curve.pallas_point import jac_add_pallas, jac_double_pallas
    from jolt_tpu.field.spec import fq_spec
    import random
    FQ = fq_spec()
    rng = random.Random(99)
    n = 300                                  # forces one padded block
    g = G1Affine.generator().to_jacobian()
    pts = [g.mul(rng.randrange(1, 1 << 40)).to_affine() for _ in range(n)]
    x, y, inf = cd.points_to_device(pts)
    one = fd.ones(FQ, (n,))
    z = jnp.where(jnp.asarray(inf)[None], jnp.zeros_like(one), one)
    x2 = jnp.roll(x, -1, axis=-1)
    y2 = jnp.roll(y, -1, axis=-1)
    z2 = jnp.roll(z, -1, axis=-1)
    # weave in special cases: [5] doubling pair, [6] opposite, [7] rhs inf,
    # [8] lhs inf
    y2n = fd.fneg(FQ, y)
    x2 = x2.at[:, 5].set(x[:, 5]); y2 = y2.at[:, 5].set(y[:, 5])
    z2 = z2.at[:, 5].set(z[:, 5])
    x2 = x2.at[:, 6].set(x[:, 6]); y2 = y2.at[:, 6].set(y2n[:, 6])
    z2 = z2.at[:, 6].set(z[:, 6])
    z2 = z2.at[:, 7].set(0)
    z = z.at[:, 8].set(0)

    os.environ["JOLT_TPU_NO_POINT_PALLAS"] = "1"   # XLA reference path
    try:
        want = cd.jac_add((x, y, z), (x2, y2, z2))
        want_d = cd.jac_double(x, y, z)
    finally:
        del os.environ["JOLT_TPU_NO_POINT_PALLAS"]
    got = jac_add_pallas(FQ, (x, y, z), (x2, y2, z2))
    got_d = jac_double_pallas(FQ, x, y, z)
    for w, gt in zip(want + want_d, got + got_d):
        assert bool(jnp.all(w == gt))
