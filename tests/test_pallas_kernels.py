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


def _rand_mont(spec, shape, seed):
    rng = np.random.default_rng(seed)
    return fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=shape, dtype=np.uint64))))


@pytest.mark.skipif(not ON_TPU, reason="TPU-only kernel")
def test_pallas_mont_mul_matches_xla():
    spec = fr_spec()
    a = _rand_mont(spec, (1 << 11,), 1)
    b = _rand_mont(spec, (1 << 11,), 2)
    from jolt_tpu.field.pallas_mont import mont_mul_pallas
    want = fd._mont_redc(spec, fd._carry(fd._mul_columns(a, b)))
    got = mont_mul_pallas(spec, a, b)
    assert bool(jnp.all(want == got))


@pytest.mark.skipif(not ON_TPU, reason="TPU-only kernel")
def test_pallas_gp_round_matches_xla():
    spec = fr_spec()
    B, n = 3, 1 << 13
    layer = _rand_mont(spec, (B, n), 3)
    eq = _rand_mont(spec, (n // 2,), 4)
    coeffs = _rand_mont(spec, (B,), 5)
    r = fd.scalar_to_device(spec, 31337133713371337)
    from jolt_tpu.field.pallas_mont import (gp_bind_pallas,
                                            gp_cubic_evals_pallas)
    # XLA reference (force the non-pallas path by computing directly)
    l0, r0 = layer[..., 0::4], layer[..., 1::4]
    l1, r1 = layer[..., 2::4], layer[..., 3::4]
    from jolt_tpu.subprotocols.grand_product import _bcast_coeffs
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
    eq0, eq1 = eq[..., 0::2], eq[..., 1::2]
    m_eq = fd.fsub(spec, eq1, eq0)
    eqe2 = fd.fadd(spec, eq1, m_eq)
    eqe3 = fd.fadd(spec, eqe2, m_eq)
    e0 = fd.fsum(spec, fd.fmul(spec, eq0, s0), axis=0)
    e2 = fd.fsum(spec, fd.fmul(spec, eqe2, s2), axis=0)
    e3 = fd.fsum(spec, fd.fmul(spec, eqe3, s3), axis=0)
    want_e = jnp.stack([e0, e2, e3], axis=1)

    got_e = gp_cubic_evals_pallas(spec, layer, eq, coeffs)
    assert bool(jnp.all(want_e == got_e))

    rb = jnp.broadcast_to(r.reshape((fd.L, 1, 1)), l0.shape)
    want_l = jnp.stack(
        [fd.fadd(spec, l0, fd.fmul(spec, rb, fd.fsub(spec, l1, l0))),
         fd.fadd(spec, r0, fd.fmul(spec, rb, fd.fsub(spec, r1, r0)))],
        axis=-1).reshape(layer.shape[:-1] + (n // 2,))
    got_l, got_q = gp_bind_pallas(spec, layer, eq, r)
    assert bool(jnp.all(want_l == got_l))
