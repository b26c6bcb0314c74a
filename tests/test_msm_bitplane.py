"""Bitplane MSM (curve/device.py batch_msm_bitplane) vs the host oracle.

The bitplane method is the production commit path (kzg_commit /
kzg_commit_batch); scalars of every size class Jolt produces — zeros,
0/1 flags, u32 counters, full-field RLC values — must agree with the
pure-python bigint MSM (reference semantics: msm/mod.rs:11-482).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jolt_tpu.curve import device as cd
from jolt_tpu.curve.bn254 import G1Affine, g1_msm_host
from jolt_tpu.field import device as fd, fr_spec

SPEC = fr_spec()


def _points(n: int):
    pts = []
    acc = G1Affine.generator().to_jacobian()
    g = acc
    for _ in range(n):
        pts.append(acc.to_affine())
        acc = acc.add(g).double()
    return pts


def _to_jac(pts):
    px, py, inf = cd.points_to_device(pts)
    one = fd.ones(cd.FQ, (len(pts),))
    pz = jnp.where(jnp.asarray(inf)[None], jnp.zeros_like(one), one)
    return px, py, pz


@pytest.mark.parametrize("n", [8, 16, 13])
def test_bitplane_matches_host_oracle(n):
    rng = np.random.default_rng(42)
    pts = _points(n)
    jac = _to_jac(pts)
    scalar_sets = [
        [0] * n,                                        # all zero
        [1] * n,                                        # all ones
        [int(b) for b in rng.integers(0, 2, size=n)],   # 0/1 flags
        [int(v) for v in rng.integers(0, 1 << 32, size=n)],  # u32 counters
        [int(v) % SPEC.p for v in
         (rng.integers(1, 1 << 63, size=n).astype(object) ** 4)],  # big
    ]
    mont = [fd.ints_to_device(SPEC, vals) for vals in scalar_sets]
    got = cd.batch_msm_bitplane(jac, mont, SPEC)
    for vals, g in zip(scalar_sets, got):
        want = g1_msm_host(pts, vals)
        assert (g.x, g.y, g.is_infinity) == \
            (want.x, want.y, want.is_infinity), f"scalars {vals[:4]}..."


def test_kzg_commit_batch_matches_host():
    from jolt_tpu.commitment.kzg import (kzg_commit, kzg_commit_batch,
                                         srs_setup)
    pk, _ = srs_setup(16)
    srs_host = [p.to_affine() for p in cd.jacobian_to_host(*pk.g1_jac)]
    rng = np.random.default_rng(7)
    polys, vals = [], []
    for n in (16, 8):
        v = [int(x) for x in rng.integers(0, 1 << 40, size=n)]
        vals.append(v)
        polys.append(fd.ints_to_device(SPEC, v))
    got = kzg_commit_batch(pk, polys)
    for v, g in zip(vals, got):
        want = g1_msm_host(srs_host[:len(v)], v)
        assert (g.x, g.y) == (want.x, want.y)
    single = kzg_commit(pk, polys[0])
    assert (single.x, single.y) == (got[0].x, got[0].y)


def test_bitplane_scanfold_path_matches_host_oracle():
    """N >= MSM_FOLD_SEG exercises the canonical scan-fold program (the
    production commit geometry); cross-checked against the bigint MSM."""
    n = cd.MSM_FOLD_SEG
    rng = np.random.default_rng(5)
    pts = _points(64)
    # tile to n points (repeat pattern keeps host oracle cost bounded)
    reps = n // 64
    pts = pts * reps
    jac = _to_jac(pts)
    vals = [int(v) for v in rng.integers(0, 1 << 16, size=n)]
    mont = [fd.ints_to_device(SPEC, vals)]
    got = cd.batch_msm_bitplane(jac, mont, SPEC)[0]
    want = g1_msm_host(pts, vals)
    assert (got.x, got.y, got.is_infinity) == \
        (want.x, want.y, want.is_infinity)
