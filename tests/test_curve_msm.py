"""Device curve kernels + MSM vs the host oracle."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from jolt_tpu.curve.bn254 import G1Affine, G1Jacobian, g1_msm_host
from jolt_tpu.curve import device as cd
from jolt_tpu.field import device as fd
from jolt_tpu.field.spec import fq_spec, fr_spec

RNG = random.Random(2024)
FQ = fq_spec()
FR = fr_spec()


def _rand_points(n):
    g = G1Affine.generator().to_jacobian()
    return [g.mul(RNG.randrange(1, FR.p)).to_affine() for _ in range(n)]


def test_jac_add_double_device():
    pts = _rand_points(4)
    x, y, _ = cd.points_to_device(pts)
    one = fd.ones(FQ, (4,))
    X, Y, Z = x, y, one

    dX, dY, dZ = cd.jac_double(X, Y, Z)
    got = cd.jacobian_to_host(dX, dY, dZ)
    for p, g in zip(pts, got):
        assert g.to_affine() == p.to_jacobian().double().to_affine()

    # add P[i] + P[(i+1)%4]
    x2 = jnp.roll(x, -1, axis=-1)
    y2 = jnp.roll(y, -1, axis=-1)
    aX, aY, aZ = cd.jac_add((X, Y, Z), (x2, y2, one))
    got = cd.jacobian_to_host(aX, aY, aZ)
    for i in range(4):
        want = pts[i].to_jacobian().add(pts[(i + 1) % 4].to_jacobian())
        assert got[i].to_affine() == want.to_affine(), i

    # special cases: P + P (doubling path), P + (-P) (infinity), P + inf
    negy = fd.fneg(FQ, y)
    sX, sY, sZ = cd.jac_add((X, Y, Z), (x, y, one))
    got = cd.jacobian_to_host(sX, sY, sZ)
    for i in range(4):
        assert got[i].to_affine() == pts[i].to_jacobian().double().to_affine()
    oX, oY, oZ = cd.jac_add((X, Y, Z), (x, negy, one))
    got = cd.jacobian_to_host(oX, oY, oZ)
    for g in got:
        assert g.is_infinity()
    zero = jnp.zeros_like(one)
    iX, iY, iZ = cd.jac_add((X, Y, Z), (x2, y2, zero))
    got = cd.jacobian_to_host(iX, iY, iZ)
    for i in range(4):
        assert got[i].to_affine() == pts[i]


def test_msm_device_vs_host():
    """Full-width scalars through the sort-based window MSM (one size: the
    32-window graph is the compile hog; the production bitplane path has
    its own suite in test_msm_bitplane.py)."""
    n = 8
    pts = _rand_points(n)
    scalars = [RNG.randrange(FR.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    pts[2] = G1Affine.identity()
    dev_pts = cd.points_to_device(pts)
    s_mont = fd.ints_to_device(FR, scalars)
    got = cd.msm(dev_pts, s_mont, FR)
    want = g1_msm_host(pts, scalars)
    assert got == want


def test_msm_small_scalars():
    """Small scalars (counter polynomials) — the dominant Jolt MSM shape."""
    n = 16
    pts = _rand_points(n)
    scalars = [RNG.randrange(4) for _ in range(n)]
    dev_pts = cd.points_to_device(pts)
    s_mont = fd.ints_to_device(FR, scalars)
    assert cd.msm(dev_pts, s_mont, FR) == g1_msm_host(pts, scalars)
