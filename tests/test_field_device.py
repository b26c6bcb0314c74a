"""Device limb-kernel arithmetic vs the Python-int oracle.

Mirrors the role of arkworks' own field test-vectors for the reference
(jolt-core/src/field/ark.rs); here the oracle is host big-int arithmetic.
"""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jolt_tpu.field import device as fd
from jolt_tpu.field import fr_spec, fq_spec

RNG = random.Random(1234)


def _rand_ints(spec, n, small_frac=0.25):
    out = []
    for _ in range(n):
        r = RNG.random()
        if r < small_frac / 2:
            out.append(RNG.randrange(4))  # 0,1,2,3 edge cases
        elif r < small_frac:
            out.append(RNG.randrange(1 << 64))
        else:
            out.append(RNG.randrange(spec.p))
    out[0] = 0
    if n > 1:
        out[1] = spec.p - 1
    if n > 2:
        out[2] = 1
    return out


@pytest.mark.parametrize("spec", [fr_spec(), fq_spec()], ids=["fr", "fq"])
def test_roundtrip(spec):
    xs = _rand_ints(spec, 16)
    dev = fd.ints_to_device(spec, xs)
    back = fd.device_to_ints(spec, dev)
    assert [int(b) for b in back] == [x % spec.p for x in xs]


@pytest.mark.parametrize("spec", [fr_spec(), fq_spec()], ids=["fr", "fq"])
def test_add_sub_neg(spec):
    n = 64
    xs, ys = _rand_ints(spec, n), _rand_ints(spec, n)
    a = fd.ints_to_device(spec, xs)
    b = fd.ints_to_device(spec, ys)
    s = fd.device_to_ints(spec, jax.jit(fd.fadd, static_argnums=0)(spec, a, b))
    d = fd.device_to_ints(spec, jax.jit(fd.fsub, static_argnums=0)(spec, a, b))
    ng = fd.device_to_ints(spec, jax.jit(fd.fneg, static_argnums=0)(spec, a))
    for i in range(n):
        assert int(s[i]) == (xs[i] + ys[i]) % spec.p
        assert int(d[i]) == (xs[i] - ys[i]) % spec.p
        assert int(ng[i]) == (-xs[i]) % spec.p


@pytest.mark.parametrize("spec", [fr_spec(), fq_spec()], ids=["fr", "fq"])
def test_mul(spec):
    n = 64
    xs, ys = _rand_ints(spec, n), _rand_ints(spec, n)
    a = fd.ints_to_device(spec, xs)
    b = fd.ints_to_device(spec, ys)
    m = fd.device_to_ints(spec, jax.jit(fd.fmul, static_argnums=0)(spec, a, b))
    for i in range(n):
        assert int(m[i]) == (xs[i] * ys[i]) % spec.p, i
    sq = fd.device_to_ints(spec, fd.fsquare(spec, a))
    for i in range(n):
        assert int(sq[i]) == (xs[i] * xs[i]) % spec.p


def test_mul_stress_fr():
    spec = fr_spec()
    n = 512
    xs, ys = _rand_ints(spec, n, small_frac=0.5), _rand_ints(spec, n, small_frac=0.5)
    a = fd.ints_to_device(spec, xs)
    b = fd.ints_to_device(spec, ys)
    m = fd.device_to_ints(spec, fd.fmul(spec, a, b))
    for i in range(n):
        assert int(m[i]) == (xs[i] * ys[i]) % spec.p, i


def test_fsum():
    spec = fr_spec()
    for n in (1, 2, 3, 7, 8, 33, 64):
        xs = _rand_ints(spec, n)
        a = fd.ints_to_device(spec, xs)
        s = fd.device_to_ints(spec, fd.fsum(spec, a, axis=0))
        assert int(s) == sum(xs) % spec.p, n


def test_scalar_broadcast_mul():
    spec = fr_spec()
    xs = _rand_ints(spec, 8)
    c = RNG.randrange(spec.p)
    a = fd.ints_to_device(spec, xs)
    cs = fd.scalar_to_device(spec, c)[:, None]
    m = fd.device_to_ints(spec, fd.fmul(spec, jnp.broadcast_to(cs, a.shape), a))
    for i in range(8):
        assert int(m[i]) == (c * xs[i]) % spec.p


def test_pack_u64():
    vals = np.array([0, 1, 2**16, 2**32 - 1, 2**63 + 12345], dtype=np.uint64)
    limbs = fd.pack_u64(vals)
    back = fd.unpack_ints(limbs)
    assert [int(b) for b in back] == [int(v) for v in vals]


def test_host_felt():
    from jolt_tpu.field import fr
    a, b = fr(123456789), fr(987654321)
    assert int(a * b) == (123456789 * 987654321) % fr_spec().p
    assert (a * a.inverse()) == fr(1)
    assert int(a - b + b) == int(a)
    from jolt_tpu.field import batch_inverse
    vals = [fr(x) for x in [3, 5, 7, 11]]
    for v, iv in zip(vals, batch_inverse(vals)):
        assert v * iv == fr(1)
