"""Generic sumcheck prove/verify roundtrip with the host MLE oracle."""
import random

from jolt_tpu.field import FElt, fr, fr_spec
from jolt_tpu.poly import mle
from jolt_tpu.subprotocols.sumcheck import comb_product, prove_arbitrary
from jolt_tpu.transcript import Transcript

RNG = random.Random(7)


def _rand_mle_ints(n):
    return [RNG.randrange(fr_spec().p) for _ in range(n)]


def test_sumcheck_product_roundtrip():
    spec = fr_spec()
    num_vars = 3
    n = 1 << num_vars
    a_i, b_i, c_i = _rand_mle_ints(n), _rand_mle_ints(n), _rand_mle_ints(n)
    a = mle.mle_from_ints(spec, a_i)
    b = mle.mle_from_ints(spec, b_i)
    c = mle.mle_from_ints(spec, c_i)

    claim = fr(sum(x * y * z for x, y, z in zip(a_i, b_i, c_i)))

    pt = Transcript(b"test")
    proof, r_prove, final_evals = prove_arbitrary(
        num_vars, (a, b, c), comb_product, 3, pt)

    vt = Transcript(b"test")
    vt.compare_to(pt)
    final_claim, r_verify = proof.verify(claim, num_vars, 3, vt)
    assert [x.v for x in r_verify] == [x.v for x in r_prove]

    # oracle check: claim == A(r) * B(r) * C(r)
    af = [fr(x) for x in a_i]
    bf = [fr(x) for x in b_i]
    cf = [fr(x) for x in c_i]
    expected = (mle.evaluate_host(af, r_verify) * mle.evaluate_host(bf, r_verify)
                * mle.evaluate_host(cf, r_verify))
    assert final_claim == expected
    # prover's reported final evals match host evaluation
    assert final_evals[0] == mle.evaluate_host(af, r_verify)

    # a wrong claim must produce a different final claim than the oracle
    vt2 = Transcript(b"test")
    bad_claim, _ = proof.verify(claim + fr(1), num_vars, 3, vt2)
    assert bad_claim != expected


def test_eq_table_device_matches_host():
    spec = fr_spec()
    r = [fr(RNG.randrange(spec.p)) for _ in range(3)]
    import jolt_tpu.field.device as fd
    dev = mle.eq_evals_device(spec, [fd.scalar_to_device(spec, x.v) for x in r])
    host = mle.eq_evals_host(r)
    got = fd.device_to_ints(spec, dev)
    assert [int(g) for g in got.tolist()] == [h.v for h in host]
    # and the closed-form evaluate agrees with the table
    for idx in range(8):
        bits = [fr((idx >> (2 - k)) & 1) for k in range(3)]
        assert mle.eq_evaluate_host(r, bits) == host[idx]


def test_bind_and_evaluate_device():
    spec = fr_spec()
    import jolt_tpu.field.device as fd
    n = 8
    z_i = _rand_mle_ints(n)
    z = mle.mle_from_ints(spec, z_i)
    r = [fr(RNG.randrange(spec.p)) for _ in range(3)]
    # bind top variables one at a time
    for rj in r:
        z = mle.bind_top(spec, z, fd.scalar_to_device(spec, rj.v))
    got = FElt(fd.to_int(spec, z[..., 0]), spec)
    want = mle.evaluate_host([fr(x) for x in z_i], r)
    assert got == want
    # evaluate via device eq table
    z2 = mle.mle_from_ints(spec, z_i)
    table = mle.eq_evals_device(spec, [fd.scalar_to_device(spec, x.v) for x in r])
    got2 = FElt(fd.to_int(spec, mle.evaluate_device(spec, z2, table)), spec)
    assert got2 == want
