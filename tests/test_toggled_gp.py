"""Toggled (flag-gated) grand product roundtrip (grand_product.rs:1547-1754)."""
import random

from jolt_tpu.field import FElt, fr, fr_spec
from jolt_tpu.field import device as fd
from jolt_tpu.poly import mle
from jolt_tpu.subprotocols.grand_product import (ToggledBatchedGrandProduct,
                                                 toggled_verify_sumcheck_claim,
                                                 verify_grand_product)
from jolt_tpu.transcript import Transcript

RNG = random.Random(55)


def test_toggled_grand_product_roundtrip():
    spec = fr_spec()
    m, T = 2, 8
    flag_bits = [[RNG.randrange(2) for _ in range(T)] for _ in range(m)]
    fp_ints = [[RNG.randrange(spec.p) for _ in range(T)] for _ in range(2 * m)]
    flags = fd.ints_to_device(spec, flag_bits)
    fps = fd.ints_to_device(spec, fp_ints)

    gp = ToggledBatchedGrandProduct(flags, fps, spec)
    claims = gp.claims()
    for b in range(2 * m):
        prod = 1
        for i in range(T):
            f = flag_bits[b // 2][i]
            prod = prod * ((f * fp_ints[b][i] + 1 - f) % spec.p) % spec.p
        assert claims[b] == fr(prod), b

    pt = Transcript(b"tgp")
    proof, r_prover = gp.prove(pt)
    assert len(proof.layers) == 4  # log2(8) dense + 1 toggle

    vt = Transcript(b"tgp")
    vt.compare_to(pt)
    final_claims, r_verify = verify_grand_product(
        proof, claims, vt, verify_sumcheck_claim=toggled_verify_sumcheck_claim)
    assert [x.v for x in r_verify] == [x.v for x in r_prover]

    # final claims = flag_mle(r) * fp_mle(r) + 1 - flag_mle(r)
    one = fr(1)
    for b in range(2 * m):
        f_ev = mle.evaluate_host([fr(v) for v in flag_bits[b // 2]], r_verify)
        p_ev = mle.evaluate_host([fr(v) for v in fp_ints[b]], r_verify)
        assert final_claims[b] == f_ev * p_ev + one - f_ev, b


def test_toggled_device_fiat_shamir_parity(monkeypatch):
    """Toggle-layer device Fiat-Shamir matches the host transcript."""
    import random as _random
    from jolt_tpu.field import device as fd, fr_spec
    from jolt_tpu.subprotocols.grand_product import ToggledBatchedGrandProduct
    from jolt_tpu.transcript import Transcript
    rng = _random.Random(11)
    spec = fr_spec()
    m, T = 2, 8
    flags_ints = [[rng.randrange(2) for _ in range(T)] for _ in range(m)]
    fp_ints = [[rng.randrange(spec.p) for _ in range(T)]
               for _ in range(2 * m)]
    flags = fd.ints_to_device(spec, flags_ints)
    fps = fd.ints_to_device(spec, fp_ints)

    monkeypatch.setenv("JOLT_TPU_DEVICE_FS", "1")
    gp = ToggledBatchedGrandProduct(flags, fps, spec)
    t_dev = Transcript(b"tg")
    proof_dev, r_dev = gp.prove(t_dev)

    monkeypatch.setenv("JOLT_TPU_DEVICE_FS", "0")
    gp2 = ToggledBatchedGrandProduct(flags, fps, spec)
    t_host = Transcript(b"tg")
    proof_host, r_host = gp2.prove(t_host)

    assert t_dev.state_history == t_host.state_history
    assert [x.v for x in r_dev] == [x.v for x in r_host]
