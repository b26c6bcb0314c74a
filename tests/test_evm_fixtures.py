"""EVM fixture generators (jolt-evm-verifier script/src/bin/* analogs):
fixtures round-trip through the Python verifier.
"""
import json

from jolt_tpu.evm.fixtures import grand_product_fixture, transcript_fixture
from jolt_tpu.field import FElt, fr_spec
from jolt_tpu.subprotocols.grand_product import (
    BatchedGrandProductLayerProof, BatchedGrandProductProof,
    verify_grand_product)
from jolt_tpu.poly.unipoly import CompressedUniPoly
from jolt_tpu.subprotocols.sumcheck import SumcheckInstanceProof
from jolt_tpu.transcript import Transcript


def test_transcript_fixture_replay():
    fx = transcript_fixture()
    t = Transcript(fx["label"].encode())
    t.append_u64(42)
    t.append_scalar(FElt(123456789, fr_spec()))
    t.append_scalars([FElt(1, fr_spec()), FElt(2, fr_spec()),
                      FElt(3, fr_spec())])
    c1 = t.challenge_scalar()
    assert hex(c1.v) == fx["events"][3]["expected"]
    cv = t.challenge_vector(4)
    assert [hex(c.v) for c in cv] == fx["events"][4]["expected"]
    assert [s.hex() for s in t.state_history] == fx["state_history"]


def test_grand_product_fixture_verifies():
    spec = fr_spec()
    fx = grand_product_fixture(nv=4, batch=2)
    claims = [FElt(int(c, 16), spec) for c in fx["claims"]]
    layers = []
    for ld in fx["layers"]:
        polys = [CompressedUniPoly([FElt(int(c, 16), spec) for c in coeffs])
                 for coeffs in ld["sumcheck"]]
        layers.append(BatchedGrandProductLayerProof(
            SumcheckInstanceProof(polys),
            [FElt(int(c, 16), spec) for c in ld["left_claims"]],
            [FElt(int(c, 16), spec) for c in ld["right_claims"]]))
    proof = BatchedGrandProductProof(layers)
    t = Transcript(b"test_transcript")
    verify_grand_product(proof, claims, t)
    # serializable to JSON (what the forge harness would load)
    json.dumps(fx)


import pytest


@pytest.mark.slow
def test_spartan_fixture_verifies():
    """Spartan fixture generator self-checks against spartan_verify
    (the Solidity SpartanVerifier consumes the same structure).  Slow:
    two full VM proves (capture + standalone)."""
    from jolt_tpu.evm.fixtures import spartan_fixture
    fx = spartan_fixture(n=4)
    assert fx["steps_bits"] >= 1
    assert len(fx["outer_sumcheck"]) == 7 + fx["steps_bits"]  # CONSTR_BITS=7
    assert len(fx["inner_sumcheck"]) == 8 + fx["steps_bits"]  # VAR_BITS+1=8
    assert len(fx["claimed_witness_evals"]) == 87
    json.dumps(fx)
