"""Execute the REAL Solidity verifier sources (evm_verifier/src/) via the
in-repo Solidity-subset interpreter (jolt_tpu/evm/solidity_vm.py) and check
them against frozen fixtures + the Python implementations.

Reference analog: forge tests driven by Rust FFI fixture binaries
(.github/workflows/rust.yml:60-84, jolt-evm-verifier/test/*.sol) — here
the interpreter stands in for solc/forge, which the environment lacks.

These tests are pure host Python (no JAX device work).
"""
import json
import os

import pytest

from jolt_tpu.evm.solidity_vm import SolidityVM, SolidityRevert, load_vm
from jolt_tpu.field import FElt, fr_spec
from jolt_tpu.transcript import Transcript

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


@pytest.fixture(scope="module")
def vm() -> SolidityVM:
    return load_vm()


@pytest.fixture(scope="module")
def spec():
    return fr_spec()


def _sol_transcript(vm: SolidityVM, label: bytes):
    lab32 = label.ljust(32, b"\x00")
    return vm.call("FiatShamirTranscript.newTranscript", lab32)


# ---------------------------------------------------------------------------
# Fr.sol
# ---------------------------------------------------------------------------

def test_fr_ops_match_host_field(vm, spec):
    p = spec.p
    a, b = 0x1234567890ABCDEF1234, p - 5
    fa, fb = vm.fr(a), vm.fr(b)
    add = vm.call("frAdd", fa, fb)
    sub = vm.call("frSub", fa, fb)
    mul = vm.call("frMul", fa, fb)
    assert add.val == (a + b) % p
    assert sub.val == (a - b) % p
    assert mul.val == (a * b) % p
    inv = vm.call("FrLib.invert", fb)
    assert inv.val == pow(b, p - 2, p)
    pw = vm.call("FrLib.pow", fa, 11)
    assert pw.val == pow(a, 11, p)
    assert vm.call("frEq", fa, vm.fr(a)) is True
    assert vm.call("frNeq", fa, fb) is True


# ---------------------------------------------------------------------------
# FiatShamirTranscript.sol vs the frozen state-history fixture
# ---------------------------------------------------------------------------

def test_transcript_replays_frozen_state_history(vm, spec):
    """Drive the .sol transcript through every event of the frozen fixture
    (fixtures/transcript_vectors.json) and demand the exact state chain.
    Same fixture + point conventions as tests/test_transcript.py."""
    from jolt_tpu.curve.bn254 import G1Affine

    with open(os.path.join(FIXDIR, "transcript_vectors.json")) as f:
        fix = json.load(f)
    g = G1Affine.generator()
    g2 = g.to_jacobian().double().to_affine()
    lib = "FiatShamirTranscript."
    t = None
    for ev in fix["events"]:
        kind = ev["kind"]
        if kind == "init":
            t = _sol_transcript(vm, ev["label"].encode())
        elif kind == "message":
            vm.call(lib + "appendBytes32", t,
                    ev["msg"].encode().ljust(32, b"\x00"))
        elif kind == "u64":
            vm.call(lib + "appendU64", t, ev["value"])
        elif kind == "bytes":
            vm.call(lib + "appendBytes", t, bytes.fromhex(ev["data"]))
        elif kind == "scalar":
            vm.call(lib + "appendScalar", t, int(ev["value"]))
        elif kind == "scalars":
            vm.call(lib + "appendVector", t,
                    [int(v) for v in ev["values"]])
        elif kind == "point":
            vm.call(lib + "appendPoint", t, g.x, g.y)
        elif kind == "point_infinity":
            vm.call(lib + "appendPoint", t, 0, 0)
        elif kind == "points":
            vm.call(lib + "appendPoints", t, [g.x, g.y, g2.x, g2.y])
        elif kind == "challenge_scalar":
            c = vm.call(lib + "challengeScalar", t)
            assert c.val == int(ev["value"])
        elif kind == "challenge_vector":
            cs = vm.call(lib + "challengeVector", t, len(ev["values"]))
            assert [c.val for c in cs] == [int(v) for v in ev["values"]]
        elif kind == "challenge_powers":
            cs = vm.call(lib + "challengeScalarPowers", t,
                         len(ev["values"]))
            assert [c.val for c in cs] == [int(v) for v in ev["values"]]
        else:
            raise AssertionError(f"unknown fixture event {kind}")
        assert t["state"].hex() == ev["state"], f"state diverged at {kind}"


def test_transcript_matches_python_live(vm, spec):
    """Scripted event sequence: .sol state chain == transcript.py chain."""
    py = Transcript(b"sol_parity")
    sol = _sol_transcript(vm, b"sol_parity")
    lib = "FiatShamirTranscript."
    py.append_u64(7)
    vm.call(lib + "appendU64", sol, 7)
    py.append_scalar(FElt(123, spec))
    vm.call(lib + "appendScalar", sol, 123)
    py.append_scalars([FElt(5, spec), FElt(6, spec)])
    vm.call(lib + "appendVector", sol, [5, 6])
    c_py = py.challenge_scalar(spec)
    c_sol = vm.call(lib + "challengeScalar", sol)
    assert c_py.v == c_sol.val
    assert sol["state"] == py.state


# ---------------------------------------------------------------------------
# SumcheckVerifier.sol vs the Python sumcheck verifier
# ---------------------------------------------------------------------------

def _sol_sumcheck_proof(vm, compressed_polys):
    """[[c0, c2, ...], ...] (ints) -> SumcheckVerifier.SumcheckProof."""
    rounds = [
        vm.make_struct("SumcheckVerifier.CompressedUniPoly",
                       coeffsExceptLinear=[vm.fr(c) for c in coeffs])
        for coeffs in compressed_polys
    ]
    return vm.make_struct("SumcheckVerifier.SumcheckProof", rounds=rounds)


def test_sumcheck_verifier_accepts_and_rejects(vm, spec):
    """Prove a tiny product sumcheck in Python (host path), verify via the
    EXECUTED SumcheckVerifier.sol, byte-equal challenges; then tamper."""
    from jolt_tpu.poly.unipoly import UniPoly

    # degree-2 polynomial over 3 variables: f(x) = A(x)*B(x) with explicit
    # dense evaluations; prove by direct round-poly computation on host.
    import random
    rng = random.Random(42)
    n = 8
    A = [FElt(rng.randrange(spec.p), spec) for _ in range(n)]
    B = [FElt(rng.randrange(spec.p), spec) for _ in range(n)]
    claim = sum((a * b for a, b in zip(A, B)), FElt(0, spec))

    py_t = Transcript(b"sc_sol")
    rounds_ints = []
    cur_a, cur_b = A[:], B[:]
    e = claim
    for _ in range(3):
        h = len(cur_a) // 2
        lo_a, hi_a = cur_a[:h], cur_a[h:]
        lo_b, hi_b = cur_b[:h], cur_b[h:]
        e0 = sum((a * b for a, b in zip(lo_a, lo_b)), FElt(0, spec))
        e1 = sum((a * b for a, b in zip(hi_a, hi_b)), FElt(0, spec))
        e2 = sum(((h2 + h2 - l2) * (hb + hb - lb)
                  for l2, h2, lb, hb in zip(lo_a, hi_a, lo_b, hi_b)),
                 FElt(0, spec))
        poly = UniPoly.from_evals([e0, e1, e2])
        cpoly = poly.compress()
        cpoly.append_to_transcript(py_t)
        r = py_t.challenge_scalar(spec)
        cur_a = [l + r * (hh - l) for l, hh in zip(lo_a, hi_a)]
        cur_b = [l + r * (hh - l) for l, hh in zip(lo_b, hi_b)]
        e = poly.evaluate(r)
        rounds_ints.append([c.v for c in cpoly.coeffs_except_linear_term])

    sol_t = _sol_transcript(vm, b"sc_sol")
    proof = _sol_sumcheck_proof(vm, rounds_ints)
    final_claim, r_sol = vm.call("SumcheckVerifier.verify", proof,
                                 vm.fr(claim.v), 3, 2, sol_t)
    assert final_claim.val == e.v
    expect = cur_a[0] * cur_b[0]
    assert final_claim.val == expect.v

    # tampered round poly must change the expected final claim
    bad = [list(r) for r in rounds_ints]
    bad[1][0] = (bad[1][0] + 1) % spec.p
    sol_t2 = _sol_transcript(vm, b"sc_sol")
    bad_claim, _ = vm.call("SumcheckVerifier.verify",
                           _sol_sumcheck_proof(vm, bad),
                           vm.fr(claim.v), 3, 2, sol_t2)
    assert bad_claim.val != e.v

    # wrong round count reverts
    with pytest.raises(SolidityRevert):
        vm.call("SumcheckVerifier.verify", _sol_sumcheck_proof(vm, bad[:2]),
                vm.fr(claim.v), 3, 2, _sol_transcript(vm, b"sc_sol"))


# ---------------------------------------------------------------------------
# GrandProductVerifier.sol / HyperKZG.sol / SpartanVerifier.sol against the
# frozen fixtures (fixtures/evm/*.json, regenerate via
# jolt_tpu.evm.fixtures.write_fixtures)
# ---------------------------------------------------------------------------

def _fix(name):
    path = os.path.join(FIXDIR, "evm", f"{name}.json")
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        pytest.skip(f"fixture {path} not generated")
    with open(path) as f:
        return json.load(f)


def _sol_gp_proof(vm, fx):
    layers = []
    for lay in fx["layers"]:
        sc = _sol_sumcheck_proof(vm, [[int(c, 16) for c in r]
                                      for r in lay["sumcheck"]])
        layers.append(vm.make_struct(
            "GrandProductVerifier.LayerProof",
            sumcheck=sc,
            leftClaims=[vm.fr(int(c, 16)) for c in lay["left_claims"]],
            rightClaims=[vm.fr(int(c, 16)) for c in lay["right_claims"]]))
    return vm.make_struct("GrandProductVerifier.GrandProductProof",
                          layers=layers)


def test_grand_product_verifier_fixture(vm, spec):
    fx = _fix("grand_product")
    claims = [vm.fr(int(c, 16)) for c in fx["claims"]]
    t = _sol_transcript(vm, b"test_transcript")
    final_claims, r_gp = vm.call("GrandProductVerifier.verify",
                                 _sol_gp_proof(vm, fx), claims, t)
    assert [x.val for x in r_gp] == \
        [int(v, 16) for v in fx["r_grand_product"]]

    # tamper with a left claim: the layer consistency check must revert
    bad = json.loads(json.dumps(fx))
    bad["layers"][1]["left_claims"][0] = hex(
        (int(bad["layers"][1]["left_claims"][0], 16) + 1) % spec.p)
    t2 = _sol_transcript(vm, b"test_transcript")
    with pytest.raises(SolidityRevert):
        vm.call("GrandProductVerifier.verify", _sol_gp_proof(vm, bad),
                claims, t2)


def _g1p(vm, d):
    return vm.make_struct("HyperKZG.G1Point", x=int(d["x"], 16),
                          y=int(d["y"], 16))


def _g2p(vm, d):
    # fixture stores fq2 as (real, imag); the precompile (and the struct)
    # want imaginary-first
    return vm.make_struct(
        "HyperKZG.G2Point",
        x=[int(d["x"][1], 16), int(d["x"][0], 16)],
        y=[int(d["y"][1], 16), int(d["y"][0], 16)])


def test_hyperkzg_verifier_fixture(vm, spec):
    fx = _fix("hyperkzg")
    vk = vm.make_struct("HyperKZG.VerifierKey",
                        g1=_g1p(vm, fx["vk"]["g1"]),
                        g2=_g2p(vm, fx["vk"]["g2"]),
                        betaG2=_g2p(vm, fx["vk"]["beta_g2"]))
    vrows = fx["proof"]["v"]
    proof = vm.make_struct(
        "HyperKZG.HyperKZGProof",
        com=[_g1p(vm, p) for p in fx["proof"]["com"]],
        w=[_g1p(vm, p) for p in fx["proof"]["w"]],
        v=[vm.fr(int(x, 16)) for row in vrows for x in row])
    point = [vm.fr(int(x, 16)) for x in fx["point"]]
    t = _sol_transcript(vm, b"test_transcript")
    vm.call("HyperKZG.verify", proof, vk, t, point,
            vm.fr(int(fx["opening"], 16)), _g1p(vm, fx["commitment"]))

    # wrong opening must fail (fold consistency or pairing)
    t2 = _sol_transcript(vm, b"test_transcript")
    with pytest.raises(SolidityRevert):
        vm.call("HyperKZG.verify", proof, vk, t2, point,
                vm.fr((int(fx["opening"], 16) + 1) % spec.p),
                _g1p(vm, fx["commitment"]))


def test_spartan_verifier_fixture(vm, spec):
    fx = _fix("spartan")
    outer = _sol_sumcheck_proof(vm, [[int(c, 16) for c in r]
                                     for r in fx["outer_sumcheck"]])
    inner = _sol_sumcheck_proof(vm, [[int(c, 16) for c in r]
                                     for r in fx["inner_sumcheck"]])
    az, bz, cz = (vm.fr(int(c, 16)) for c in fx["outer_claims"])
    proof = vm.make_struct(
        "SpartanVerifier.SpartanProof",
        outer=outer, outerClaimAz=az, outerClaimBz=bz, outerClaimCz=cz,
        inner=inner,
        claimedWitnessEvals=[vm.fr(int(c, 16))
                             for c in fx["claimed_witness_evals"]])
    t = _sol_transcript(vm, b"test_transcript")
    opening_point = vm.call("SpartanVerifier.verifySpartan", proof,
                            fx["steps_bits"], t)
    assert len(opening_point) == fx["steps_bits"]

    # tampered witness eval: inner claim check must revert
    bad_evals = [vm.fr(int(c, 16))
                 for c in fx["claimed_witness_evals"]]
    bad_evals[3] = vm.fr((bad_evals[3].val + 1) % spec.p)
    bad = vm.make_struct(
        "SpartanVerifier.SpartanProof",
        outer=outer, outerClaimAz=az, outerClaimBz=bz, outerClaimCz=cz,
        inner=inner, claimedWitnessEvals=bad_evals)
    with pytest.raises(SolidityRevert):
        vm.call("SpartanVerifier.verifySpartan", bad, fx["steps_bits"],
                _sol_transcript(vm, b"test_transcript"))
