"""Fixture generators for the Solidity verifier (evm_verifier/).

Reference: jolt-evm-verifier/script/src/bin/{transcript,grand_product,
hyperkzg,hyperkzg_batch}_example.rs — Rust binaries that emit proof/
transcript fixtures consumed by forge tests.  Here the generators are
Python (JSON output); the Solidity mirrors consume the same structures.
Without a Solidity toolchain in this environment, the fixtures are
cross-checked against the Python verifier instead (tests/test_evm_fixtures.py).
"""
from __future__ import annotations

import json

from ..field import FElt, fr_spec
from ..transcript import Transcript


def transcript_fixture() -> dict:
    """Deterministic transcript event sequence + expected states/challenges
    (transcript_example.rs analog)."""
    spec = fr_spec()
    t = Transcript(b"test_transcript")
    events = []
    t.append_u64(42)
    events.append({"op": "append_u64", "value": 42})
    t.append_scalar(FElt(123456789, spec))
    events.append({"op": "append_scalar", "value": hex(123456789)})
    t.append_scalars([FElt(1, spec), FElt(2, spec), FElt(3, spec)])
    events.append({"op": "append_scalars", "values": ["0x1", "0x2", "0x3"]})
    c1 = t.challenge_scalar()
    events.append({"op": "challenge_scalar", "expected": hex(c1.v)})
    cv = t.challenge_vector(4)
    events.append({"op": "challenge_vector",
                   "expected": [hex(c.v) for c in cv]})
    return {
        "label": "test_transcript",
        "events": events,
        "state_history": [s.hex() for s in t.state_history],
    }


def grand_product_fixture(nv: int = 5, batch: int = 2, seed: int = 9) -> dict:
    """A batched GKR grand product proof + claims (grand_product_example.rs
    analog)."""
    import numpy as np
    import jax.numpy as jnp
    from ..field import device as fd
    from ..subprotocols.grand_product import BatchedDenseGrandProduct

    spec = fr_spec()
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, 1 << 63, size=(batch, 1 << nv), dtype=np.uint64)
    leaves = fd.to_mont_device(spec, jnp.asarray(fd.pack_u64(vals)))
    gp = BatchedDenseGrandProduct.construct(leaves, spec)
    claims = gp.claims()
    t = Transcript(b"test_transcript")
    proof, r = gp.prove(t)
    return {
        "claims": [hex(c.v) for c in claims],
        "layers": [{
            "sumcheck": [[hex(c.v) for c in p.coeffs_except_linear_term]
                         for p in layer.proof.compressed_polys],
            "left_claims": [hex(c.v) for c in layer.left_claims],
            "right_claims": [hex(c.v) for c in layer.right_claims],
        } for layer in proof.layers],
        "r_grand_product": [hex(x.v) for x in r],
    }


def hyperkzg_fixture(ell: int = 4, seed: int = 7) -> dict:
    """A HyperKZG commit/open/verify instance (hyperkzg_example.rs analog)."""
    import numpy as np
    import jax.numpy as jnp
    from ..commitment.hyperkzg import HyperKZG
    from ..field import device as fd
    from ..poly.mle import eq_evals_host, evaluate_host, mle_to_felts

    spec = fr_spec()
    rng = np.random.default_rng(seed)
    n = 1 << ell
    pcs = HyperKZG.setup(n)
    poly = fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=n, dtype=np.uint64))))
    point = [FElt(int(rng.integers(1, 1 << 62)), spec) for _ in range(ell)]
    evals = mle_to_felts(spec, poly)
    opening = evaluate_host(list(evals), point)

    t = Transcript(b"test_transcript")
    proof = pcs.prove(poly, point, t)
    commitment = pcs.commit(poly)

    def pt(p):
        return {"x": hex(p.x), "y": hex(p.y)} if not p.is_infinity \
            else {"x": "0x0", "y": "0x0"}

    return {
        "vk": {"g1": pt(pcs.vk.g1),
               "g2": {"x": [hex(c) for c in pcs.vk.g2.x],
                      "y": [hex(c) for c in pcs.vk.g2.y]},
               "beta_g2": {"x": [hex(c) for c in pcs.vk.beta_g2.x],
                           "y": [hex(c) for c in pcs.vk.beta_g2.y]}},
        "commitment": pt(commitment.point),
        "point": [hex(x.v) for x in point],
        "opening": hex(opening.v),
        "proof": {"com": [pt(p) for p in proof.com],
                  "w": [pt(p) for p in proof.w],
                  "v": [[hex(x.v) for x in row] for row in proof.v]},
    }


def spartan_fixture(n: int = 4) -> dict:
    """A standalone uniform-Spartan proof over a real fibonacci trace
    (autogenerate_r1cs.rs / SpartanVerifier.t.sol analog).

    Captures the R1CS instance from a tiny fib prove, then re-proves the
    Spartan part against a FRESH `test_transcript` so the Solidity
    SpartanVerifier can replay it self-contained.  Cross-checked against
    the Python spartan_verify before emission."""
    from ..poly.opening_proof import ProverOpeningAccumulator
    from ..vm import host as vm_host
    from ..vm import r1cs as r1cs_mod
    from ..vm.rv32i_vm import rv32i_vm
    from ..vm.rv_trace import JoltDevice
    from ..utils.math import log2_strict

    spec = fr_spec()
    vm = rv32i_vm(spec)
    program = vm_host.fibonacci_program(n)
    steps, device, bytecode_rows = vm_host.trace_program(program, vm)
    from ..commitment import MockCommitmentScheme
    pcs = MockCommitmentScheme(spec)
    pre = vm.preprocess(bytecode_rows, pcs)

    captured = {}
    original = r1cs_mod.spartan_prove

    def capture(builder, non_uniform, key, polys, T, acc, transcript, sp,
                mesh=None):
        captured.update(builder=builder, non_uniform=non_uniform, key=key,
                        polys=polys, T=T)
        return original(builder, non_uniform, key, polys, T, acc,
                        transcript, sp, mesh=mesh)

    r1cs_mod.spartan_prove = capture
    try:
        vm.prove(device, steps, pre)
    finally:
        r1cs_mod.spartan_prove = original

    t = Transcript(b"test_transcript")
    acc = ProverOpeningAccumulator(spec)
    proof = original(captured["builder"], captured["non_uniform"],
                     captured["key"], captured["polys"], captured["T"],
                     acc, t, spec)

    # cross-check with the Python verifier (fresh transcript, no PCS)
    from ..poly.opening_proof import VerifierOpeningAccumulator
    vt = Transcript(b"test_transcript")
    vt.compare_to(t)
    r1cs_mod.spartan_verify(proof, captured["key"], None,
                            VerifierOpeningAccumulator(pcs, spec), vt, spec)

    sp = lambda cp: [hex(c.v) for c in cp.coeffs_except_linear_term]
    return {
        "steps_bits": log2_strict(captured["T"]),
        "outer_sumcheck": [sp(p) for p in
                           proof.outer_sumcheck_proof.compressed_polys],
        "outer_claims": [hex(c.v) for c in proof.outer_sumcheck_claims],
        "inner_sumcheck": [sp(p) for p in
                           proof.inner_sumcheck_proof.compressed_polys],
        "claimed_witness_evals": [hex(c.v)
                                  for c in proof.claimed_witness_evals],
    }


def write_fixtures(out_dir: str) -> None:
    import os
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in (("transcript", transcript_fixture),
                     ("grand_product", grand_product_fixture),
                     ("hyperkzg", hyperkzg_fixture),
                     ("spartan", spartan_fixture)):
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(fn(), f, indent=1)
