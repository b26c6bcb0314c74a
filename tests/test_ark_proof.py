"""arkworks CanonicalSerialize layout for full Jolt proofs
(utils/ark_proof.py vs rv32i_vm.rs:193-235 JoltHyperKZGProof).

The byte layout is pinned structurally: serialize a real mini-VM
fib proof + commitments, parse the bytes back with the independent
structure reader, and cross-check every field against the live proof
objects.  A frozen fixture (fixtures/ark/fib_mini.bin) guards against
layout drift across rounds.
"""
import os

import pytest

from jolt_tpu.field import fr_spec
from jolt_tpu.instructions import AddInstruction, BneInstruction
from jolt_tpu.subtables.rv32i import (EqSubtable, IdentitySubtable,
                                      TruncateOverflowSubtable)
from jolt_tpu.vm.host import fibonacci_program, trace_program
from jolt_tpu.vm.rv32i_vm import mini_vm

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "ark")


def _mini_proof():
    from jolt_tpu.commitment.hyperkzg import HyperKZG
    spec = fr_spec()
    vm = mini_vm([AddInstruction, BneInstruction],
                 [TruncateOverflowSubtable(32), IdentitySubtable(),
                  EqSubtable()],
                 M_mini=1 << 8, spec=spec)
    program = fibonacci_program(3)
    steps, device, bytecode_rows = trace_program(
        program, vm, max_input_size=32, max_output_size=32)
    pcs = HyperKZG.setup(1 << 8)
    pre = vm.preprocess(bytecode_rows, pcs)
    proof, commitments, _, _ = vm.prove(device, steps, pre)
    return vm, pre, proof, commitments


@pytest.fixture(scope="module")
def mini_proof():
    return _mini_proof()


def _serialize(vm, pre, proof, commitments) -> bytes:
    from jolt_tpu.utils.ark_proof import serialize_jolt_hyperkzg_proof
    il = pre.instruction_lookups
    lay = vm.commit_layout(il.num_memories)
    return serialize_jolt_hyperkzg_proof(
        proof, commitments["read_write"], commitments["init_final"], lay,
        il.C, il.num_memories, il.num_instructions)


def test_ark_proof_roundtrip_structure(mini_proof):
    vm, pre, proof, commitments = mini_proof
    from jolt_tpu.utils.ark_proof import deserialize_jolt_proof_structure
    il = pre.instruction_lookups
    blob = _serialize(vm, pre, proof, commitments)

    s = deserialize_jolt_proof_structure(blob, il.C, il.num_memories,
                                         il.num_instructions)
    assert s["trace_length"] == proof.trace_length
    assert s["outputs"] == bytes(proof.program_io.outputs)
    assert s["panic"] == proof.program_io.panic
    ml = proof.program_io.memory_layout
    assert s["memory_layout"][0] == ml.ram_witness_offset

    # multiset hashes survive byte-exactly
    bh = proof.bytecode.multiset_hashes
    assert s["bytecode"]["hashes"][0] == [x.v for x in bh.read_hashes]
    assert s["bytecode"]["hashes"][3] == [x.v for x in bh.final_hashes]

    # GP layer counts + a sumcheck coefficient (deep field)
    rw_gp = proof.bytecode.read_write_grand_product
    assert len(s["bytecode"]["rw_gp"]) == len(rw_gp.layers)
    lay0 = rw_gp.layers[-1]
    got_last = s["bytecode"]["rw_gp"][-1]
    assert got_last[1] == [x.v for x in lay0.left_claims]
    assert got_last[0] == [[c.v for c in cp.coeffs_except_linear_term]
                           for cp in lay0.proof.compressed_polys]

    # timestamp validity openings are ACTIVE in the fork — real values
    ts = proof.read_write_memory.timestamp_validity_proof
    assert s["ts"]["openings"] == [x.v for x in ts.openings]
    assert s["ts"]["exogenous"] == [x.v for x in ts.exogenous_openings]

    # primary sumcheck openings
    ps = proof.instruction_lookups.primary_sumcheck
    assert s["primary"]["num_rounds"] == ps.num_rounds
    assert s["primary"]["E"] == [x.v for x in ps.openings.E_poly_openings]
    assert s["primary"]["out"] == ps.openings.lookup_outputs_opening.v

    # spartan
    sp = proof.r1cs
    assert s["spartan"]["claims"] == tuple(
        c.v for c in sp.outer_sumcheck_claims)
    assert s["spartan"]["witness_evals"] == \
        [x.v for x in sp.claimed_witness_evals]

    # reduced opening proof + HyperKZG payload
    ro = proof.opening_proof
    assert s["reduced"]["claims"] == [x.v for x in ro.sumcheck_claims]
    com, w, v = s["reduced"]["hyperkzg"]
    assert [(p.x, p.y) for p in com] == \
        [(p.x, p.y) for p in ro.joint_opening_proof.com]
    assert [(p.x, p.y) for p in w] == \
        [(p.x, p.y) for p in ro.joint_opening_proof.w]
    assert v == [[x.v for x in row] for row in ro.joint_opening_proof.v]

    # commitments section: proof bytes end exactly where JoltStuff begins,
    # and the first commitment is bc_a_read_write
    proof_end = s["_proof_end"]
    from jolt_tpu.utils.ark_serialize import g1_from_compressed
    first = g1_from_compressed(blob[proof_end:proof_end + 32])
    bc0 = commitments["read_write"][0].point
    assert (first.x, first.y) == (bc0.x, bc0.y)


def test_ark_proof_frozen_fixture(mini_proof):
    """Freeze the exact bytes: any layout change across rounds (field
    order, length prefixes, flag bits) breaks this test loudly.  The
    prover is deterministic (fixed SRS seed + transcript), so bytes are
    reproducible."""
    vm, pre, proof, commitments = mini_proof
    blob = _serialize(vm, pre, proof, commitments)
    os.makedirs(FIXDIR, exist_ok=True)
    path = os.path.join(FIXDIR, "fib_mini.bin")
    if not os.path.exists(path):
        with open(path, "wb") as f:
            f.write(blob)
        pytest.skip("fixture generated; rerun to compare")
    with open(path, "rb") as f:
        want = f.read()
    assert blob == want, \
        "ark proof bytes drifted from the frozen fixture"
