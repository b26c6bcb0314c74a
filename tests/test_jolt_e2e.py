"""Milestone B: full Jolt zkVM e2e — fibonacci proved and verified.

Mirrors fib_e2e_mock (rv32i_vm.rs:308-311): a mini-instruction-set VM keeps
the fused primary-sumcheck kernel small for CI; the full RV32I VM uses the
identical code paths.
"""
from jolt_tpu.commitment import MockCommitmentScheme
from jolt_tpu.field import fr_spec
from jolt_tpu.instructions import AddInstruction, BneInstruction
from jolt_tpu.subtables.rv32i import (EqSubtable, IdentitySubtable,
                                      TruncateOverflowSubtable)
from jolt_tpu.vm.host import fibonacci_program, trace_program
from jolt_tpu.vm.rv32i_vm import mini_vm


def test_fibonacci_e2e_mock():
    spec = fr_spec()
    vm = mini_vm([AddInstruction, BneInstruction],
                 [TruncateOverflowSubtable(32), IdentitySubtable(),
                  EqSubtable()],
                 M_mini=1 << 8, spec=spec)
    program = fibonacci_program(3)
    steps, device, bytecode_rows = trace_program(
        program, vm, max_input_size=32, max_output_size=32)
    assert len(steps) >= 10

    pcs = MockCommitmentScheme(spec)
    pre = vm.preprocess(bytecode_rows, pcs)
    proof, commitments, prover_transcript, prover_acc = vm.prove(
        device, steps, pre)

    vm.verify(pre, proof, commitments, debug_transcript=prover_transcript,
              debug_accumulator=prover_acc)


def test_fibonacci_e2e_reference_parity_mode(monkeypatch):
    """e2e prove+verify green under JOLT_REFERENCE_PARITY=1 (the
    ark-serialize+SHA3 vk_digest mode, key.rs:397-428): the digest flows
    through the Fiat-Shamir preamble consistently on both sides."""
    monkeypatch.setenv("JOLT_REFERENCE_PARITY", "1")
    spec = fr_spec()
    vm = mini_vm([AddInstruction, BneInstruction],
                 [TruncateOverflowSubtable(32), IdentitySubtable(),
                  EqSubtable()],
                 M_mini=1 << 8, spec=spec)
    steps, device, bytecode_rows = trace_program(
        fibonacci_program(3), vm, max_input_size=32, max_output_size=32)
    pcs = MockCommitmentScheme(spec)
    pre = vm.preprocess(bytecode_rows, pcs)
    proof, commitments, pt, pacc = vm.prove(device, steps, pre)
    vm.verify(pre, proof, commitments, debug_transcript=pt,
              debug_accumulator=pacc)


def test_fibonacci_e2e_hyperkzg_serialization_roundtrip():
    """fib_e2e_hyperkzg analog + Serializable save/load parity
    (rv32i_vm.rs:193-235): serialize proof+commitments, deserialize, verify."""
    import pytest
    pytest.importorskip("jax")
    from jolt_tpu.commitment.hyperkzg import HyperKZG
    from jolt_tpu.utils.serialization import (
        deserialize_jolt_proof_with_commitments,
        serialize_jolt_proof_with_commitments)

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

    blob = serialize_jolt_proof_with_commitments(proof, commitments)
    proof2, commitments2 = deserialize_jolt_proof_with_commitments(blob)
    assert proof2.trace_length == proof.trace_length
    assert bytes(proof2.program_io.outputs) == bytes(proof.program_io.outputs)
    vm.verify(pre, proof2, commitments2)


def test_fibonacci_e2e_device_fiat_shamir_parity(monkeypatch):
    """Full VM prove with the Fiat-Shamir chain on device produces a
    transcript byte-identical to the host path (covers the GKR layers,
    toggle layer, and the primary/spartan sumchecks in one sweep)."""
    spec = fr_spec()

    def run():
        vm = mini_vm([AddInstruction, BneInstruction],
                     [TruncateOverflowSubtable(32), IdentitySubtable(),
                      EqSubtable()],
                     M_mini=1 << 8, spec=spec)
        program = fibonacci_program(3)
        steps, device, bytecode_rows = trace_program(
            program, vm, max_input_size=32, max_output_size=32)
        pre = vm.preprocess(bytecode_rows, MockCommitmentScheme(spec))
        proof, commitments, pt, _ = vm.prove(device, steps, pre)
        vm.verify(pre, proof, commitments)
        return pt.state_history

    monkeypatch.setenv("JOLT_TPU_DEVICE_FS", "1")
    hist_dev = run()
    monkeypatch.setenv("JOLT_TPU_DEVICE_FS", "0")
    hist_host = run()
    assert hist_dev == hist_host
