"""Full RV32I VM end-to-end: prove + verify real guest programs on the
production instruction set (29 instructions, 26 subtables, C=4, M=2^16).

Mirrors fib_e2e_mock / sha3_e2e_mock (rv32i_vm.rs:287-447) — Mock PCS
isolates proof-system correctness from PCS cost; the HyperKZG e2e variant
lives in test_jolt_e2e.py territory and the CLI.
"""
import pytest

from jolt_tpu.commitment import MockCommitmentScheme
from jolt_tpu.field import fr_spec
from jolt_tpu.vm.host import fibonacci_program, trace_program
from jolt_tpu.vm.rv32i_vm import rv32i_vm


def _prove_verify(program, inputs=b""):
    spec = fr_spec()
    vm = rv32i_vm(spec)
    steps, device, bytecode_rows = trace_program(program, vm, inputs=inputs)
    pcs = MockCommitmentScheme(spec)
    pre = vm.preprocess(bytecode_rows, pcs)
    proof, commitments, pt, pacc = vm.prove(device, steps, pre)
    vm.verify(pre, proof, commitments, debug_transcript=pt,
              debug_accumulator=pacc)
    return proof, device


def test_rv32i_fib_e2e_mock():
    proof, _ = _prove_verify(fibonacci_program(8))
    assert proof.trace_length > 8


def test_rv32i_muldiv_e2e_mock():
    """M-extension ops end-to-end (virtual sequence expansion in the trace).

    Mirrors examples/muldiv (guest computes a*b/c)."""
    from jolt_tpu.vm.host import Assembler
    from jolt_tpu.vm.rv_trace import RV32IM
    asm = Assembler()
    asm.addi(1, 0, 123)
    asm.addi(2, 0, 45)
    asm.addi(3, 0, 7)
    asm.emit(RV32IM.MUL, rd=4, rs1=1, rs2=2)    # 5535
    asm.emit(RV32IM.DIVU, rd=5, rs1=4, rs2=3)   # 790
    asm.emit(RV32IM.REMU, rd=6, rs1=4, rs2=3)   # 5
    asm.emit(RV32IM.DIV, rd=7, rs1=4, rs2=3)
    asm.emit(RV32IM.REM, rd=8, rs1=4, rs2=3)
    asm.emit(RV32IM.MULH, rd=9, rs1=4, rs2=2)
    asm.label("halt")
    asm.jal(0, "halt")
    proof, _ = _prove_verify(asm.finish())
    assert proof.trace_length > 6


@pytest.mark.slow
def test_rv32i_sha2_chain_e2e_mock():
    """The headline workload, 1 chain iteration (~4k-step trace)."""
    from jolt_tpu.vm.guests import sha2_chain_expected, sha2_chain_program
    inputs = b"\x05" * 32
    proof, device = _prove_verify(sha2_chain_program(1), inputs=inputs)
    assert bytes(device.outputs)[:32] == sha2_chain_expected(inputs, 1)
    assert proof.trace_length > 3000


@pytest.mark.slow
def test_rv32i_fib_e2e_hyperkzg():
    """Full production VM with the production PCS (rv32i_vm.rs:228
    RV32IJoltProof<Fr, HyperKZG<Bn254>>): every witness column is REALLY
    committed (bitplane MSMs over a 2^16 SRS — final_cts lives at M) and
    the reduced opening proof runs the real pairing check."""
    from jolt_tpu.commitment.hyperkzg import HyperKZG
    spec = fr_spec()
    vm = rv32i_vm(spec)
    steps, device, bytecode_rows = trace_program(fibonacci_program(8), vm)
    n = vm.required_srs_len(device, steps, bytecode_rows)
    assert n >= vm.M
    pcs = HyperKZG.setup(n)
    pre = vm.preprocess(bytecode_rows, pcs)
    proof, commitments, pt, pacc = vm.prove(device, steps, pre)
    vm.verify(pre, proof, commitments, debug_transcript=pt,
              debug_accumulator=pacc)
