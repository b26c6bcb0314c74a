"""ELF ingestion end-to-end: encode → write ELF bytes → decode_elf →
trace → prove (the reference's actual ingestion path: ELF in,
tracer/src/lib.rs:73-118; host/mod.rs:168-175)."""
import pytest

from jolt_tpu.tracer.elf import decode_elf, decode_word
from jolt_tpu.tracer.elf_write import encode_word, write_elf
from jolt_tpu.vm.guests import (collatz_expected, collatz_program,
                                sha2_chain_expected, sha2_chain_program)
from jolt_tpu.vm.host import fibonacci_program, trace_program
from jolt_tpu.vm.rv_trace import RAM_START_ADDRESS


def _norm(ins):
    return (ins.address, ins.opcode, ins.rd or 0, ins.rs1 or 0,
            ins.rs2 or 0, ins.imm or 0)


@pytest.mark.parametrize("program", [
    fibonacci_program(8),
    collatz_program(6),
    sha2_chain_program(1),
], ids=["fib", "collatz", "sha2-chain"])
def test_encode_decode_roundtrip(program):
    """encode_word is decode_word⁻¹ over every guest instruction."""
    for ins in program:
        word = encode_word(ins)
        back = decode_word(word, ins.address)
        assert _norm(back) == _norm(ins), f"{ins} -> {word:#010x} -> {back}"


def test_write_elf_decode_elf_roundtrip(tmp_path):
    program = sha2_chain_program(1)
    path = str(tmp_path / "sha2.elf")
    data = bytes(range(16))
    write_elf(path, program, data=data, data_addr=0x90000000)
    instructions, memory_init, entry = decode_elf(path)
    assert entry == RAM_START_ADDRESS
    assert [_norm(i) for i in instructions] == [_norm(i) for i in program]
    assert memory_init == [(0x90000000 + i, b) for i, b in enumerate(data)]


def test_elf_trace_prove_e2e(tmp_path):
    """Full pipeline from ELF BYTES: write fib.elf, decode it, trace the
    decoded instructions, prove+verify on the production rv32i VM.  Same
    kernel shapes as test_rv32i_fib_e2e_mock, so the compile cost is
    shared."""
    from jolt_tpu.commitment import MockCommitmentScheme
    from jolt_tpu.field import fr_spec
    from jolt_tpu.vm.rv32i_vm import rv32i_vm

    path = str(tmp_path / "fib.elf")
    write_elf(path, fibonacci_program(8))
    instructions, memory_init, entry = decode_elf(path)
    assert entry == RAM_START_ADDRESS and not memory_init

    spec = fr_spec()
    vm = rv32i_vm(spec)
    steps, device, bytecode_rows = trace_program(instructions, vm)
    pcs = MockCommitmentScheme(spec)
    pre = vm.preprocess(bytecode_rows, pcs)
    proof, commitments, pt, pacc = vm.prove(device, steps, pre)
    vm.verify(pre, proof, commitments, debug_transcript=pt,
              debug_accumulator=pacc)
    assert proof.trace_length > 8
