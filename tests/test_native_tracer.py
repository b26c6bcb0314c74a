"""Native (C++) tracer vs the Python emulator oracle: row-for-row equality.

Reference semantics: tracer/src/emulator/cpu.rs + lib.rs:48-60 termination.
"""
import numpy as np
import pytest

from jolt_tpu.native import trace_native
from jolt_tpu.tracer.emulator import Emulator
from jolt_tpu.vm.host import Assembler, fibonacci_program
from jolt_tpu.vm.rv_trace import JoltDevice, RV32IM


def _run_both(program, inputs=b""):
    dev_py = JoltDevice.new()
    dev_py.inputs.extend(inputs)
    rows_py = Emulator(program, dev_py).run()
    dev_c = JoltDevice.new()
    dev_c.inputs.extend(inputs)
    rows_c = trace_native(program, dev_c)
    return rows_py, dev_py, rows_c, dev_c


def _assert_rows_equal(rows_py, rows_c):
    assert len(rows_py) == len(rows_c)
    for a, b in zip(rows_py, rows_c):
        assert a.instruction is b.instruction
        assert a.register_state.rs1_val == b.register_state.rs1_val
        assert a.register_state.rs2_val == b.register_state.rs2_val
        assert a.register_state.rd_post_val == b.register_state.rd_post_val
        if a.memory_state is None:
            assert b.memory_state is None
        else:
            assert a.memory_state.is_write == b.memory_state.is_write
            assert a.memory_state.address == b.memory_state.address
            assert a.memory_state.value == b.memory_state.value


def test_native_tracer_fibonacci():
    rows_py, _, rows_c, _ = _run_both(fibonacci_program(12))
    assert len(rows_py) > 40
    _assert_rows_equal(rows_py, rows_c)


def test_native_tracer_randomized_alu_mem():
    """Random straight-line ALU/shift/mul/div ops + word stores/loads."""
    rng = np.random.default_rng(0x5EED)
    asm = Assembler()
    # seed registers with random values via LUI/ADDI pairs
    for r in range(1, 12):
        v = int(rng.integers(0, 1 << 32))
        asm.emit(RV32IM.LUI, rd=r, imm=(v & 0xFFFFF000))
        asm.emit(RV32IM.ADDI, rd=r, rs1=r, imm=(v & 0xFFF))
    ops = [RV32IM.ADD, RV32IM.SUB, RV32IM.XOR, RV32IM.OR, RV32IM.AND,
           RV32IM.SLL, RV32IM.SRL, RV32IM.SRA, RV32IM.SLT, RV32IM.SLTU,
           RV32IM.MUL, RV32IM.MULH, RV32IM.MULHU, RV32IM.MULHSU,
           RV32IM.DIV, RV32IM.DIVU, RV32IM.REM, RV32IM.REMU]
    for _ in range(300):
        op = ops[int(rng.integers(len(ops)))]
        rd = int(rng.integers(1, 12))
        rs1 = int(rng.integers(1, 12))
        rs2 = int(rng.integers(1, 12))
        asm.emit(op, rd=rd, rs1=rs1, rs2=rs2)
    # memory traffic: scratch area above the code
    base = asm.base + 0x10000
    asm.emit(RV32IM.LUI, rd=12, imm=base & 0xFFFFF000)
    asm.emit(RV32IM.ADDI, rd=12, rs1=12, imm=base & 0xFFF)
    for k in range(16):
        asm.sw(12, int(rng.integers(1, 12)), 4 * k)
        asm.emit(RV32IM.SB, rs1=12, rs2=int(rng.integers(1, 12)), imm=64 + k)
        asm.emit(RV32IM.SH, rs1=12, rs2=int(rng.integers(1, 12)),
                 imm=96 + 2 * k)
    for k in range(16):
        asm.lw(int(rng.integers(1, 12)), 12, 4 * k)
        asm.emit(RV32IM.LB, rd=int(rng.integers(1, 12)), rs1=12, imm=64 + k)
        asm.emit(RV32IM.LBU, rd=int(rng.integers(1, 12)), rs1=12, imm=64 + k)
        asm.emit(RV32IM.LH, rd=int(rng.integers(1, 12)), rs1=12,
                 imm=96 + 2 * k)
        asm.emit(RV32IM.LHU, rd=int(rng.integers(1, 12)), rs1=12,
                 imm=96 + 2 * k)
    asm.label("halt")
    asm.jal(0, "halt")
    program = asm.finish()
    rows_py, _, rows_c, _ = _run_both(program)
    _assert_rows_equal(rows_py, rows_c)


def test_native_tracer_device_io():
    """Reads guest inputs, writes outputs + panic bit; device state matches."""
    dev_probe = JoltDevice.new()
    ml = dev_probe.memory_layout
    asm = Assembler()
    # r1 = input_start; r2 = output_start (build 32-bit constants)
    for r, v in ((1, ml.input_start), (2, ml.output_start), (3, ml.panic)):
        hi = (v + 0x800) & 0xFFFFF000
        asm.emit(RV32IM.LUI, rd=r, imm=hi)
        asm.emit(RV32IM.ADDI, rd=r, rs1=r, imm=(v - hi) & 0xFFFFFFFF)
    # copy 4 input bytes to outputs, doubled
    for k in range(4):
        asm.emit(RV32IM.LBU, rd=4, rs1=1, imm=k)
        asm.add(5, 4, 4)
        asm.emit(RV32IM.SB, rs1=2, rs2=5, imm=k)
    # set the panic bit
    asm.addi(6, 0, 1)
    asm.emit(RV32IM.SB, rs1=3, rs2=6, imm=0)
    asm.label("halt")
    asm.jal(0, "halt")
    program = asm.finish()

    rows_py, dev_py, rows_c, dev_c = _run_both(program, inputs=b"\x05\x07\x0b\x20")
    _assert_rows_equal(rows_py, rows_c)
    assert bytes(dev_c.outputs) == bytes(dev_py.outputs)
    assert bytes(dev_c.outputs)[:4] == bytes([10, 14, 22, 64])
    assert dev_c.panic and dev_py.panic


def test_native_tracer_speed_smoke():
    """A 100k-step loop traces natively well under a second."""
    import time
    asm = Assembler()
    asm.addi(1, 0, 0)
    asm.emit(RV32IM.LUI, rd=2, imm=100_000 << 12 >> 12 & 0xFFFFF000 or 0x19000)
    asm.addi(2, 0, 0)
    asm.emit(RV32IM.LUI, rd=2, imm=0x19000)  # 0x19 << 12 = 102400
    asm.label("loop")
    asm.addi(1, 1, 1)
    asm.bne(1, 2, "loop")
    asm.label("halt")
    asm.jal(0, "halt")
    program = asm.finish()
    dev = JoltDevice.new()
    t0 = time.perf_counter()
    from jolt_tpu.native import trace_columnar
    cols = trace_columnar(program, dev)
    dt = time.perf_counter() - t0
    assert len(cols) > 200_000
    assert dt < 2.0
