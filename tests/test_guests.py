"""Guest programs: the hand-assembled SHA-256 chain guest computes real
SHA-256 (oracle: hashlib), via both the native and Python emulators.

Reference workload: examples/sha2-chain/guest + bench.rs:212-246.
"""
from jolt_tpu.native import trace_columnar
from jolt_tpu.tracer.emulator import Emulator
from jolt_tpu.vm.guests import sha2_chain_expected, sha2_chain_program
from jolt_tpu.vm.rv_trace import JoltDevice


def _run_native(program, inputs):
    dev = JoltDevice.new()
    dev.inputs.extend(inputs)
    cols = trace_columnar(program, dev)
    return dev, len(cols)


def test_sha2_chain_guest_native():
    inputs = bytes(range(32))
    program = sha2_chain_program(3)
    dev, n_rows = _run_native(program, inputs)
    assert bytes(dev.outputs)[:32] == sha2_chain_expected(inputs, 3)
    assert not dev.panic
    assert n_rows > 3 * 3000


def test_sha2_chain_guest_python_oracle():
    inputs = b"\x05" * 32                 # the reference bench input [5u8;32]
    program = sha2_chain_program(1)
    dev = JoltDevice.new()
    dev.inputs.extend(inputs)
    Emulator(program, dev).run(max_steps=1 << 16)
    assert bytes(dev.outputs)[:32] == sha2_chain_expected(inputs, 1)


def test_collatz_guest_native():
    from jolt_tpu.vm.guests import collatz_expected, collatz_program
    program = collatz_program(27)         # 111 steps
    dev, _ = _run_native(program, b"")
    import struct
    assert struct.unpack("<I", bytes(dev.outputs)[:4])[0] == \
        collatz_expected(27) == 111


def test_sha3_chain_guest_native():
    """SHA3-256 (NIST padding) against the independent hashlib oracle —
    exercises the JAL/JALR subroutine path end-to-end."""
    from jolt_tpu.vm.guests import sha3_chain_expected, sha3_chain_program
    inputs = bytes(range(32))
    program = sha3_chain_program(2)
    dev, n_rows = _run_native(program, inputs)
    assert bytes(dev.outputs)[:32] == sha3_chain_expected(inputs, 2)
    assert not dev.panic
    assert n_rows > 2 * 5000


def test_keccak256_chain_guest_native():
    """Ethereum Keccak-256 padding variant (transcript keccak oracle)."""
    from jolt_tpu.vm.guests import sha3_chain_expected, sha3_chain_program
    inputs = b"\x07" * 32
    program = sha3_chain_program(1, pad_byte=0x01)
    dev, _ = _run_native(program, inputs)
    assert bytes(dev.outputs)[:32] == sha3_chain_expected(inputs, 1,
                                                          pad_byte=0x01)


def test_alloc_guest_native():
    """Heap fill+sum (examples/alloc analog): 4n-byte RAM footprint above
    the I/O region, output checked against the closed-form oracle."""
    import struct

    from jolt_tpu.vm.guests import alloc_sum_expected, alloc_sum_program
    program = alloc_sum_program(256)
    dev, n_rows = _run_native(program, b"")
    assert struct.unpack("<I", bytes(dev.outputs)[:4])[0] == \
        alloc_sum_expected(256)
    assert not dev.panic
    assert n_rows > 256 * 10


def test_multi_function_guest_native():
    """JAL/JALR call+return linkage (examples/multi-function analog)."""
    import struct

    from jolt_tpu.vm.guests import (multi_function_expected,
                                    multi_function_program)
    program = multi_function_program(9)
    dev, _ = _run_native(program, b"")
    assert struct.unpack("<I", bytes(dev.outputs)[:4])[0] == \
        multi_function_expected(9)
    assert not dev.panic


def test_stdlib_guest_native():
    """Decimal string_concat (examples/stdlib analog): byte-granular heap
    string growth, div-by-10 via subtraction, output vs str() oracle."""
    from jolt_tpu.vm.guests import stdlib_expected, stdlib_program
    program = stdlib_program(13)
    dev, n_rows = _run_native(program, b"")
    want = stdlib_expected(13)
    assert bytes(dev.outputs)[:len(want)] == want
    assert not dev.panic
    assert n_rows > 13 * 10


def test_muldiv_guest_native():
    """M-extension a*b/c (examples/muldiv analog), output checked."""
    import struct

    from jolt_tpu.vm.guests import muldiv_expected, muldiv_program
    dev, _ = _run_native(muldiv_program(), b"")
    assert struct.unpack("<I", bytes(dev.outputs)[:4])[0] == \
        muldiv_expected()
    assert not dev.panic
