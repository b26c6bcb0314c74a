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
