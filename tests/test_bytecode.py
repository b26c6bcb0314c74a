"""Bytecode memory checking roundtrip (bytecode.rs:721-819 test strategy)."""
import random

from jolt_tpu.field import fr_spec
from jolt_tpu.transcript import Transcript
from jolt_tpu.vm.bytecode import (BytecodeMemoryChecking,
                                  BytecodePreprocessing, BytecodeRow,
                                  generate_witness)
from jolt_tpu.vm.rv_trace import RAM_START_ADDRESS

RNG = random.Random(4242)


def _random_bytecode(n):
    return [BytecodeRow(RAM_START_ADDRESS + 4 * i, RNG.randrange(1 << 32),
                        RNG.randrange(64), RNG.randrange(64),
                        RNG.randrange(64), RNG.randrange(1 << 20))
            for i in range(n)]


def test_bytecode_memory_checking_roundtrip():
    spec = fr_spec()
    code = _random_bytecode(5)
    pre = BytecodePreprocessing(code, spec)
    assert pre.code_size == 8

    # trace of 6 reads + padding to 8
    trace = [code[RNG.randrange(len(code))] for _ in range(6)]
    trace += [BytecodeRow.no_op(0)] * 2
    polys = generate_witness(pre, trace, 8)

    mc = BytecodeMemoryChecking(pre)
    pt = Transcript(b"bc")
    proof = mc.prove_memory_checking(polys, None, pt)

    vt = Transcript(b"bc")
    vt.compare_to(pt)
    mc2 = BytecodeMemoryChecking(pre)
    mc2.verify_memory_checking(proof, None, None, vt)


def test_bytecode_rejects_tampered_trace():
    spec = fr_spec()
    code = _random_bytecode(4)
    pre = BytecodePreprocessing(code, spec)
    trace = [code[0], code[1], code[2], code[3]]
    polys = generate_witness(pre, trace, 4)
    # tamper: swap the imm value of one committed v polynomial
    bad = [BytecodeRow(**vars(r)) for r in trace]
    bad[2].imm ^= 1
    try:
        generate_witness(pre, bad, 4)
        # the witness itself builds, but the multiset check must fail
        # because (addr, modified imm) isn't in the preprocessed bytecode:
        mc = BytecodeMemoryChecking(pre)
        mc.prove_memory_checking(generate_witness(pre, bad, 4), None,
                                 Transcript(b"bc"))
        raise SystemExit("tampered bytecode trace should not prove")
    except AssertionError:
        pass
