"""Instruction-lookups component e2e with a mini instruction set.

Uses a reduced instruction set (ADD / XOR / BEQ over C=4, M=2^8) so the fused
primary-sumcheck kernel stays small for CI; the full RV32I set exercises the
same code paths (rv32i_vm tests go through the VM orchestrator).
"""
import random

import numpy as np

from jolt_tpu.field import fr_spec
from jolt_tpu.instructions import (AddInstruction, BeqInstruction,
                                   XorInstruction)
from jolt_tpu.poly.opening_proof import (ProverOpeningAccumulator,
                                         VerifierOpeningAccumulator)
from jolt_tpu.commitment import MockCommitmentScheme
from jolt_tpu.subtables.bitwise import XorSubtable
from jolt_tpu.subtables.rv32i import (EqSubtable, IdentitySubtable,
                                      TruncateOverflowSubtable)
from jolt_tpu.transcript import Transcript
from jolt_tpu.vm.instruction_lookups import (InstructionLookupsPreprocessing,
                                             generate_witness,
                                             prove_instruction_lookups,
                                             verify_instruction_lookups)

RNG = random.Random(808)

MINI_SET = [AddInstruction, XorInstruction, BeqInstruction]
SUBTABLE_ORDER = [TruncateOverflowSubtable(32), IdentitySubtable(),
                  XorSubtable(), EqSubtable()]


def test_instruction_lookups_e2e():
    spec = fr_spec()
    C, M = 4, 1 << 8
    pre = InstructionLookupsPreprocessing(MINI_SET, SUBTABLE_ORDER, C, M, spec)
    assert pre.num_memories == 4 + 4 + 4  # identity, xor, eq (truncate empty)

    T = 16
    n_real = 11
    instr_idx = np.full(T, -1, dtype=np.int64)
    x = np.zeros(T, dtype=np.uint64)
    y = np.zeros(T, dtype=np.uint64)
    for j in range(n_real):
        instr_idx[j] = RNG.randrange(len(MINI_SET))
        # with M = 2^8, C = 4 the concat-chunk instructions cover 16-bit
        # operands (the full VM uses M = 2^16 -> 32-bit); stay in range
        x[j] = RNG.randrange(1 << 15)
        y[j] = RNG.randrange(1 << 15)

    polys = generate_witness(pre, instr_idx, x, y)

    pt = Transcript(b"il")
    acc = ProverOpeningAccumulator(spec)
    proof = prove_instruction_lookups(pre, polys, acc, pt)
    assert len(acc) == 1  # primary sumcheck openings

    # verifier (mock commitments so the accumulator append works)
    pcs = MockCommitmentScheme(spec)
    commitments = {
        "E": [pcs.commit(polys.E_polys[:, i]) for i in range(pre.num_memories)],
        "flags": [pcs.commit(polys.instruction_flags[:, i])
                  for i in range(len(MINI_SET))],
        "outputs": pcs.commit(polys.lookup_outputs),
    }
    vt = Transcript(b"il")
    vt.compare_to(pt)
    vacc = VerifierOpeningAccumulator(pcs, spec)
    vacc.compare_to(acc)
    verify_instruction_lookups(pre, proof, commitments, vacc, vt)

    # opening reduction roundtrip over the accumulated primary openings
    reduced = acc.reduce_and_prove(pcs, pt)
    vt.expected_state_history = pt.state_history
    vacc.reduce_and_verify(pcs, reduced, vt)
