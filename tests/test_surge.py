"""Surge e2e: the minimal full Lasso slice (Milestone A).

Exercises field kernels, transcript, sumcheck, grand products, memory
checking, and the opening plumbing end-to-end (reference surge.rs tests).
"""
import random

import numpy as np

from jolt_tpu.commitment import MockCommitmentScheme
from jolt_tpu.field import fr_spec
from jolt_tpu.instructions import XorInstruction
from jolt_tpu.lasso import SurgePreprocessing, surge_prove, surge_verify

RNG = random.Random(123)


def test_surge_xor_e2e():
    spec = fr_spec()
    C, M = 2, 1 << 4  # 2 chunks x 16-entry subtables -> 4-bit operands
    pre = SurgePreprocessing(XorInstruction, C, M, spec)
    pcs = MockCommitmentScheme(spec)

    n_ops = 13  # deliberately not a power of two (pads to 16)
    x = np.array([RNG.randrange(16) for _ in range(n_ops)], dtype=np.uint64)
    y = np.array([RNG.randrange(16) for _ in range(n_ops)], dtype=np.uint64)

    proof, prover_transcript, _ = surge_prove(pre, pcs, x, y)
    surge_verify(pre, pcs, proof, debug_transcript=prover_transcript)


def test_surge_rejects_wrong_lookup():
    spec = fr_spec()
    C, M = 2, 1 << 4
    pre = SurgePreprocessing(XorInstruction, C, M, spec)
    pcs = MockCommitmentScheme(spec)
    x = np.array([3, 7, 1, 15], dtype=np.uint64)
    y = np.array([5, 2, 9, 0], dtype=np.uint64)
    proof, _, _ = surge_prove(pre, pcs, x, y)
    # tamper with the claimed evaluation
    from jolt_tpu.field import fr
    proof.primary_sumcheck.claimed_evaluation = (
        proof.primary_sumcheck.claimed_evaluation + fr(1))
    try:
        surge_verify(pre, pcs, proof)
        raise SystemExit("tampered surge proof should not verify")
    except AssertionError:
        pass
