"""Subtable + instruction consistency tests.

Mirrors the reference's test strategy: `subtable_materialize_mle_parity_test`
(subtable/test.rs:1-24) and `jolt_instruction_test` (instruction/test.rs).
"""
import random

import numpy as np
import pytest

from jolt_tpu.field import fr, fr_spec
from jolt_tpu.instructions import AndInstruction, OrInstruction, XorInstruction
from jolt_tpu.subtables import AndSubtable, OrSubtable, XorSubtable
from jolt_tpu.utils.math import log2_strict

RNG = random.Random(5)


@pytest.mark.parametrize("subtable_cls", [AndSubtable, OrSubtable, XorSubtable])
def test_subtable_materialize_mle_parity(subtable_cls):
    M = 64
    sub = subtable_cls()
    entries = sub.materialize_entries(M)
    ell = log2_strict(M)
    for idx in range(M):
        bits = [fr((idx >> (ell - 1 - k)) & 1) for k in range(ell)]
        assert sub.evaluate_mle(bits) == fr(int(entries[idx])), idx
    # parity also at a random (non-boolean) point vs the full MLE sum
    from jolt_tpu.poly import mle
    r = [fr(RNG.randrange(fr_spec().p)) for _ in range(ell)]
    direct = mle.evaluate_host([fr(int(e)) for e in entries], r)
    assert sub.evaluate_mle(r) == direct


@pytest.mark.parametrize("instr_cls", [AndInstruction, OrInstruction, XorInstruction])
def test_instruction_materialized_consistency(instr_cls):
    """combine_lookups(subtable entries at to_indices) == lookup_entry."""
    C, M = 4, 1 << 16
    log_M = 16
    sub_entries = {}
    for _ in range(32):
        x, y = RNG.randrange(1 << 32), RNG.randrange(1 << 32)
        instr = instr_cls(x, y)
        indices = instr.to_indices(C, log_M)
        subtables = instr.subtables(C, M)
        vals = []
        num_memories = C * len(subtables)
        for mem in range(num_memories):
            sub, _ = subtables[mem // C]
            if type(sub) not in sub_entries:
                sub_entries[type(sub)] = sub.materialize_entries(M)
            vals.append(fr(int(sub_entries[type(sub)][indices[mem % C]])))
        assert instr.combine_lookups(vals, C, M) == fr(instr.lookup_entry()), (x, y)


def test_instruction_mle_consistency():
    """combine_lookups over subtable MLEs at the index bits == lookup_entry."""
    C, M = 2, 1 << 8
    for _ in range(8):
        x, y = RNG.randrange(1 << 8), RNG.randrange(1 << 8)
        instr = XorInstruction(x, y)
        indices = instr.to_indices(C, 8)
        vals = []
        for mem in range(C):
            idx = indices[mem]
            bits = [fr((idx >> (7 - k)) & 1) for k in range(8)]
            vals.append(XorSubtable().evaluate_mle(bits))
        assert instr.combine_lookups(vals, C, M) == fr(instr.lookup_entry())
