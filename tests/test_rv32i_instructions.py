"""Per-instruction consistency: combine(subtable entries at to_indices) ==
lookup_entry, mirroring jolt_instruction_test! (instruction/test.rs:1-115),
for all 29 RV32I instructions with random + edge-case operands.
"""
import random

import numpy as np
import pytest

from jolt_tpu.field import fr
from jolt_tpu.instructions import RV32I_INSTRUCTIONS

RNG = random.Random(2718)
C, M, LOG_M = 4, 1 << 16, 16

_TABLE_CACHE: dict = {}


def _entries(subtable):
    key = subtable.key()
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = subtable.materialize_entries(M)
    return _TABLE_CACHE[key]


def _check(instr):
    indices = instr.to_indices(C, LOG_M)
    vals = []
    for subtable, chunk_indices in instr.subtables(C, M):
        entries = _entries(subtable)
        for ci in chunk_indices:
            vals.append(fr(int(entries[indices[ci]])))
    got = instr.combine_lookups(vals, C, M)
    want = fr(instr.lookup_entry())
    assert got == want, (type(instr).__name__, instr.x, instr.y,
                         int(got), int(want))
    # vectorized witness paths agree with the scalar ones
    x = np.array([instr.x], dtype=np.uint64)
    y = np.array([instr.y], dtype=np.uint64)
    assert int(type(instr).lookup_entry_vec(x, y)[0]) == instr.lookup_entry()
    vec = type(instr).to_indices_vec(x, y, C, LOG_M)[:, 0]
    assert [int(v) for v in vec] == indices


EDGES = [0, 1, 0xFFFFFFFF, 0x80000000, 0x7FFFFFFF, 100, 1 << 8, 1 << 16]


@pytest.mark.parametrize("instr_cls", RV32I_INSTRUCTIONS,
                         ids=lambda c: c.name)
def test_instruction_consistency(instr_cls):
    for _ in range(24):
        _check(instr_cls(RNG.randrange(1 << 32), RNG.randrange(1 << 32)))
    for x in EDGES:
        for y in (0, 1, 0xFFFFFFFF, x):
            _check(instr_cls(x, y))
