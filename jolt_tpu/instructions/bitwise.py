"""AND/OR/XOR instructions (reference: jolt/instruction/{and,or,xor}.rs).

Each chunks (x, y) into C concatenated subtable indices and collates by
concatenation — degree-1 collation polynomial.
"""
from __future__ import annotations

import numpy as np

from ..subtables.bitwise import AndSubtable, OrSubtable, XorSubtable
from .base import JoltInstruction, SubtableIndices
from .utils import chunk_and_concatenate_operands_vec, concatenate_lookups


class _BitwiseInstruction(JoltInstruction):
    subtable_cls = None
    _np_op = None

    def combine_lookups(self, vals, C, M):
        return concatenate_lookups(vals, C, (M.bit_length() - 1) // 2)

    def g_poly_degree(self, C):
        return 1

    def subtables(self, C, M):
        return [(self.subtable_cls(), SubtableIndices.from_range(C))]

    @classmethod
    def to_indices_vec(cls, x, y, C, log_M):
        return chunk_and_concatenate_operands_vec(x, y, C, log_M)

    def lookup_entry(self):
        return int(self.lookup_entry_vec(np.array([self.x], dtype=np.uint64),
                                         np.array([self.y], dtype=np.uint64))[0])


class XorInstruction(_BitwiseInstruction):
    name = "xor"
    subtable_cls = XorSubtable

    @classmethod
    def lookup_entry_vec(cls, x, y):
        return np.asarray(x, dtype=np.uint64) ^ np.asarray(y, dtype=np.uint64)


class AndInstruction(_BitwiseInstruction):
    name = "and"
    subtable_cls = AndSubtable

    @classmethod
    def lookup_entry_vec(cls, x, y):
        return np.asarray(x, dtype=np.uint64) & np.asarray(y, dtype=np.uint64)


class OrInstruction(_BitwiseInstruction):
    name = "or"
    subtable_cls = OrSubtable

    @classmethod
    def lookup_entry_vec(cls, x, y):
        return np.asarray(x, dtype=np.uint64) | np.asarray(y, dtype=np.uint64)
