"""Jolt instruction interface (reference: jolt/instruction/mod.rs:17-71).

An instruction defines:
  * `to_indices`: how its operands chunk into C subtable lookup indices
  * `subtables`: which subtables it reads, and at which chunk dimensions
  * `combine_lookups`: the collation polynomial g reassembling subtable
    outputs into the instruction output — written generically over
    FElt (host) / DevF (device), so the same code serves the verifier's
    claim check and the prover's sumcheck kernel
  * `lookup_entry`: native u64 semantics (witness generation oracle)

Witness generation is VECTORIZED: `to_indices_vec` maps whole operand arrays
(numpy u64) to [C, N] index arrays — no per-op Python loops on the hot path.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..subtables.base import LassoSubtable


class SubtableIndices:
    """Which chunk dimensions (0..C) a subtable participates in."""

    def __init__(self, indices):
        self.indices = sorted(set(indices))

    @staticmethod
    def from_range(c: int) -> "SubtableIndices":
        return SubtableIndices(range(c))

    @staticmethod
    def single(i: int) -> "SubtableIndices":
        return SubtableIndices([i])

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)

    def __contains__(self, i):
        return i in self.indices


class JoltInstruction:
    name: str = "instruction"
    word_size: int = 32

    def __init__(self, x: int = 0, y: int = 0):
        self.x = int(x)
        self.y = int(y)

    def operands(self) -> tuple[int, int]:
        return (self.x, self.y)

    def combine_lookups(self, vals: Sequence, C: int, M: int):
        raise NotImplementedError

    def slice_values(self, vals: Sequence, C: int, M: int) -> list:
        """Split flat subtable-major values per subtable (mod.rs slice_values)."""
        out = []
        offset = 0
        for _, indices in self.subtables(C, M):
            out.append(list(vals[offset:offset + len(indices)]))
            offset += len(indices)
        assert offset == len(vals)
        return out

    def g_poly_degree(self, C: int) -> int:
        raise NotImplementedError

    def subtables(self, C: int, M: int
                  ) -> list[tuple[LassoSubtable, SubtableIndices]]:
        raise NotImplementedError

    def to_indices(self, C: int, log_M: int) -> list[int]:
        ops = np.array([[self.x], [self.y]], dtype=np.uint64)
        return [int(v) for v in
                self.to_indices_vec(ops[0], ops[1], C, log_M)[:, 0]]

    @classmethod
    def to_indices_vec(cls, x: np.ndarray, y: np.ndarray, C: int,
                       log_M: int) -> np.ndarray:
        raise NotImplementedError

    def lookup_entry(self) -> int:
        raise NotImplementedError

    @classmethod
    def lookup_entry_vec(cls, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    @classmethod
    def random(cls, rng) -> "JoltInstruction":
        if cls.word_size == 32:
            return cls(rng.randrange(1 << 32), rng.randrange(1 << 32))
        return cls(rng.randrange(1 << 64), rng.randrange(1 << 64))

    def __repr__(self):
        return f"{type(self).__name__}({self.x}, {self.y})"
