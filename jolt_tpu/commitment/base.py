"""Commitment scheme interface (reference: commitment_scheme.rs:13-120).

A `CommitmentScheme` binds device MLE limb tensors to transcript-appendable
commitments.  Batch types mirror the reference's `BatchType` — they select
MSM strategies (e.g. the GrandProduct mostly-ones fast path) without changing
semantics.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Protocol, Sequence

import jax.numpy as jnp

from ..field import FElt
from ..transcript import Transcript


class BatchType(enum.Enum):
    BIG = "big"
    SMALL = "small"
    SURGE_READ_WRITE = "surge_read_write"
    SURGE_INIT_FINAL = "surge_init_final"
    GRAND_PRODUCT = "grand_product"


@dataclass(frozen=True)
class CommitShape:
    input_length: int
    batch_type: BatchType


class CommitmentScheme(Protocol):
    """Duck-typed PCS interface.

    Polynomials are device limb tensors [NUM_LIMBS, n] (Montgomery form);
    opening points/claims are host FElts.
    """

    @staticmethod
    def protocol_name() -> bytes: ...

    def setup(self, shapes: Sequence[CommitShape]): ...

    def commit(self, poly: jnp.ndarray): ...

    def batch_commit(self, polys: Sequence[jnp.ndarray],
                     batch_type: BatchType = BatchType.BIG): ...

    def prove(self, poly: jnp.ndarray, opening_point: Sequence[FElt],
              transcript: Transcript): ...

    def verify(self, proof, transcript: Transcript,
               opening_point: Sequence[FElt], opening: FElt,
               commitment) -> None: ...

    def combine_commitments(self, commitments: Sequence, coeffs: Sequence[FElt]): ...
