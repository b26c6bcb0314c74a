"""Mock commitment scheme for testing (reference: poly/commitment/mock.rs).

The commitment retains the full polynomial (host ints); `verify` evaluates it
directly.  Like the reference's mock, commitments append nothing to the
transcript, letting e2e tests isolate proof-system bugs from PCS bugs
(rv32i_vm.rs:308-311 `fib_e2e_mock`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp

from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..poly.mle import evaluate_host
from ..transcript import Transcript


@dataclass
class MockCommitment:
    evals: list[FElt]  # full polynomial, canonical ints

    def append_to_transcript(self, transcript: Transcript) -> None:
        pass  # mock commitments contribute nothing (mock.rs:29-31)


class MockCommitmentScheme:
    def __init__(self, spec: FieldSpec | None = None):
        self.spec = spec or fr_spec()

    @staticmethod
    def protocol_name() -> bytes:
        return b"mock_commit"

    def setup(self, shapes=()):
        return self

    def commit(self, poly: jnp.ndarray) -> MockCommitment:
        ints = fd.device_to_ints(self.spec, poly)
        return MockCommitment([FElt(int(v), self.spec) for v in ints.tolist()])

    def batch_commit(self, polys: Sequence[jnp.ndarray], batch_type=None,
                     mesh=None) -> list[MockCommitment]:
        return [self.commit(p) for p in polys]

    def prove(self, poly: jnp.ndarray, opening_point: Sequence[FElt],
              transcript: Transcript):
        return None

    def verify(self, proof, transcript: Transcript,
               opening_point: Sequence[FElt], opening: FElt,
               commitment: MockCommitment) -> None:
        got = evaluate_host(commitment.evals, list(opening_point))
        assert got == opening, "mock PCS: evaluation mismatch"

    def combine_commitments(self, commitments: Sequence[MockCommitment],
                            coeffs: Sequence[FElt]) -> MockCommitment:
        n = max(len(c.evals) for c in commitments)
        zero = FElt(0, self.spec)
        out = [zero] * n
        for c, co in zip(commitments, coeffs):
            for i, e in enumerate(c.evals):
                out[i] = out[i] + co * e
        return MockCommitment(out)
