"""Hyrax PCS + Pedersen generators (reference: poly/commitment/{hyrax,pedersen}.rs).

Pedersen matrix commitment: the evaluation vector is viewed as an
L_size x R_size matrix; each row is committed with a fixed generator vector.
Opening at r = (r_L, r_R): the prover sends the L-weighted vector-matrix
product; the verifier checks it against the homomorphically-combined row
commitments and dot-products with R (Thaler §14.3).

Note: in the reference fork the Hyrax e2e is #[ignore]d (incompatible with
the reduced-opening flow, rv32i_vm.rs:313-317); provided here as a
standalone PCS for parity.  Generators are derived from a seeded PRG over
scalar multiples of the group generator (documented deviation from the
reference's Shake256/ChaCha group sampling — role-equivalent).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import random

from ..curve import device as cd
from ..curve.bn254 import G1Affine, g1_msm_host
from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..poly.mle import eq_evals_host
from ..transcript import Transcript
from ..utils.math import log2_strict, next_power_of_two
from .base import BatchType

FR = fr_spec()

TRACE_LEN_R1CS_POLYS_BATCH_RATIO = 64
SURGE_RATIO_READ_WRITE = 16
SURGE_RATIO_FINAL = 4


def batch_type_to_ratio(batch_type: BatchType) -> int:
    return {BatchType.BIG: TRACE_LEN_R1CS_POLYS_BATCH_RATIO,
            BatchType.GRAND_PRODUCT: TRACE_LEN_R1CS_POLYS_BATCH_RATIO,
            BatchType.SMALL: 1,
            BatchType.SURGE_READ_WRITE: SURGE_RATIO_READ_WRITE,
            BatchType.SURGE_INIT_FINAL: SURGE_RATIO_FINAL}[batch_type]


def _isqrt(n: int) -> int:
    return int(n ** 0.5 + 0.5)


def matrix_dimensions(num_vars: int, ratio: int) -> tuple[int, int]:
    """(col_size, row_size) split (hyrax.rs:39-50)."""
    row_size = 1 << (num_vars // 2)
    row_size = next_power_of_two(row_size * _isqrt(ratio))
    right_num_vars = min(log2_strict(row_size), num_vars - 1)
    row_size = 1 << right_num_vars
    col_size = 1 << (num_vars - right_num_vars)
    return col_size, row_size


@dataclass
class PedersenGenerators:
    points: list[G1Affine]
    dev: tuple  # device affine tensors

    @staticmethod
    def new(n: int, label: bytes = b"Jolt v1 Hyrax generators"
            ) -> "PedersenGenerators":
        rng = random.Random(label)
        g = G1Affine.generator().to_jacobian()
        pts = [g.mul(rng.randrange(1, FR.p)).to_affine() for _ in range(n)]
        return PedersenGenerators(pts, cd.points_to_device(pts))


@dataclass
class HyraxCommitment:
    row_commitments: list[G1Affine]

    def append_to_transcript(self, transcript: Transcript) -> None:
        transcript.append_message(b"poly_commitment_begin")
        for p in self.row_commitments:
            transcript.append_point(None if p.is_infinity else p)
        transcript.append_message(b"poly_commitment_end")


@dataclass
class HyraxOpeningProof:
    vector_matrix_product: list[FElt]


class HyraxScheme:
    def __init__(self, generators: PedersenGenerators,
                 spec: FieldSpec | None = None):
        self.gens = generators
        self.spec = spec or FR

    @classmethod
    def setup(cls, max_len: int, ratio: int = 1) -> "HyraxScheme":
        _, r_size = matrix_dimensions(log2_strict(max_len), ratio)
        return cls(PedersenGenerators.new(r_size))

    @staticmethod
    def protocol_name() -> bytes:
        return b"Hyrax opening proof"

    def commit(self, poly: jnp.ndarray, ratio: int = 1) -> HyraxCommitment:
        spec = self.spec
        n = poly.shape[-1]
        l_size, r_size = matrix_dimensions(log2_strict(n), ratio)
        px, py, pinf = self.gens.dev
        rows = []
        for i in range(l_size):
            row = poly[..., i * r_size:(i + 1) * r_size]
            rows.append(cd.msm((px[..., :r_size], py[..., :r_size],
                                pinf[:r_size]), row, spec))
        return HyraxCommitment(rows)

    def batch_commit(self, polys, batch_type: BatchType = BatchType.BIG):
        return [self.commit(p) for p in polys]

    def prove(self, poly: jnp.ndarray, opening_point: Sequence[FElt],
              transcript: Transcript, ratio: int = 1) -> HyraxOpeningProof:
        spec = self.spec
        transcript.append_protocol_name(self.protocol_name())
        point = list(opening_point)
        n = poly.shape[-1]
        l_size, r_size = matrix_dimensions(len(point), ratio)
        left_num_vars = log2_strict(l_size)
        L = eq_evals_host(point[:left_num_vars])
        # vector-matrix product: sum_i L[i] * row_i  (device)
        mat = poly.reshape(fd.L, l_size, r_size)
        l_dev = jnp.stack([fd.scalar_to_device(spec, x.v) for x in L], axis=1)
        weighted = fd.fmul(spec, mat, jnp.broadcast_to(
            l_dev[:, :, None], mat.shape))
        vmp = fd.fsum(spec, weighted, axis=0)
        vals = [FElt(int(v), spec)
                for v in fd.device_to_ints(spec, vmp).tolist()]
        return HyraxOpeningProof(vals)

    def verify(self, proof: HyraxOpeningProof, transcript: Transcript,
               opening_point: Sequence[FElt], opening: FElt,
               commitment: HyraxCommitment, ratio: int = 1) -> None:
        spec = self.spec
        transcript.append_protocol_name(self.protocol_name())
        point = list(opening_point)
        l_size, r_size = matrix_dimensions(len(point), ratio)
        left_num_vars = log2_strict(l_size)
        L = eq_evals_host(point[:left_num_vars])
        R = eq_evals_host(point[left_num_vars:])

        derived = g1_msm_host(commitment.row_commitments, [x.v for x in L])
        product = g1_msm_host(self.gens.points[:r_size],
                              [x.v for x in proof.vector_matrix_product])
        dot = FElt(0, spec)
        for a, b in zip(proof.vector_matrix_product, R):
            dot = dot + a * b
        assert derived == product and dot == opening, \
            "Hyrax opening verification failed"

    def prove_batched(self, polys: Sequence[jnp.ndarray],
                      opening_point: Sequence[FElt],
                      openings: Sequence[FElt], transcript: Transcript,
                      batch_type: BatchType = BatchType.BIG
                      ) -> "BatchedHyraxOpeningProof":
        return BatchedHyraxOpeningProof.prove(
            self, polys, opening_point, openings, batch_type, transcript)

    def combine_commitments(self, commitments, coeffs):
        max_rows = max(len(c.row_commitments) for c in commitments)
        from ..curve.bn254 import G1Jacobian
        rows = []
        for i in range(max_rows):
            acc = G1Jacobian.identity()
            for c, co in zip(commitments, coeffs):
                if i < len(c.row_commitments):
                    p = c.row_commitments[i]
                    if not p.is_infinity and co.v:
                        acc = acc.add(p.to_jacobian().mul(co.v))
            rows.append(acc.to_affine())
        return HyraxCommitment(rows)


@dataclass
class BatchedHyraxOpeningProof:
    """RLC batch opening (hyrax.rs:359-505, Thaler PAZK §16.1).

    K polynomials opened at one point collapse into a single Hyrax opening
    of their random linear combination; the verifier re-derives the RLC
    commitment homomorphically from the per-polynomial row commitments.
    The RLC itself is one device pass: a [K]-coefficient weighted modular
    sum over stacked [L, K, n] limb tensors.
    """
    joint_proof: HyraxOpeningProof
    ratio: int

    @staticmethod
    def protocol_name() -> bytes:
        return b"Jolt BatchedHyraxOpeningProof"

    @staticmethod
    def prove(scheme: HyraxScheme, polys: Sequence[jnp.ndarray],
              opening_point: Sequence[FElt], openings: Sequence[FElt],
              batch_type: BatchType, transcript: Transcript
              ) -> "BatchedHyraxOpeningProof":
        spec = scheme.spec
        transcript.append_protocol_name(
            BatchedHyraxOpeningProof.protocol_name())
        transcript.append_scalars(openings)
        coeffs = transcript.challenge_vector(len(polys))
        stacked = jnp.stack(tuple(polys), axis=1)          # [L, K, n]
        c_dev = jnp.stack([fd.scalar_to_device(spec, c.v) for c in coeffs],
                          axis=1)                          # [L, K]
        weighted = fd.fmul(spec, stacked,
                           jnp.broadcast_to(c_dev[:, :, None], stacked.shape))
        rlc = fd.fsum(spec, weighted, axis=0)  # logical K axis -> [L, n]
        ratio = batch_type_to_ratio(batch_type)
        joint = scheme.prove(rlc, opening_point, transcript, ratio)
        return BatchedHyraxOpeningProof(joint, ratio)

    def verify(self, scheme: HyraxScheme, opening_point: Sequence[FElt],
               openings: Sequence[FElt],
               commitments: Sequence[HyraxCommitment],
               transcript: Transcript) -> None:
        spec = scheme.spec
        assert len(openings) == len(commitments)
        l_size, _ = matrix_dimensions(len(opening_point), self.ratio)
        for i, c in enumerate(commitments):
            assert len(c.row_commitments) == l_size, \
                f"Row commitment {i}/{len(commitments)} wrong length"
        transcript.append_protocol_name(self.protocol_name())
        transcript.append_scalars(openings)
        coeffs = transcript.challenge_vector(len(openings))
        rlc_eval = FElt(0, spec)
        for c, o in zip(coeffs, openings):
            rlc_eval = rlc_eval + c * o
        rlc_commitment = scheme.combine_commitments(commitments, coeffs)
        scheme.verify(self.joint_proof, transcript, opening_point, rlc_eval,
                      rlc_commitment, self.ratio)
