"""Zeromorph multilinear PCS (reference: poly/commitment/zeromorph.rs).

Multilinear-to-univariate via multilinear quotients:
  f(X) - f(u) = sum_k q_k(X) * (X_k - u_k)
Each q_k is committed; a y-RLC "batched lifted-degree quotient" q_hat
enforces degree bounds; the ZM identity polynomial is opened at x with a
degree-shifted KZG witness (shift S = 1), checked by one pairing product.

Device work: quotient extraction is a cascade of bind-style kernels;
q_hat assembly and the final f-combination are dense RLC kernels; scalar
bookkeeping (eval_and_quotient_scalars) is host math.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp

from ..curve import device as cd
from ..curve.bn254 import G1Affine, G2Affine, g1_msm_host
from ..curve.pairing import pairing_product_is_one
from ..field import FElt, FieldSpec, batch_inverse, fr_spec
from ..field import device as fd
from ..poly.mle import bind_top
from ..poly.opening_proof import rlc_polys
from ..transcript import Transcript
from .base import BatchType, CommitShape
from .kzg import (KZGProverKey, KZGVerifierKey, kzg_commit, _msm_jac,
                  _powers_device, _quotient_coeffs, srs_setup)
import random

FR = fr_spec()


@dataclass
class ZeromorphCommitment:
    point: G1Affine

    def append_to_transcript(self, transcript: Transcript) -> None:
        transcript.append_point(None if self.point.is_infinity else self.point)

    def __eq__(self, other):
        return self.point == other.point


@dataclass
class ZeromorphProof:
    pi: G1Affine
    q_hat_com: G1Affine
    q_k_com: list[G1Affine]


def _eval_and_quotient_scalars(y: FElt, x: FElt, z: FElt,
                               challenges: list[FElt], spec: FieldSpec):
    """(zeromorph.rs:161-224)."""
    one = FElt(1, spec)
    n = len(challenges)
    squares = [x]
    for _ in range(n):
        squares.append(squares[-1] * squares[-1])
    # offsets_of_x[k] = prod_{j=k}^{n-1} squares[j]  (rev-scan then reverse)
    offsets = []
    acc = one
    for pow_x in reversed(squares[:-1]):
        acc = acc * pow_x
        offsets.append(acc)
    offsets.reverse()
    v_numer = squares[n] - one
    v_denoms = batch_inverse([s - one for s in squares])
    vs = [v_numer * d for d in v_denoms]
    y_pow = one
    deg_scalars, zm_scalars = [], []
    for k in range(n):
        deg_scalars.append(-(y_pow * offsets[k]))
        zm_scalars.append(-(z * (squares[k] * vs[k + 1]
                                 - challenges[n - 1 - k] * vs[k])))
        y_pow = y_pow * y
    return -(vs[0] * z), deg_scalars, zm_scalars


class Zeromorph:
    def __init__(self, pk: KZGProverKey, vk: KZGVerifierKey,
                 tau_shift_g2: G2Affine, spec: FieldSpec | None = None):
        self.pk = pk
        self.vk = vk
        self.tau_shift_g2 = tau_shift_g2  # g2 * tau^SHIFT (SHIFT = 1)
        self.spec = spec or FR

    @staticmethod
    def protocol_name() -> bytes:
        return b"Zeromorph"

    @classmethod
    def setup(cls, shapes: Sequence[CommitShape] | int,
              seed: int = 0x5A4D) -> "Zeromorph":
        if isinstance(shapes, int):
            max_len = shapes
        else:
            max_len = max(s.input_length for s in shapes)
        # one extra power for the shift-1 opening key
        pk, vk = srs_setup(max_len + 1, seed)
        tau = random.Random(seed).randrange(1, FR.p)
        return cls(pk, vk, G2Affine.generator().mul(tau))

    # -- commitments ---------------------------------------------------------
    def commit(self, poly: jnp.ndarray) -> ZeromorphCommitment:
        return ZeromorphCommitment(kzg_commit(self.pk, poly))

    def batch_commit(self, polys, batch_type: BatchType = BatchType.BIG):
        return [self.commit(p) for p in polys]

    def combine_commitments(self, commitments, coeffs):
        return ZeromorphCommitment(g1_msm_host(
            [c.point for c in commitments], [c.v for c in coeffs]))

    # -- opening ----------------------------------------------------------------
    def prove(self, poly: jnp.ndarray, opening_point: Sequence[FElt],
              transcript: Transcript) -> ZeromorphProof:
        spec = self.spec
        point = list(opening_point)
        n = len(point)
        assert poly.shape[-1] == 1 << n
        transcript.append_protocol_name(self.protocol_name())

        # multilinear quotients q_k, binding the TOP variable each level
        # (zeromorph.rs:89-129: splits at the high half, point[i] top-first)
        quotients = []  # q_k has 2^k coeffs; produced for k = n-1 .. 0
        remainder = poly
        for i in range(n):
            half = remainder.shape[-1] // 2
            lo, hi = remainder[..., :half], remainder[..., half:]
            quotients.append(fd.fsub(spec, hi, lo))
            remainder = bind_top(spec, remainder,
                                 fd.scalar_to_device(spec, point[i].v))
        quotients.reverse()  # q_0 (1 coeff) .. q_{n-1} (2^{n-1} coeffs)

        q_k_com = [kzg_commit(self.pk, q) for q in quotients]
        for c in q_k_com:
            transcript.append_point(None if c.is_infinity else c)
        y = transcript.challenge_scalar()

        # q_hat = sum_k y^k X^{N - 2^k} q_k  (coeff-offset accumulation)
        N = 1 << n
        q_hat = fd.zeros(spec, (N,))
        y_pow = FElt(1, spec)
        for k, q in enumerate(quotients):
            coeff = fd.scalar_to_device(spec, y_pow.v)
            scaled = fd.fmul(spec, q,
                             jnp.broadcast_to(coeff[:, None], q.shape))
            start = N - (1 << k)
            q_hat = q_hat.at[:, start:].set(
                fd.fadd(spec, q_hat[:, start:], scaled))
            y_pow = y_pow * y
        q_hat_com = kzg_commit(self.pk, q_hat)
        transcript.append_point(q_hat_com)

        x = transcript.challenge_scalar()
        z = transcript.challenge_scalar()

        eval_scalar, deg_scalars, zm_scalars = _eval_and_quotient_scalars(
            y, x, z, point, spec)

        # f = z * poly + q_hat + [eval_scalar * eval at coeff 0]
        #     + sum_k (deg_k + zm_k) * q_k
        eval_pt = FElt(fd.to_int(spec, remainder[..., 0]), spec)
        z_dev = fd.scalar_to_device(spec, z.v)
        f = fd.fmul(spec, poly, jnp.broadcast_to(z_dev[:, None], poly.shape))
        f = fd.fadd(spec, f, q_hat)
        c0 = fd.scalar_to_device(spec, (eval_scalar * eval_pt).v)
        f = f.at[:, 0].set(fd.fadd(spec, f[:, 0], c0))
        for k, q in enumerate(quotients):
            s = fd.scalar_to_device(spec, (deg_scalars[k] + zm_scalars[k]).v)
            padded = jnp.concatenate(
                [fd.fmul(spec, q, jnp.broadcast_to(s[:, None], q.shape)),
                 fd.zeros(spec, (N - (1 << k),))], axis=-1)
            f = fd.fadd(spec, f, padded)

        # pi = [q_f(tau) * tau^1] where q_f = f / (X - x) (f(x) == 0)
        pi = self._open_shifted(f, x)
        return ZeromorphProof(pi, q_hat_com, q_k_com)

    def _open_shifted(self, f: jnp.ndarray, x: FElt) -> G1Affine:
        n = f.shape[-1]
        x_dev = fd.scalar_to_device(FR, x.v)
        xinv_dev = fd.scalar_to_device(FR, pow(x.v, -1, FR.p))
        upow = _powers_device(FR, x_dev, n)
        uinv_pow = _powers_device(FR, xinv_dev, n)
        q = _quotient_coeffs(FR, f, upow, uinv_pow)
        # commit against tau^{1..n-1} (shift-1 SRS slice)
        X, Y, Z = self.pk.g1_jac
        nq = q.shape[-1]
        pts = (X[..., 1:1 + nq], Y[..., 1:1 + nq], Z[..., 1:1 + nq])
        return _msm_jac(pts, q)

    # -- verification -------------------------------------------------------------
    def verify(self, proof: ZeromorphProof, transcript: Transcript,
               opening_point: Sequence[FElt], opening: FElt,
               commitment: ZeromorphCommitment) -> None:
        spec = self.spec
        point = list(opening_point)
        transcript.append_protocol_name(self.protocol_name())
        for c in proof.q_k_com:
            transcript.append_point(None if c.is_infinity else c)
        y = transcript.challenge_scalar()
        transcript.append_point(proof.q_hat_com)
        x = transcript.challenge_scalar()
        z = transcript.challenge_scalar()

        eval_scalar, deg_scalars, zm_scalars = _eval_and_quotient_scalars(
            y, x, z, point, spec)
        q_scalars = [d + m for d, m in zip(deg_scalars, zm_scalars)]
        scalars = ([FElt(1, spec), z, eval_scalar * opening] + q_scalars)
        bases = [proof.q_hat_com, commitment.point, self.vk.g1] + proof.q_k_com
        zeta_z = g1_msm_host(bases, [s.v for s in scalars])

        # e(zeta_z, -g2^{tau^S}) * e(pi, g2^{tau - x}) == 1
        g2_tau_minus_x = (G2Affine.generator().mul((-x.v) % spec.p)
                          .add(self.vk.beta_g2))
        assert pairing_product_is_one([
            (zeta_z.neg(), self.tau_shift_g2),
            (proof.pi, g2_tau_minus_x),
        ]), "Zeromorph pairing check failed"
