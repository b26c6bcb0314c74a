"""Batched GKR grand products (Thaler'13 layered circuits).

Reference semantics: jolt-core/src/subprotocols/grand_product.rs —
interleaved [L0, R0, L1, R1, ...] layers (grand_product.rs:252-260), product
tree construction (423-446), per-layer batched cubic sumcheck with
least-significant-variable binding (297-396), claim folding with a per-layer
challenge (199-251), and verification that replays eq(r_gp, rev(r_sumcheck))
(122-182).

TPU-native shape: a batch of B circuits over 2^k leaves is ONE limb tensor
[NUM_LIMBS, B, 2^k]; every tree level is a single fused pairwise-product
kernel; every sumcheck round is one fused kernel producing the cubic's
evaluations at t = 0, 2, 3 (t = 1 comes from the previous claim, as in the
reference).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..poly.mle import bind_bot, eq_evals_device
from ..poly.unipoly import CompressedUniPoly, UniPoly
from ..transcript import Transcript
from .sumcheck import SumcheckInstanceProof


@dataclass
class BatchedGrandProductLayerProof:
    proof: SumcheckInstanceProof
    left_claims: list[FElt]
    right_claims: list[FElt]


@dataclass
class BatchedGrandProductProof:
    layers: list[BatchedGrandProductLayerProof]
    quark: object | None = None  # QuarkGrandProductProof in the hybrid scheme


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=0)
def _tree_level(spec: FieldSpec, layer: jnp.ndarray) -> jnp.ndarray:
    """One product-tree level: out[i] = layer[2i] * layer[2i+1]."""
    return fd.fmul(spec, layer[..., 0::2], layer[..., 1::2])


def _bcast_coeffs(coeffs: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """coeffs [L, B] -> broadcast to [L, B, m]."""
    return jnp.broadcast_to(coeffs[:, :, None], like.shape)


@partial(jax.jit, static_argnums=0)
def _gp_cubic_evals(spec: FieldSpec, layer: jnp.ndarray, eq: jnp.ndarray,
                    coeffs: jnp.ndarray) -> jnp.ndarray:
    """Cubic round-poly evaluations at t = 0, 2, 3 -> [L, 3].

    layer: [L, B, 4m] interleaved; eq: [L, 2m]; coeffs: [L, B].
    Computes sum_i eq_t(i) * sum_b coeff_b * left_t(b,i) * right_t(b,i)
    with the coefficient folded into `left` (one fewer mul, as in
    grand_product.rs:363-390 — order of operations preserved mod p).
    On TPU, big layers take the fully-fused Pallas round kernel.
    """
    m = layer.shape[-1] // 4
    if layer.ndim == 3 and m >= 512 and m % 512 == 0 and fd._pallas_backend():
        from ..field.pallas_mont import gp_cubic_evals_pallas
        return gp_cubic_evals_pallas(spec, layer, eq, coeffs)
    l0, r0 = layer[..., 0::4], layer[..., 1::4]
    l1, r1 = layer[..., 2::4], layer[..., 3::4]
    cl0 = fd.fmul(spec, _bcast_coeffs(coeffs, l0), l0)
    cl1 = fd.fmul(spec, _bcast_coeffs(coeffs, l1), l1)
    m_l = fd.fsub(spec, cl1, cl0)
    m_r = fd.fsub(spec, r1, r0)
    le2 = fd.fadd(spec, cl1, m_l)
    le3 = fd.fadd(spec, le2, m_l)
    re2 = fd.fadd(spec, r1, m_r)
    re3 = fd.fadd(spec, re2, m_r)

    s0 = fd.fsum(spec, fd.fmul(spec, cl0, r0), axis=0)   # [L, m]
    s2 = fd.fsum(spec, fd.fmul(spec, le2, re2), axis=0)
    s3 = fd.fsum(spec, fd.fmul(spec, le3, re3), axis=0)

    eq0, eq1 = eq[..., 0::2], eq[..., 1::2]
    m_eq = fd.fsub(spec, eq1, eq0)
    eqe2 = fd.fadd(spec, eq1, m_eq)
    eqe3 = fd.fadd(spec, eqe2, m_eq)

    e0 = fd.fsum(spec, fd.fmul(spec, eq0, s0), axis=0)
    e2 = fd.fsum(spec, fd.fmul(spec, eqe2, s2), axis=0)
    e3 = fd.fsum(spec, fd.fmul(spec, eqe3, s3), axis=0)
    return jnp.stack([e0, e2, e3], axis=1)               # [L, 3]


@partial(jax.jit, static_argnums=0)
def _gp_bind(spec: FieldSpec, layer: jnp.ndarray, eq: jnp.ndarray,
             r: jnp.ndarray):
    """Bind the bottom variable of the interleaved layer + eq poly.

    Preserves interleaving (grand_product.rs:297-319): pairs (4i, 4i+2)
    become the new left nodes, (4i+1, 4i+3) the new right nodes.
    On TPU, big layers take the fused Pallas bind kernel.
    """
    m = layer.shape[-1] // 4
    if layer.ndim == 3 and m >= 512 and m % 512 == 0 and fd._pallas_backend():
        from ..field.pallas_mont import gp_bind_pallas
        return gp_bind_pallas(spec, layer, eq, r)
    l0, r0 = layer[..., 0::4], layer[..., 1::4]
    l1, r1 = layer[..., 2::4], layer[..., 3::4]
    rb = jnp.broadcast_to(r.reshape((fd.L,) + (1,) * (layer.ndim - 1)), l0.shape)
    new_l = fd.fadd(spec, l0, fd.fmul(spec, rb, fd.fsub(spec, l1, l0)))
    new_r = fd.fadd(spec, r0, fd.fmul(spec, rb, fd.fsub(spec, r1, r0)))
    new_layer = jnp.stack([new_l, new_r], axis=-1).reshape(layer.shape[:-1]
                                                           + (layer.shape[-1] // 2,))
    return new_layer, bind_bot(spec, eq, r)


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------

class BatchedDenseGrandProduct:
    """B independent grand products over 2^k leaves, proved jointly."""

    def __init__(self, layers: list[jnp.ndarray], spec: FieldSpec):
        self.layers = layers  # layers[0] = leaves [L, B, n] ... top [L, B, 2]
        self.spec = spec

    @staticmethod
    def construct(leaves: jnp.ndarray, spec: FieldSpec | None = None,
                  mesh=None) -> "BatchedDenseGrandProduct":
        """With `mesh`, the hypercube axis of every big tree level is sharded
        across the device mesh; the round kernels stay ordinary jits and XLA
        partitions the local folds + inserts the cross-chip reductions for
        the tiny [L, 3] round evaluations.  Small tail layers replicate."""
        spec = spec or fr_spec()
        if mesh is not None:
            from ..parallel.sharding import maybe_shard
            leaves = maybe_shard(mesh, leaves)
        layers = [leaves]
        while layers[-1].shape[-1] > 2:
            layers.append(_tree_level(spec, layers[-1]))
        if mesh is not None:
            from ..parallel.sharding import shard_gp_layers
            layers = shard_gp_layers(mesh, layers)
        return BatchedDenseGrandProduct(layers, spec)

    def num_layers(self) -> int:
        return len(self.layers)

    def claims(self) -> list[FElt]:
        top = self.layers[-1]
        prods = fd.fmul(self.spec, top[..., 0], top[..., 1])
        return [FElt(int(v), self.spec)
                for v in fd.device_to_ints(self.spec, prods).tolist()]

    def prove(self, transcript: Transcript
              ) -> tuple[BatchedGrandProductProof, list[FElt]]:
        claims = self.claims()
        layer_proofs, r_grand_product, _ = _prove_dense_layers(
            self.spec, self.layers, claims, [], transcript)
        return BatchedGrandProductProof(layer_proofs), r_grand_product


def _prove_dense_layers(spec: FieldSpec, layers: list[jnp.ndarray],
                        claims: list[FElt], r_grand_product: list[FElt],
                        transcript: Transcript):
    """Prove multiplication-gate layers top-down (grand_product.rs:199-251).

    Returns (layer_proofs, r_grand_product, claims) after folding each
    layer's left/right claims with a fresh challenge.
    """
    layer_proofs: list[BatchedGrandProductLayerProof] = []
    for layer in reversed(layers):
        coeffs = transcript.challenge_vector(len(claims))
        joint_claim = FElt(0, spec)
        for c, co in zip(claims, coeffs):
            joint_claim = joint_claim + c * co
        coeffs_dev = jnp.stack(
            [fd.scalar_to_device(spec, c.v) for c in coeffs], axis=1)

        eq = eq_evals_device(
            spec, [fd.scalar_to_device(spec, x.v) for x in r_grand_product])
        num_rounds = len(r_grand_product)

        previous_claim = joint_claim
        r_sumcheck: list[FElt] = []
        compressed: list[CompressedUniPoly] = []
        bound = layer
        for _ in range(num_rounds):
            e023 = _gp_cubic_evals(spec, bound, eq, coeffs_dev)
            ints = fd.device_to_ints(spec, e023).tolist()
            e0, e2, e3 = (FElt(int(v), spec) for v in ints)
            round_poly = UniPoly.from_evals([e0, previous_claim - e0, e2, e3])
            cpoly = round_poly.compress()
            cpoly.append_to_transcript(transcript)
            r_j = transcript.challenge_scalar()
            r_sumcheck.append(r_j)
            bound, eq = _gp_bind(spec, bound, eq,
                                 fd.scalar_to_device(spec, r_j.v))
            previous_claim = round_poly.evaluate(r_j)
            compressed.append(cpoly)

        finals = fd.device_to_ints(spec, bound)
        left_claims = [FElt(int(v), spec) for v in finals[:, 0].tolist()]
        right_claims = [FElt(int(v), spec) for v in finals[:, 1].tolist()]

        for lc, rc in zip(left_claims, right_claims):
            transcript.append_scalar(lc)
            transcript.append_scalar(rc)

        r_grand_product = list(reversed(r_sumcheck))
        r_layer = transcript.challenge_scalar()
        claims = [lc + r_layer * (rc - lc)
                  for lc, rc in zip(left_claims, right_claims)]
        r_grand_product.append(r_layer)

        layer_proofs.append(BatchedGrandProductLayerProof(
            SumcheckInstanceProof(compressed), left_claims, right_claims))
    return layer_proofs, r_grand_product, claims


# ---------------------------------------------------------------------------
# toggled grand product (Lasso read/write multisets, grand_product.rs:1049-1546)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=0)
def _toggle_values(spec: FieldSpec, flags: jnp.ndarray, fingerprints: jnp.ndarray
                   ) -> jnp.ndarray:
    """Toggle-gate outputs: flag * fp + 1 - flag; flags [L,m,T] broadcast to
    the read/write pairs of fingerprints [L,2m,T]."""
    f2 = jnp.repeat(flags, 2, axis=1)
    one = fd.ones(spec, f2.shape[1:])
    return fd.fadd(spec, fd.fmul(spec, f2, fingerprints), fd.fsub(spec, one, f2))


@partial(jax.jit, static_argnums=0)
def _toggle_cubic_evals(spec: FieldSpec, flags: jnp.ndarray,
                        fingerprints: jnp.ndarray, eq: jnp.ndarray,
                        coeffs: jnp.ndarray) -> jnp.ndarray:
    """Toggle-layer round evals at t = 0, 2, 3 (grand_product.rs:1216-1360).

    sum_b coeff_b * sum_i eq_t(i) * (flag_t(b,i) * fp_t(b,i) + 1 - flag_t(b,i));
    pairs (2i, 2i+1) on the last axis; flags are per-memory (b//2).
    """
    f2 = jnp.repeat(flags, 2, axis=1)              # [L, 2m, n]
    one = fd.ones(spec, (f2.shape[1], f2.shape[2] // 2))

    def pair(t):
        return t[..., 0::2], t[..., 1::2]

    f0, f1 = pair(f2)
    p0, p1 = pair(fingerprints)
    e0, e1 = pair(eq)
    m_f = fd.fsub(spec, f1, f0)
    m_p = fd.fsub(spec, p1, p0)
    m_e = fd.fsub(spec, e1, e0)
    out = []
    ft, pt, et = f0, p0, e0
    for t in (0, 2, 3):
        if t == 2:
            ft = fd.fadd(spec, f1, m_f)
            pt = fd.fadd(spec, p1, m_p)
            et = fd.fadd(spec, e1, m_e)
        elif t == 3:
            ft = fd.fadd(spec, ft, m_f)
            pt = fd.fadd(spec, pt, m_p)
            et = fd.fadd(spec, et, m_e)
        gate = fd.fadd(spec, fd.fmul(spec, ft, pt), fd.fsub(spec, one, ft))
        weighted = fd.fmul(spec, _bcast_coeffs(coeffs, gate), gate)
        per_i = fd.fsum(spec, weighted, axis=0)            # [L, n/2]
        out.append(fd.fsum(spec, fd.fmul(spec, et, per_i), axis=-1))
    return jnp.stack(out, axis=1)


@partial(jax.jit, static_argnums=0)
def _toggle_bind(spec: FieldSpec, flags: jnp.ndarray, fingerprints: jnp.ndarray,
                 eq: jnp.ndarray, r: jnp.ndarray):
    """Bottom-bind flags/fingerprints (NON-interleaved pairs) + eq."""
    def bb(t):
        lo, hi = t[..., 0::2], t[..., 1::2]
        rb = jnp.broadcast_to(r.reshape((fd.L,) + (1,) * (t.ndim - 1)), lo.shape)
        return fd.fadd(spec, lo, fd.fmul(spec, rb, fd.fsub(spec, hi, lo)))

    return bb(flags), bb(fingerprints), bb(eq)


class ToggledBatchedGrandProduct:
    """Flag-gated grand product: bottom layer computes flag*fp + 1 - flag.

    The reference uses sparse flag-index lists (grand_product.rs:1049-1421);
    here flags are DENSE 0/1 Montgomery tensors — masked dense compute with
    identical transcript bytes.
    """

    def __init__(self, flags: jnp.ndarray, fingerprints: jnp.ndarray,
                 spec: FieldSpec | None = None):
        self.spec = spec or fr_spec()
        self.flags = flags                # [L, m, T]
        self.fingerprints = fingerprints  # [L, 2m, T]
        values = _toggle_values(self.spec, flags, fingerprints)
        self.layers = [values]
        while self.layers[-1].shape[-1] > 2:
            self.layers.append(_tree_level(self.spec, self.layers[-1]))

    @staticmethod
    def construct(leaves, spec: FieldSpec | None = None):
        flags, fingerprints = leaves
        return ToggledBatchedGrandProduct(flags, fingerprints, spec)

    def claims(self) -> list[FElt]:
        top = self.layers[-1]
        prods = fd.fmul(self.spec, top[..., 0], top[..., 1])
        return [FElt(int(v), self.spec)
                for v in fd.device_to_ints(self.spec, prods).tolist()]

    def prove(self, transcript: Transcript
              ) -> tuple[BatchedGrandProductProof, list[FElt]]:
        spec = self.spec
        claims = self.claims()
        layer_proofs, r_grand_product, claims = _prove_dense_layers(
            spec, self.layers, claims, [], transcript)

        # toggle layer (grand_product.rs:1422-1474): log T rounds, no r_layer
        coeffs = transcript.challenge_vector(len(claims))
        joint_claim = FElt(0, spec)
        for c, co in zip(claims, coeffs):
            joint_claim = joint_claim + c * co
        coeffs_dev = jnp.stack(
            [fd.scalar_to_device(spec, c.v) for c in coeffs], axis=1)
        eq = eq_evals_device(
            spec, [fd.scalar_to_device(spec, x.v) for x in r_grand_product])

        flags, fps = self.flags, self.fingerprints
        previous_claim = joint_claim
        r_sumcheck: list[FElt] = []
        compressed: list[CompressedUniPoly] = []
        num_rounds = len(r_grand_product)
        for _ in range(num_rounds):
            e023 = _toggle_cubic_evals(spec, flags, fps, eq, coeffs_dev)
            ints = fd.device_to_ints(spec, e023).tolist()
            e0, e2, e3 = (FElt(int(v), spec) for v in ints)
            round_poly = UniPoly.from_evals([e0, previous_claim - e0, e2, e3])
            cpoly = round_poly.compress()
            cpoly.append_to_transcript(transcript)
            r_j = transcript.challenge_scalar()
            r_sumcheck.append(r_j)
            flags, fps, eq = _toggle_bind(spec, flags, fps, eq,
                                          fd.scalar_to_device(spec, r_j.v))
            previous_claim = round_poly.evaluate(r_j)
            compressed.append(cpoly)

        flag_vals = fd.device_to_ints(spec, flags[..., 0]).tolist()
        fp_vals = fd.device_to_ints(spec, fps[..., 0]).tolist()
        left_claims = [FElt(int(flag_vals[b // 2]), spec)
                       for b in range(len(fp_vals))]
        right_claims = [FElt(int(v), spec) for v in fp_vals]
        for lc, rc in zip(left_claims, right_claims):
            transcript.append_scalar(lc)
            transcript.append_scalar(rc)

        r_grand_product = list(reversed(r_sumcheck))
        layer_proofs.append(BatchedGrandProductLayerProof(
            SumcheckInstanceProof(compressed), left_claims, right_claims))
        return BatchedGrandProductProof(layer_proofs), r_grand_product


def toggled_verify_sumcheck_claim(layer_proof, coeffs, sumcheck_claim, eq_eval,
                                  claims, r_grand_product, transcript,
                                  layer_index: int, num_layers: int):
    """Toggled GP claim check (grand_product.rs:1486-1546)."""
    spec = sumcheck_claim.spec
    one = FElt(1, spec)
    if layer_index != num_layers - 1:
        return default_verify_sumcheck_claim(
            layer_proof, coeffs, sumcheck_claim, eq_eval, claims,
            r_grand_product, transcript, layer_index, num_layers)
    expected = FElt(0, spec)
    for co, fl, fp in zip(coeffs, layer_proof.left_claims,
                          layer_proof.right_claims):
        expected = expected + co * eq_eval * (fl * fp + one - fl)
    assert expected == sumcheck_claim, "toggle layer claim mismatch"
    new_claims = [fl * fp + one - fl
                  for fl, fp in zip(layer_proof.left_claims,
                                    layer_proof.right_claims)]
    return new_claims, r_grand_product


# ---------------------------------------------------------------------------
# verifier (host)
# ---------------------------------------------------------------------------

def default_verify_sumcheck_claim(layer_proof: BatchedGrandProductLayerProof,
                                  coeffs: list[FElt], sumcheck_claim: FElt,
                                  eq_eval: FElt, claims: list[FElt],
                                  r_grand_product: list[FElt],
                                  transcript: Transcript,
                                  layer_index: int = 0, num_layers: int = 0
                                  ) -> tuple[list[FElt], list[FElt]]:
    """Multiplication-gate layer claim check (grand_product.rs:89-122)."""
    spec = sumcheck_claim.spec
    expected = FElt(0, spec)
    for co, lc, rc in zip(coeffs, layer_proof.left_claims,
                          layer_proof.right_claims):
        expected = expected + co * lc * rc * eq_eval
    assert expected == sumcheck_claim, "grand product layer claim mismatch"

    r_layer = transcript.challenge_scalar()
    new_claims = [lc + r_layer * (rc - lc)
                  for lc, rc in zip(layer_proof.left_claims,
                                    layer_proof.right_claims)]
    return new_claims, r_grand_product + [r_layer]


def verify_grand_product(proof: BatchedGrandProductProof,
                         claims: Sequence[FElt],
                         transcript: Transcript,
                         r_start: Sequence[FElt] = (),
                         verify_sumcheck_claim: Callable = default_verify_sumcheck_claim,
                         ) -> tuple[list[FElt], list[FElt]]:
    """Layer-by-layer verification (grand_product.rs:122-182).

    Returns (final claims = leaf-MLE evaluations, r_grand_product).
    """
    claims_to_verify = list(claims)
    r_grand_product = list(r_start)
    fixed_at_start = len(r_start)
    spec = claims_to_verify[0].spec
    one = FElt(1, spec)

    for layer_index, layer_proof in enumerate(proof.layers):
        coeffs = transcript.challenge_vector(len(claims_to_verify))
        joint_claim = FElt(0, spec)
        for c, co in zip(claims_to_verify, coeffs):
            joint_claim = joint_claim + c * co

        sumcheck_claim, r_sumcheck = layer_proof.proof.verify(
            joint_claim, layer_index + fixed_at_start, 3, transcript)
        assert len(claims_to_verify) == len(layer_proof.left_claims)

        for lc, rc in zip(layer_proof.left_claims, layer_proof.right_claims):
            transcript.append_scalar(lc)
            transcript.append_scalar(rc)

        assert len(r_grand_product) == len(r_sumcheck)
        eq_eval = one
        for r_gp, r_sc in zip(r_grand_product, reversed(r_sumcheck)):
            eq_eval = eq_eval * (r_gp * r_sc + (one - r_gp) * (one - r_sc))

        r_grand_product = list(reversed(r_sumcheck))
        claims_to_verify, r_grand_product = verify_sumcheck_claim(
            layer_proof, coeffs, sumcheck_claim, eq_eval, claims_to_verify,
            r_grand_product, transcript, layer_index, len(proof.layers))

    return claims_to_verify, r_grand_product
