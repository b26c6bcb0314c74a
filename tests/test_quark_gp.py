"""Quarks/GKR hybrid grand product prove+verify roundtrips.

Mirrors grand_product_quarks.rs:623-713 (quark_e2e / quark_hybrid_e2e),
with the Mock PCS standing in for Zeromorph (PCS-independent protocol).
"""
import numpy as np

from jolt_tpu.commitment import MockCommitmentScheme
from jolt_tpu.field import FElt, fr_spec
from jolt_tpu.field import device as fd
from jolt_tpu.poly.opening_proof import (ProverOpeningAccumulator,
                                         VerifierOpeningAccumulator)
from jolt_tpu.subprotocols.grand_product_quarks import (QuarkGrandProduct,
                                                        quark_prove,
                                                        quark_verify)
from jolt_tpu.transcript import Transcript


def _random_leaves(spec, B, n, seed=9):
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, 1 << 63, size=(B, n), dtype=np.uint64)
    import jax.numpy as jnp
    leaves = fd.to_mont_device(spec, jnp.asarray(fd.pack_u64(vals)))
    products = []
    for b in range(B):
        p = 1
        for v in vals[b].tolist():
            p = (p * int(v)) % spec.p
        products.append(FElt(p, spec))
    return leaves, products


def test_quark_e2e():
    spec = fr_spec()
    leaves, known_products = _random_leaves(spec, 2, 1 << 5)
    pcs = MockCommitmentScheme(spec)

    transcript = Transcript(b"test_transcript")
    pacc = ProverOpeningAccumulator(spec)
    proof, _, _ = quark_prove(leaves, pcs, pacc, transcript, spec)
    batched = pacc.reduce_and_prove(pcs, transcript)

    transcript = Transcript(b"test_transcript")
    vacc = VerifierOpeningAccumulator(pcs, spec)
    vacc.compare_to(pacc)
    quark_verify(proof, known_products, vacc, transcript, spec)
    vacc.reduce_and_verify(pcs, batched, transcript)


def test_quark_hybrid_e2e():
    spec = fr_spec()
    leaves, known_products = _random_leaves(spec, 2, 1 << 6)
    pcs = MockCommitmentScheme(spec)

    transcript = Transcript(b"test_transcript")
    pacc = ProverOpeningAccumulator(spec)
    gp = QuarkGrandProduct.construct(leaves, spec)
    assert [c.v for c in gp.claims()] == [c.v for c in known_products]
    proof, _ = gp.prove_grand_product(pacc, transcript, pcs)
    assert proof.quark is not None
    assert len(proof.layers) == 4
    batched = pacc.reduce_and_prove(pcs, transcript)

    transcript = Transcript(b"test_transcript")
    vacc = VerifierOpeningAccumulator(pcs, spec)
    vacc.compare_to(pacc)
    QuarkGrandProduct.verify_grand_product(proof, known_products, vacc,
                                           transcript, spec)
    vacc.reduce_and_verify(pcs, batched, transcript)


def test_quark_hybrid_small_depth():
    """leave_depth <= 4: all-but-one layers are GKR, quark poly size 2."""
    spec = fr_spec()
    leaves, known_products = _random_leaves(spec, 2, 1 << 3, seed=11)
    pcs = MockCommitmentScheme(spec)

    transcript = Transcript(b"test_transcript")
    pacc = ProverOpeningAccumulator(spec)
    gp = QuarkGrandProduct.construct(leaves, spec)
    proof, _ = gp.prove_grand_product(pacc, transcript, pcs)
    batched = pacc.reduce_and_prove(pcs, transcript)

    transcript = Transcript(b"test_transcript")
    vacc = VerifierOpeningAccumulator(pcs, spec)
    vacc.compare_to(pacc)
    QuarkGrandProduct.verify_grand_product(proof, known_products, vacc,
                                           transcript, spec)
    vacc.reduce_and_verify(pcs, batched, transcript)
