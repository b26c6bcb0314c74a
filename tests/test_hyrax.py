"""Hyrax PCS roundtrip."""
import random

from jolt_tpu.commitment.hyrax import HyraxScheme
from jolt_tpu.field import fr, fr_spec
from jolt_tpu.poly import mle
from jolt_tpu.transcript import Transcript

RNG = random.Random(711)
FR = fr_spec()


def test_hyrax_open_verify():
    pcs = HyraxScheme.setup(16)
    ints = [RNG.randrange(FR.p) for _ in range(16)]
    poly = mle.mle_from_ints(FR, ints)
    point = [fr(RNG.randrange(FR.p)) for _ in range(4)]
    y = mle.evaluate_host([fr(v) for v in ints], point)

    com = pcs.commit(poly)
    pt = Transcript(b"hx")
    proof = pcs.prove(poly, point, pt)
    vt = Transcript(b"hx")
    vt.compare_to(pt)
    pcs.verify(proof, vt, point, y, com)

    try:
        pcs.verify(proof, Transcript(b"hx"), point, y + fr(1), com)
        raise SystemExit("bad hyrax opening must fail")
    except AssertionError:
        pass


def test_hyrax_batched_open_verify():
    """BatchedHyraxOpeningProof (hyrax.rs:359-505): K polys, one point,
    one joint RLC opening; verifier re-derives the RLC commitment
    homomorphically. Includes a tampered-opening rejection."""
    from jolt_tpu.commitment.base import BatchType
    from jolt_tpu.commitment.hyrax import BatchedHyraxOpeningProof

    pcs = HyraxScheme.setup(16)
    K, n = 3, 16
    all_ints = [[RNG.randrange(FR.p) for _ in range(n)] for _ in range(K)]
    polys = [mle.mle_from_ints(FR, ints) for ints in all_ints]
    point = [fr(RNG.randrange(FR.p)) for _ in range(4)]
    openings = [mle.evaluate_host([fr(v) for v in ints], point)
                for ints in all_ints]
    coms = [pcs.commit(p) for p in polys]

    pt = Transcript(b"hxb")
    proof = pcs.prove_batched(polys, point, openings, pt,
                              BatchType.SMALL)
    vt = Transcript(b"hxb")
    proof.verify(pcs, point, openings, coms, vt)
    vt.compare_to(pt)

    bad = list(openings)
    bad[1] = bad[1] + fr(1)
    try:
        proof.verify(pcs, point, bad, coms, Transcript(b"hxb"))
        raise SystemExit("tampered batched hyrax opening must fail")
    except AssertionError:
        pass


def _roundtrip(n_vars: int, seed: int, ratio: int = 1) -> None:
    rng = random.Random(seed)
    n = 1 << n_vars
    pcs = HyraxScheme.setup(n, ratio=ratio)
    ints = [rng.randrange(FR.p) for _ in range(n)]
    poly = mle.mle_from_ints(FR, ints)
    point = [fr(rng.randrange(FR.p)) for _ in range(n_vars)]
    y = mle.evaluate_host([fr(v) for v in ints], point)
    com = pcs.commit(poly, ratio=ratio)
    pt = Transcript(b"hx")
    proof = pcs.prove(poly, point, pt, ratio=ratio)
    vt = Transcript(b"hx")
    vt.compare_to(pt)
    pcs.verify(proof, vt, point, y, com, ratio=ratio)


def test_hyrax_small():
    """Degree edge: 2 variables (a 2x2 coefficient matrix)."""
    _roundtrip(2, 21)


def test_hyrax_larger():
    _roundtrip(6, 22)


def test_hyrax_odd_num_vars():
    """Odd variable count: matrix_dimensions splits unevenly
    (hyrax.rs:34-48) — covers the non-square row/col path."""
    _roundtrip(5, 23)


def test_hyrax_tampered_vmp_rejected():
    """Corrupting the vector-matrix product must break the derived-row
    commitment equation, not just the dot-product check."""
    rng = random.Random(24)
    n = 16
    pcs = HyraxScheme.setup(n)
    ints = [rng.randrange(FR.p) for _ in range(n)]
    poly = mle.mle_from_ints(FR, ints)
    point = [fr(rng.randrange(FR.p)) for _ in range(4)]
    y = mle.evaluate_host([fr(v) for v in ints], point)
    com = pcs.commit(poly)
    proof = pcs.prove(poly, point, Transcript(b"hx"))
    proof.vector_matrix_product[0] = \
        proof.vector_matrix_product[0] + fr(1)
    try:
        pcs.verify(proof, Transcript(b"hx"), point, y, com)
        raise SystemExit("tampered hyrax vector-matrix product must fail")
    except AssertionError:
        pass
