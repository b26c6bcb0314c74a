"""Zeromorph PCS roundtrip (zeromorph.rs:487-611 e2e tests)."""
import random

from jolt_tpu.commitment.zeromorph import Zeromorph
from jolt_tpu.field import fr, fr_spec
from jolt_tpu.poly import mle
from jolt_tpu.transcript import Transcript

RNG = random.Random(909)
FR = fr_spec()


def test_zeromorph_open_verify():
    pcs = Zeromorph.setup(8)
    ints = [RNG.randrange(FR.p) for _ in range(8)]
    poly = mle.mle_from_ints(FR, ints)
    point = [fr(RNG.randrange(FR.p)) for _ in range(3)]
    y = mle.evaluate_host([fr(v) for v in ints], point)

    com = pcs.commit(poly)
    pt = Transcript(b"zm")
    proof = pcs.prove(poly, point, pt)

    vt = Transcript(b"zm")
    vt.compare_to(pt)
    pcs.verify(proof, vt, point, y, com)

    try:
        pcs.verify(proof, Transcript(b"zm"), point, y + fr(1), com)
        raise SystemExit("tampered zeromorph opening must fail")
    except AssertionError:
        pass


def _roundtrip(n_vars: int, seed: int) -> None:
    """Commit/open/verify at 2^n_vars (zeromorph.rs:487-611's
    small/larger e2e sweep)."""
    rng = random.Random(seed)
    n = 1 << n_vars
    pcs = Zeromorph.setup(n)
    ints = [rng.randrange(FR.p) for _ in range(n)]
    poly = mle.mle_from_ints(FR, ints)
    point = [fr(rng.randrange(FR.p)) for _ in range(n_vars)]
    y = mle.evaluate_host([fr(v) for v in ints], point)
    com = pcs.commit(poly)
    pt = Transcript(b"zm")
    proof = pcs.prove(poly, point, pt)
    vt = Transcript(b"zm")
    vt.compare_to(pt)
    pcs.verify(proof, vt, point, y, com)


def test_zeromorph_small():
    """Degree edge: a single-variable polynomial (2 coefficients)."""
    _roundtrip(1, 11)


def test_zeromorph_larger():
    _roundtrip(6, 12)


def test_zeromorph_batch_commit_shapes():
    """batch_commit over mixed contents matches per-poly commit bytes."""
    n = 16
    pcs = Zeromorph.setup(n)
    rng = random.Random(13)
    polys = [mle.mle_from_ints(FR, [rng.randrange(FR.p) for _ in range(n)])
             for _ in range(3)]
    batched = pcs.batch_commit(polys)
    singles = [pcs.commit(p) for p in polys]
    for b, s in zip(batched, singles):
        assert b == s, "batch_commit disagrees with commit"


def test_zeromorph_tampered_proof_point_rejected():
    """A corrupted proof element (not just the claimed opening) must fail
    the pairing check (mirrors hyperkzg.rs:656-804's negative case)."""
    rng = random.Random(14)
    n = 8
    pcs = Zeromorph.setup(n)
    ints = [rng.randrange(FR.p) for _ in range(n)]
    poly = mle.mle_from_ints(FR, ints)
    point = [fr(rng.randrange(FR.p)) for _ in range(3)]
    y = mle.evaluate_host([fr(v) for v in ints], point)
    com = pcs.commit(poly)
    proof = pcs.prove(poly, point, Transcript(b"zm"))
    from jolt_tpu.curve.bn254 import G1Affine
    bad = type(proof)(pi=G1Affine.generator(), q_hat_com=proof.q_hat_com,
                      q_k_com=proof.q_k_com)
    try:
        pcs.verify(bad, Transcript(b"zm"), point, y, com)
        raise SystemExit("tampered zeromorph proof point must fail")
    except AssertionError:
        pass
