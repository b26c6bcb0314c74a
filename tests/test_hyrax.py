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
