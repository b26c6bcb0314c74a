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
