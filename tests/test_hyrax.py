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
