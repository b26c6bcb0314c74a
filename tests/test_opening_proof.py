"""Opening accumulator roundtrip with the mock PCS (opening_proof.rs tests)."""
import random

from jolt_tpu.commitment import MockCommitmentScheme
from jolt_tpu.field import FElt, fr, fr_spec
from jolt_tpu.field import device as fd
from jolt_tpu.poly import mle
from jolt_tpu.poly.opening_proof import (ProverOpeningAccumulator,
                                         VerifierOpeningAccumulator)
from jolt_tpu.transcript import Transcript

RNG = random.Random(99)


def _rand_poly(n):
    ints = [RNG.randrange(fr_spec().p) for _ in range(n)]
    return ints, mle.mle_from_ints(fr_spec(), ints)


def test_opening_accumulator_roundtrip():
    spec = fr_spec()
    pcs = MockCommitmentScheme(spec)

    pt = Transcript(b"openings")
    acc = ProverOpeningAccumulator(spec)

    # group 1: three polys of 8 entries opened at a 3-var point
    point_a = [fr(RNG.randrange(spec.p)) for _ in range(3)]
    eq_a = mle.eq_evals_device(spec, [fd.scalar_to_device(spec, x.v) for x in point_a])
    polys_a, devs_a, claims_a = [], [], []
    for _ in range(3):
        ints, dev = _rand_poly(8)
        polys_a.append(ints)
        devs_a.append(dev)
        claims_a.append(mle.evaluate_host([fr(v) for v in ints], point_a))
    acc.append(devs_a, eq_a, point_a, claims_a, pt)

    # group 2: one poly of 4 entries opened at a 2-var point
    point_b = [fr(RNG.randrange(spec.p)) for _ in range(2)]
    eq_b = mle.eq_evals_device(spec, [fd.scalar_to_device(spec, x.v) for x in point_b])
    ints_b, dev_b = _rand_poly(4)
    claim_b = mle.evaluate_host([fr(v) for v in ints_b], point_b)
    acc.append([dev_b], eq_b, point_b, [claim_b], pt)

    reduced = acc.reduce_and_prove(pcs, pt)

    # verifier
    vt = Transcript(b"openings")
    vt.compare_to(pt)
    vacc = VerifierOpeningAccumulator(pcs, spec)
    vacc.compare_to(acc)
    comms_a = pcs.batch_commit(devs_a)
    vacc.append(comms_a, point_a, claims_a, vt)
    vacc.append([pcs.commit(dev_b)], point_b, [claim_b], vt)
    vacc.reduce_and_verify(pcs, reduced, vt)

    # tampered claim must fail
    vt2 = Transcript(b"openings")
    vacc2 = VerifierOpeningAccumulator(pcs, spec)
    vacc2.append(comms_a, point_a,
                 [claims_a[0] + fr(1), claims_a[1], claims_a[2]], vt2)
    vacc2.append([pcs.commit(dev_b)], point_b, [claim_b], vt2)
    try:
        vacc2.reduce_and_verify(pcs, reduced, vt2)
        raise SystemExit("tampered opening should not verify")
    except AssertionError:
        pass
