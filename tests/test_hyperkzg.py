"""HyperKZG roundtrip + integration with the opening accumulator."""
import random

from jolt_tpu.commitment.hyperkzg import HyperKZG
from jolt_tpu.field import fr, fr_spec
from jolt_tpu.poly import mle
from jolt_tpu.transcript import Transcript

RNG = random.Random(77)
FR = fr_spec()


def _rand_poly(n):
    ints = [RNG.randrange(FR.p) for _ in range(n)]
    return ints, mle.mle_from_ints(FR, ints)


def test_hyperkzg_open_verify():
    pcs = HyperKZG.setup(8)
    ints, poly = _rand_poly(8)
    point = [fr(RNG.randrange(FR.p)) for _ in range(3)]
    y = mle.evaluate_host([fr(v) for v in ints], point)

    com = pcs.commit(poly)
    pt = Transcript(b"hkzg")
    proof = pcs.prove(poly, point, pt)

    vt = Transcript(b"hkzg")
    vt.compare_to(pt)
    pcs.verify(proof, vt, point, y, com)

    # tampered evaluation must fail
    vt2 = Transcript(b"hkzg")
    try:
        pcs.verify(proof, vt2, point, y + fr(1), com)
        raise SystemExit("tampered opening must not verify")
    except AssertionError:
        pass


def test_hyperkzg_with_opening_accumulator():
    from jolt_tpu.field import device as fd
    from jolt_tpu.poly.opening_proof import (ProverOpeningAccumulator,
                                             VerifierOpeningAccumulator)
    pcs = HyperKZG.setup(8)
    spec = FR
    pt = Transcript(b"acc")
    acc = ProverOpeningAccumulator(spec)

    point = [fr(RNG.randrange(spec.p)) for _ in range(3)]
    eq = mle.eq_evals_device(spec, [fd.scalar_to_device(spec, x.v) for x in point])
    ints1, p1 = _rand_poly(8)
    ints2, p2 = _rand_poly(8)
    c1 = mle.evaluate_host([fr(v) for v in ints1], point)
    c2 = mle.evaluate_host([fr(v) for v in ints2], point)
    acc.append([p1, p2], eq, point, [c1, c2], pt)
    reduced = acc.reduce_and_prove(pcs, pt)

    vt = Transcript(b"acc")
    vt.compare_to(pt)
    vacc = VerifierOpeningAccumulator(pcs, spec)
    vacc.append([pcs.commit(p1), pcs.commit(p2)], point, [c1, c2], vt)
    vacc.reduce_and_verify(pcs, reduced, vt)


def test_commit_grand_product_mode_equivalence():
    """CommitMode::GrandProduct == Default on mostly-ones vectors
    (mirrors kzg.rs:298-341 commit-mode tests)."""
    import jax.numpy as jnp
    import numpy as np
    from jolt_tpu.commitment.kzg import (kzg_commit, kzg_commit_grand_product,
                                         srs_setup)
    from jolt_tpu.field import fr_spec
    from jolt_tpu.field import device as fd

    spec = fr_spec()
    pk, _ = srs_setup(1 << 6)
    rng = np.random.default_rng(42)
    vals = rng.integers(1, 1 << 32, size=1 << 6, dtype=np.uint64)
    vals[rng.random(1 << 6) < 0.9] = 1          # 90% ones, as in the bench
    coeffs = fd.to_mont_device(spec, jnp.asarray(fd.pack_u64(vals)))
    a = kzg_commit(pk, coeffs)
    b = kzg_commit_grand_product(pk, coeffs)
    assert a.x == b.x and a.y == b.y and a.is_infinity == b.is_infinity
