"""Timestamp range check (Haböck-style, reference: timestamp_range_check.rs).

Proves every read timestamp t_read[i][j] <= j (the global step counter) by
range-checking both t_read and (j - t_read) against the range [0, T): two
derived counter families per channel, all 6*7 + 1 = 43 same-length layers
batched into ONE dense grand product (the init/final "grand product" is a
no-op — its layers ride along in the same batch).

The openings + fingerprint claim checks here are ACTIVE (unlike the gutted
memory-checking variants): the verifier recomputes every leaf fingerprint
from the openings and matches them against the grand product claims.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..lasso.memory_checking import MultisetHashes
from ..lasso.surge import cumcount
from ..poly import mle
from ..subprotocols.grand_product import (BatchedDenseGrandProduct,
                                          BatchedGrandProductProof,
                                          verify_grand_product)
from ..transcript import Transcript
from .rv_trace import MEMORY_OPS_PER_INSTRUCTION

PROTOCOL_NAME = b"Timestamp Validity Proof"
NUM_CH = MEMORY_OPS_PER_INSTRUCTION  # 7


@dataclass
class TimestampRangeCheckPolynomials:
    read_cts_read_timestamp: jnp.ndarray       # [L, 7, T]
    read_cts_global_minus_read: jnp.ndarray    # [L, 7, T]
    final_cts_read_timestamp: jnp.ndarray      # [L, 7, T]
    final_cts_global_minus_read: jnp.ndarray   # [L, 7, T]

    def read_write_values(self):
        return ([fd.col(self.read_cts_read_timestamp, i) for i in range(NUM_CH)]
                + [fd.col(self.read_cts_global_minus_read, i) for i in range(NUM_CH)]
                + [fd.col(self.final_cts_read_timestamp, i) for i in range(NUM_CH)]
                + [fd.col(self.final_cts_global_minus_read, i) for i in range(NUM_CH)])


def generate_witness(read_timestamps: np.ndarray,
                     spec: FieldSpec | None = None
                     ) -> TimestampRangeCheckPolynomials:
    """Counter scans per channel and per family (timestamp_range_check.rs:115-231).

    read_timestamps: [7, T] u64 with t_read[i][j] <= j.
    """
    spec = spec or fr_spec()
    T = read_timestamps.shape[1]
    rc_rt = np.zeros((NUM_CH, T), dtype=np.uint64)
    rc_gmr = np.zeros((NUM_CH, T), dtype=np.uint64)
    fc_rt = np.zeros((NUM_CH, T), dtype=np.uint64)
    fc_gmr = np.zeros((NUM_CH, T), dtype=np.uint64)
    steps = np.arange(T, dtype=np.uint64)
    for i in range(NUM_CH):
        rt = read_timestamps[i]
        rc_rt[i], fc_rt[i] = cumcount(rt.astype(np.int64), T)
        gmr = (steps - rt).astype(np.int64)
        rc_gmr[i], fc_gmr[i] = cumcount(gmr, T)

    to_dev = lambda arr: fd.u64_to_mont_device(spec, arr)
    return TimestampRangeCheckPolynomials(
        read_cts_read_timestamp=to_dev(rc_rt),
        read_cts_global_minus_read=to_dev(rc_gmr),
        final_cts_read_timestamp=to_dev(fc_rt),
        final_cts_global_minus_read=to_dev(fc_gmr))


@partial(jax.jit, static_argnums=0)
def _ts_leaves(spec: FieldSpec, polys_rc_rt, polys_rc_gmr, polys_fc_rt,
               polys_fc_gmr, t_read, identity, gamma, tau):
    """All 43 leaf layers [L, 43, T] (timestamp_range_check.rs:260-365).

    Order: per channel i: [read0, write0, read1, write1]; then per channel:
    [final0, final1]; then init.
    """
    def b3(s, like):
        return jnp.broadcast_to(s.reshape((fd.L,) + (1,) * (like.ndim - 1)),
                                like.shape)

    g2 = fd.fmul(spec, gamma, gamma)
    layers = []
    for i in range(NUM_CH):
        rt = t_read[:, i]
        gmr = fd.fsub(spec, identity, rt)
        r0 = fd.fadd(spec,
                     fd.fadd(spec, fd.fmul(spec, polys_rc_rt[:, i], b3(g2, rt)),
                             fd.fmul(spec, rt, b3(gamma, rt))),
                     fd.fsub(spec, rt, b3(tau, rt)))
        w0 = fd.fadd(spec, r0, b3(g2, r0))
        r1 = fd.fadd(spec,
                     fd.fadd(spec, fd.fmul(spec, polys_rc_gmr[:, i], b3(g2, gmr)),
                             fd.fmul(spec, gmr, b3(gamma, gmr))),
                     fd.fsub(spec, gmr, b3(tau, gmr)))
        w1 = fd.fadd(spec, r1, b3(g2, r1))
        layers.extend([r0, w0, r1, w1])

    init = fd.fadd(spec, fd.fmul(spec, identity, b3(gamma, identity)),
                   fd.fsub(spec, identity, b3(tau, identity)))
    for i in range(NUM_CH):
        f0 = fd.fadd(spec, fd.fmul(spec, polys_fc_rt[:, i], b3(g2, init)), init)
        f1 = fd.fadd(spec, fd.fmul(spec, polys_fc_gmr[:, i], b3(g2, init)), init)
        layers.extend([f0, f1])
    layers.append(init)
    return jnp.stack(layers, axis=1)


@dataclass
class TimestampValidityProof:
    multiset_hashes: MultisetHashes
    openings: list[FElt]            # 28 read_write_values openings
    exogenous_openings: list[FElt]  # 7 t_read openings
    batched_grand_product: BatchedGrandProductProof
    identity_opening: FElt | None = None


def _check_multiset(h: MultisetHashes):
    for i in range(2 * NUM_CH):
        assert h.init_hashes[0] * h.write_hashes[i] == \
            h.final_hashes[i] * h.read_hashes[i], \
            f"timestamp multiset hashes don't match ({i})"


def prove_timestamp_validity(ts_polys: TimestampRangeCheckPolynomials,
                             rwm_polys, opening_accumulator,
                             transcript: Transcript,
                             spec: FieldSpec, mesh=None
                             ) -> TimestampValidityProof:
    gamma = transcript.challenge_scalar()
    tau = transcript.challenge_scalar()
    transcript.append_protocol_name(PROTOCOL_NAME)

    T = ts_polys.read_cts_read_timestamp.shape[-1]
    identity = fd.u64_to_mont_device(spec, np.arange(T, dtype=np.uint64))
    leaves = _ts_leaves(spec, ts_polys.read_cts_read_timestamp,
                        ts_polys.read_cts_global_minus_read,
                        ts_polys.final_cts_read_timestamp,
                        ts_polys.final_cts_global_minus_read,
                        rwm_polys.t_read, identity,
                        fd.scalar_to_device(spec, gamma.v),
                        fd.scalar_to_device(spec, tau.v))
    circuit = BatchedDenseGrandProduct.construct(leaves, spec, mesh=mesh)
    del leaves                 # the pair tree holds its own copies
    hashes_flat = circuit.claims()
    rw = hashes_flat[: 4 * NUM_CH]
    inf = hashes_flat[4 * NUM_CH:]
    multiset_hashes = MultisetHashes(rw[0::2], rw[1::2], [inf[-1]], inf[:-1])
    _check_multiset(multiset_hashes)
    multiset_hashes.append_to_transcript(transcript)

    gp_proof, r_grand_product = circuit.prove(transcript)

    # openings at r_grand_product (ACTIVE, timestamp_range_check.rs:595-660)
    eq_r = mle.eq_evals_device(spec, r_grand_product)
    rw_polys_list = ts_polys.read_write_values()
    t_read_list = [fd.col(rwm_polys.t_read, i) for i in range(NUM_CH)]
    all_polys = rw_polys_list + t_read_list
    openings = mle.evaluate_many_host(spec, all_polys, eq_r)
    opening_accumulator.append(all_polys, eq_r, r_grand_product, openings,
                               transcript)
    return TimestampValidityProof(multiset_hashes, openings[:4 * NUM_CH],
                                  openings[4 * NUM_CH:], gp_proof)


def verify_timestamp_validity(proof: TimestampValidityProof, commitments,
                              opening_accumulator, transcript: Transcript,
                              spec: FieldSpec) -> None:
    gamma = transcript.challenge_scalar()
    tau = transcript.challenge_scalar()
    transcript.append_protocol_name(PROTOCOL_NAME)

    _check_multiset(proof.multiset_hashes)
    proof.multiset_hashes.append_to_transcript(transcript)
    h = proof.multiset_hashes
    rw_hashes = [x for pair in zip(h.read_hashes, h.write_hashes)
                 for x in pair]
    if_hashes = list(h.final_hashes) + list(h.init_hashes)
    concatenated = rw_hashes + if_hashes
    claims, r_grand_product = verify_grand_product(
        proof.batched_grand_product, concatenated, transcript)

    if commitments is not None:
        opening_accumulator.append(
            commitments, r_grand_product,
            proof.openings + proof.exogenous_openings, transcript)

    # identity MLE at r (verifier-computed) + full fingerprint claim checks
    identity_eval = FElt(0, spec)
    n = len(r_grand_product)
    for i, rv in enumerate(r_grand_product):
        identity_eval = identity_eval + rv * (1 << (n - 1 - i))

    one = FElt(1, spec)
    rc_rt = proof.openings[0:NUM_CH]
    rc_gmr = proof.openings[NUM_CH:2 * NUM_CH]
    fc_rt = proof.openings[2 * NUM_CH:3 * NUM_CH]
    fc_gmr = proof.openings[3 * NUM_CH:4 * NUM_CH]
    t_read = proof.exogenous_openings

    def fp(a, v, t):
        return t * gamma * gamma + v * gamma + a - tau

    read_hashes, write_hashes, final_hashes = [], [], []
    for i in range(NUM_CH):
        gmr = identity_eval - t_read[i]
        read_hashes.append(fp(t_read[i], t_read[i], rc_rt[i]))
        read_hashes.append(fp(gmr, gmr, rc_gmr[i]))
        write_hashes.append(fp(t_read[i], t_read[i], rc_rt[i] + one))
        write_hashes.append(fp(gmr, gmr, rc_gmr[i] + one))
        final_hashes.append(fp(identity_eval, identity_eval, fc_rt[i]))
        final_hashes.append(fp(identity_eval, identity_eval, fc_gmr[i]))
    init_hash = fp(identity_eval, identity_eval, FElt(0, spec))

    expected = MultisetHashes(read_hashes, write_hashes, [init_hash],
                              final_hashes)
    exp_rw = [x for pair in zip(expected.read_hashes, expected.write_hashes)
              for x in pair]
    exp_if = expected.final_hashes + expected.init_hashes
    rw_claims = claims[: 4 * NUM_CH]
    if_claims = claims[4 * NUM_CH:]
    for c, f in zip(rw_claims, exp_rw):
        assert c == f, "timestamp read/write fingerprint mismatch"
    for c, f in zip(if_claims, exp_if):
        assert c == f, "timestamp init/final fingerprint mismatch"
