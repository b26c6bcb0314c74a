"""Device-resident Fiat-Shamir round machinery (shared by the GKR grand
products and the generic sumcheck provers).

Each sumcheck round's host round-trip (pull evals -> interpolate -> keccak
append -> challenge -> push bind scalar) costs ~10ms through the axon
tunnel.  These helpers keep the whole round on device: interpolation with a
precomputed inverse-Vandermonde, the 3 + framing keccak transcript events
(utils/keccak_device.py, bit-exact vs transcript.py), the challenge
reduction, and the next-claim Horner evaluation.  The host enqueues rounds
back-to-back (async dispatch) and pulls the compressed polys once per
layer/sumcheck, then replays the transcript to rebuild FElt challenges —
which doubles as a bit-exactness check of the device hash chain.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field import FieldSpec
from ..field import device as fd


@functools.lru_cache(maxsize=None)
def vinv_mont(spec: FieldSpec, npts: int) -> tuple:
    """Inverse Vandermonde for nodes 0..npts-1 as Montgomery ints (host).

    Interpolation through these nodes is what UniPoly.from_evals computes
    via Gaussian elimination — same unique polynomial."""
    p = spec.p
    n = npts
    V = [[pow(x, j, p) for j in range(n)] for x in range(n)]
    aug = [row[:] + [int(i == r) for i in range(n)]
           for r, row in enumerate(V)]
    for c in range(n):
        piv = next(r for r in range(c, n) if aug[r][c] % p)
        aug[c], aug[piv] = aug[piv], aug[c]
        inv = pow(aug[c][c], -1, p)
        aug[c] = [v * inv % p for v in aug[c]]
        for r in range(n):
            if r != c and aug[r][c]:
                f = aug[r][c]
                aug[r] = [(v - f * w) % p for v, w in zip(aug[r], aug[c])]
    return tuple(tuple(spec.to_mont(aug[r][n + c]) for c in range(n))
                 for r in range(n))


@functools.lru_cache(maxsize=None)
def transcript_const_words():
    from ..utils.keccak_device import message_payload_words
    return (np.asarray(message_payload_words(b"UniPoly_begin")),
            np.asarray(message_payload_words(b"UniPoly_end")))


def scalar_be_words(spec: FieldSpec, mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery [L] -> the scalar's 32-byte big-endian payload as LE
    uint32[8] words (transcript.rs:97-105 byte order)."""
    from ..utils.keccak_device import bswap32
    canon = fd.from_mont_device(spec, mont)                # [L] 16-bit limbs
    le_words = canon[0::2] | (canon[1::2] << 16)           # [8] LE value words
    return bswap32(le_words[::-1])


def words_to_mont(spec: FieldSpec, words: jnp.ndarray) -> jnp.ndarray:
    """Digest LE words (32-byte string) -> Montgomery limbs of the BE
    integer mod p (transcript.rs:146-153 + ark from_bytes semantics)."""
    from ..utils.keccak_device import bswap32
    s = bswap32(words[::-1])                               # value LE words
    limbs = jnp.stack([s[i // 2] >> (16 * (i % 2)) for i in range(fd.L)]) \
        & jnp.uint32(0xFFFF)
    r2 = jnp.asarray(np.asarray(
        [int(v) for v in spec.r2_limbs], dtype=np.uint32))
    return fd.fmul(spec, limbs, r2)                        # v*R mod p, exact


def interpolate(spec: FieldSpec, evals: list) -> list:
    """Coefficients of the unique degree-(len-1) polynomial through
    (i, evals[i]); each eval a Montgomery [L] vector."""
    vinv = vinv_mont(spec, len(evals))
    coeffs = []
    for r in range(len(evals)):
        acc = None
        for c in range(len(evals)):
            term = fd.fmul(spec, jnp.asarray(
                fd.pack_ints([vinv[r][c]])[:, 0]), evals[c])
            acc = term if acc is None else fd.fadd(spec, acc, term)
        coeffs.append(acc)
    return coeffs


def horner(spec: FieldSpec, coeffs: list, x: jnp.ndarray) -> jnp.ndarray:
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = fd.fadd(spec, c, fd.fmul(spec, x, acc))
    return acc


def fs_append_round(spec: FieldSpec, coeffs: list, state, nr):
    """Append a compressed round poly (all coefficients except the linear
    one) + draw the round challenge, all on device.

    Returns (compressed [L, d], rj [L] Montgomery, state', nr')."""
    from ..utils.keccak_device import transcript_event
    begin_w, end_w = transcript_const_words()
    begin_w = jnp.asarray(begin_w)
    end_w = jnp.asarray(end_w)
    empty = jnp.zeros(0, jnp.uint32)

    transmitted = [coeffs[0]] + list(coeffs[2:])
    state = transcript_event(state, nr, begin_w)
    nr = nr + 1
    for c in transmitted:
        state = transcript_event(state, nr, scalar_be_words(spec, c))
        nr = nr + 1
    state = transcript_event(state, nr, end_w)
    nr = nr + 1
    state = transcript_event(state, nr, empty)             # challenge
    nr = nr + 1
    rj = words_to_mont(spec, state)
    return jnp.stack(transmitted, axis=1), rj, state, nr


def state_to_device(transcript) -> tuple:
    """(state words, n_rounds) device values from a host Transcript."""
    return (jnp.asarray(np.frombuffer(transcript.state, dtype="<u4").copy()),
            jnp.uint32(transcript.n_rounds))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def fs_round_jit(spec: FieldSpec, degree: int, use_hint: bool):
    """The STANDALONE device Fiat-Shamir round program: interpolate the
    round poly from its evals, append + draw the challenge, Horner the
    next claim.  Fixed [L, degree+1] shapes — ONE compiled program per
    (degree, hint) is shared by EVERY sumcheck-shaped protocol.  Chained
    eagerly with the (separately-jitted) evals and bind kernels, rounds
    still enqueue with no host sync, but the fused per-protocol
    mega-programs (an hour-scale fresh compile for the full-ISA primary
    round) disappear."""
    import jax

    def f(evals_dev, prev, state, nr):
        evals = [evals_dev[:, t] for t in range(degree + 1)]
        if use_hint:
            evals[1] = fd.fsub(spec, prev, evals[0])
        coeffs = interpolate(spec, evals)
        comp, rj, state, nr = fs_append_round(spec, coeffs, state, nr)
        prev = horner(spec, coeffs, rj)
        return comp, rj, prev, state, nr

    return jax.jit(f)


@_functools.lru_cache(maxsize=None)
def fs_cubic_round_jit(spec: FieldSpec):
    """Cubic (GKR) variant: evals at t = {0, 2, 3} + the previous-claim
    hint for t = 1 (grand_product.rs:363-390's evaluation points)."""
    import jax

    def f(e023, prev, state, nr):                  # e023: [L, 3]
        e0, e2, e3 = e023[:, 0], e023[:, 1], e023[:, 2]
        e1 = fd.fsub(spec, prev, e0)
        coeffs = interpolate(spec, [e0, e1, e2, e3])
        comp, rj, state, nr = fs_append_round(spec, coeffs, state, nr)
        prev = horner(spec, coeffs, rj)
        return comp, rj, prev, state, nr

    return jax.jit(f)


def replay_and_check(spec: FieldSpec, comp_ints, transcript, state_dev,
                     make_cpoly):
    """Replay `comp_ints` [rounds, d] through the HOST transcript,
    returning (compressed polys, challenges); asserts the device hash
    chain matches the host's byte-for-byte."""
    import jax
    from ..field import FElt
    compressed, challenges = [], []
    for row in comp_ints:
        cpoly = make_cpoly([FElt(int(v), spec) for v in row.tolist()])
        cpoly.append_to_transcript(transcript)
        challenges.append(transcript.challenge_scalar())
        compressed.append(cpoly)
    dev_state = np.asarray(jax.device_get(state_dev)).astype("<u4").tobytes()
    assert dev_state == transcript.state, \
        "device Fiat-Shamir chain diverged from host transcript"
    return compressed, challenges
