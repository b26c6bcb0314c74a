"""Multi-chip sharding of the prover hot loops.

The reference is single-process rayon (SURVEY §2.8).  Two scaling axes:

* **Grand products / sumchecks**: the BATCH axis.  A Jolt memory-checking
  grand product batches ~50-100 independent circuits; each chip owns a
  subset, so binds are purely local and only the tiny [L, 3] round-poly
  partial sums cross chips (all-gathered and modularly folded — NOT psum'd,
  because modular addition of limb tensors is not plain u32 addition).
  The bit-reversed pair layout (subprotocols/grand_product.py) is
  shard-oblivious along the batch axis.
* **MSM**: the point/scalar axis — per-shard sort/bucket windows, tiny
  cross-shard Jacobian tree-fold.

The transcript work stays on host, replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import FieldSpec, fr_spec
from ..field import device as fd
from ..subprotocols.grand_product import _pair_cubic_evals, _pair_bind


def make_mesh(n_devices: int | None = None, axis: str = "hc") -> Mesh:
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devices, (axis,))


def shard_hypercube(mesh: Mesh, arr: jnp.ndarray, axis: str = "hc") -> jnp.ndarray:
    """Place a [L, ..., n] limb tensor with the hypercube axis sharded."""
    spec = P(*([None] * (arr.ndim - 1) + [axis]))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, arr: jnp.ndarray, axis: str = "hc") -> jnp.ndarray:
    """Place a batch-leading [B, L, s] pair tensor with B sharded."""
    spec = P(*([axis] + [None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def sharded_gp_round(mesh: Mesh, spec: FieldSpec, l: jnp.ndarray,
                     r: jnp.ndarray, eq: jnp.ndarray, coeffs: jnp.ndarray,
                     r_chal: jnp.ndarray, axis: str = "hc"):
    """One full sharded GKR round over bit-reversed pair layers.

    l, r: [B, L, s] sharded on the batch axis; eq: [L, s] replicated;
    coeffs: [L, B] sharded on B; r_chal: [L] replicated (the round
    challenge — in the real protocol it depends on the evals via the
    transcript; the dryrun feeds a dummy to exercise the dataflow in one
    step).  Returns (evals [L, 3] replicated, bound l/r sharded, bound eq
    replicated).
    """
    def step(l_s, r_s, eq_s, coeffs_s, rc):
        local = _pair_cubic_evals(spec, l_s, r_s, eq_s, coeffs_s)  # [L, 3]
        gathered = jax.lax.all_gather(local, axis)                 # [D, L, 3]
        evals = fd.fsum(spec, jnp.moveaxis(gathered, 0, -1), axis=-1)
        nl, nr, neq = _pair_bind(spec, l_s, r_s, eq_s, rc)
        return evals, nl, nr, neq

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(None, None),
                  P(None, axis), P(None)),
        out_specs=(P(None, None), P(axis, None, None), P(axis, None, None),
                   P(None, None)),
        check_rep=False)
    return jax.jit(fn)(l, r, eq, coeffs, r_chal)


# ---------------------------------------------------------------------------
# jit-propagated sharding: shard the leaves once, let XLA insert collectives
# ---------------------------------------------------------------------------

def maybe_shard_pair(mesh: Mesh, pair: tuple, axis: str = "hc") -> tuple:
    """Shard a (l, r) pair layer on the batch axis when it divides the
    mesh; otherwise replicate (the tensors are identical on every chip)."""
    n_dev = mesh.devices.size
    l, r = pair
    if l.shape[0] % n_dev == 0:
        return shard_batch(mesh, l, axis), shard_batch(mesh, r, axis)
    repl = NamedSharding(mesh, P(*([None] * l.ndim)))
    return jax.device_put(l, repl), jax.device_put(r, repl)


def shard_gp_pair_layers(mesh: Mesh, layers: list[tuple],
                         axis: str = "hc") -> list[tuple]:
    """Place a dense GP's pair layers batch-sharded.  All downstream round
    kernels are ordinary jits — XLA partitions the local work and inserts
    the cross-chip reductions for the [L, 3] round evaluations."""
    return [maybe_shard_pair(mesh, pair, axis) for pair in layers]


# ---------------------------------------------------------------------------
# sharded MSM: local sort-based windows per shard, tree-fold across shards
# ---------------------------------------------------------------------------

def sharded_msm_windows(mesh: Mesh, points_jac, scalar_limbs: jnp.ndarray,
                        axis: str = "hc", n_windows: int | None = None,
                        window_bits: int | None = None):
    """MSM window totals over a sharded point/scalar set.

    The single-device kernel sorts points by digit (curve/device.py) — a
    global sort would force an all-gather, so each shard sorts and
    bucket-sums ITS slice locally, then the [L, W] per-shard window totals
    (tiny) are all-gathered and tree-folded with full Jacobian adds.
    points_jac: (X, Y, Z) [Lq, N] sharded on N; scalar_limbs: [Lr, N]
    CANONICAL 16-bit limbs, sharded.  n_windows must be a GLOBAL bound
    (same on every shard).  Returns (X, Y, Z) [Lq, W] replicated.
    """
    from ..curve import device as cd
    wb = window_bits or cd.MSM_WINDOW_BITS

    def step(px, py, pz, sl):
        inf = jnp.all(pz == 0, axis=0)
        w = cd._msm_windows_impl(px, py, pz, inf, sl, n_windows, wb)  # [L, W]
        g = tuple(jnp.moveaxis(jax.lax.all_gather(t, axis), 0, -1)
                  for t in w)                               # [L, W, D]
        while g[0].shape[-1] > 1:
            half = g[0].shape[-1] // 2
            lo = tuple(t[..., :half] for t in g)
            hi = tuple(t[..., half:2 * half] for t in g)
            s = cd.jac_add(lo, hi)
            if g[0].shape[-1] % 2:
                tail = tuple(t[..., -1:] for t in g)
                first = cd.jac_add(tuple(t[..., :1] for t in s), tail)
                s = tuple(jnp.concatenate([f, t[..., 1:]], axis=-1)
                          for f, t in zip(first, s))
            g = s
        return tuple(t[..., 0] for t in g)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        check_rep=False)
    return jax.jit(fn)(*points_jac, scalar_limbs)


def sharded_msm(mesh: Mesh, points_jac, scalars_mont: jnp.ndarray,
                spec_fr: FieldSpec | None = None, axis: str = "hc",
                window_bits: int | None = None):
    """Full sharded MSM -> host G1Affine (windows on device, Horner on host)."""
    from ..curve import device as cd
    spec_fr = spec_fr or fr_spec()
    wb = window_bits or cd.MSM_WINDOW_BITS
    canonical = fd.from_mont_device(spec_fr, scalars_mont)
    n_windows = cd.scalar_max_windows(canonical, wb)
    pts = tuple(shard_hypercube(mesh, t, axis) for t in points_jac)
    scl = shard_hypercube(mesh, canonical, axis)
    wx, wy, wz = sharded_msm_windows(mesh, pts, scl, axis, n_windows, wb)
    windows = cd.jacobian_to_host(wx, wy, wz)
    from ..curve.bn254 import G1Jacobian
    acc = G1Jacobian.identity()
    for wpt in reversed(windows):
        for _ in range(wb):
            acc = acc.double()
        acc = acc.add(wpt)
    return acc.to_affine()
