"""Multi-chip sharding of the prover hot loops.

The reference is single-process rayon (SURVEY §2.8); the scaling axis here is
the 2^n sumcheck hypercube.  Strategy: shard the hypercube axis (low-order
index blocks) of the stacked polynomial tensors across a 1-D mesh. Each GKR
round:
  * every shard computes its local cubic-eval partial sums (pure local work —
    quads never straddle shard boundaries since shards are multiples of 4)
  * partial round-poly evaluations (tiny [L, 3] tensors) are all-gathered and
    modularly folded — NOT psum'd, because modular addition of limb tensors
    is not plain u32 addition
  * binding is shard-local (each 4-quad maps to a local 2-pair)
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
from ..subprotocols.grand_product import _gp_cubic_evals, _gp_bind


def make_mesh(n_devices: int | None = None, axis: str = "hc") -> Mesh:
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devices, (axis,))


def shard_hypercube(mesh: Mesh, arr: jnp.ndarray, axis: str = "hc") -> jnp.ndarray:
    """Place a [L, ..., n] limb tensor with the hypercube axis sharded."""
    spec = P(*([None] * (arr.ndim - 1) + [axis]))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def sharded_gp_round(mesh: Mesh, spec: FieldSpec, layer: jnp.ndarray,
                     eq: jnp.ndarray, coeffs: jnp.ndarray, r: jnp.ndarray,
                     axis: str = "hc"):
    """One full sharded GKR round: cubic evals (global) + bind (local).

    layer: [L, B, 4m] sharded on the last axis; eq: [L, 2m] sharded;
    coeffs: [L, B] replicated; r: [L] replicated (the round challenge —
    in the real protocol it depends on the evals via the transcript; the
    dryrun feeds a dummy to exercise the full dataflow in one step).
    Returns (evals [L, 3] replicated, bound layer, bound eq, both sharded).
    """
    def step(layer_s, eq_s, coeffs_s, r_s):
        local = _gp_cubic_evals(spec, layer_s, eq_s, coeffs_s)   # [L, 3]
        gathered = jax.lax.all_gather(local, axis)               # [D, L, 3]
        evals = fd.fsum(spec, jnp.moveaxis(gathered, 0, -1), axis=-1)
        new_layer, new_eq = _gp_bind(spec, layer_s, eq_s, r_s)
        return evals, new_layer, new_eq

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis), P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None, axis), P(None, axis)),
        check_rep=False)
    return jax.jit(fn)(layer, eq, coeffs, r)


# ---------------------------------------------------------------------------
# jit-propagated sharding: shard the leaves once, let XLA insert collectives
# ---------------------------------------------------------------------------

def maybe_shard(mesh: Mesh, arr: jnp.ndarray, axis: str = "hc",
                min_per_device: int = 4) -> jnp.ndarray:
    """Shard the hypercube axis if each device keeps >= min_per_device
    whole quads; otherwise replicate (small GKR tail layers live on every
    chip — they are tiny)."""
    n_dev = mesh.devices.size
    n = arr.shape[-1]
    if n % n_dev == 0 and n // n_dev >= min_per_device:
        return shard_hypercube(mesh, arr, axis)
    return jax.device_put(arr, NamedSharding(mesh, P(*([None] * arr.ndim))))


def shard_gp_layers(mesh: Mesh, layers: list[jnp.ndarray],
                    axis: str = "hc") -> list[jnp.ndarray]:
    """Place a dense GP's product-tree levels: big layers sharded on the
    hypercube axis, small tail layers replicated.  All downstream round
    kernels are ordinary jits — XLA partitions the local work and inserts
    the cross-chip reductions for the [L, 3] round evaluations."""
    return [maybe_shard(mesh, l, axis) for l in layers]


# ---------------------------------------------------------------------------
# sharded MSM: local sort-based windows per shard, tree-fold across shards
# ---------------------------------------------------------------------------

def sharded_msm_windows(mesh: Mesh, points_jac, scalar_limbs: jnp.ndarray,
                        axis: str = "hc"):
    """MSM window totals over a sharded point/scalar set.

    The single-device kernel sorts points by digit (curve/device.py) — a
    global sort would force an all-gather, so each shard sorts and
    bucket-sums ITS slice locally, then the [L, W] per-shard window totals
    (tiny) are all-gathered and tree-folded with full Jacobian adds.
    points_jac: (X, Y, Z) [Lq, N] sharded on N; scalar_limbs: [Lr, N]
    CANONICAL 16-bit limbs, sharded.  Returns (X, Y, Z) [Lq, W] replicated.
    """
    from ..curve import device as cd

    def step(px, py, pz, sl):
        inf = jnp.all(pz == 0, axis=0)
        w = cd._msm_windows_impl(px, py, pz, inf, sl)      # (x,y,z) [L, W]
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
                spec_fr: FieldSpec | None = None, axis: str = "hc"):
    """Full sharded MSM -> host G1Affine (windows on device, Horner on host)."""
    from ..curve import device as cd
    spec_fr = spec_fr or fr_spec()
    pts = tuple(shard_hypercube(mesh, t, axis) for t in points_jac)
    scl = shard_hypercube(
        mesh, fd.from_mont_device(spec_fr, scalars_mont), axis)
    wx, wy, wz = sharded_msm_windows(mesh, pts, scl, axis)
    windows = cd.jacobian_to_host(wx, wy, wz)
    from ..curve.bn254 import G1Jacobian
    acc = G1Jacobian.identity()
    for wpt in reversed(windows):
        for _ in range(cd.MSM_WINDOW_BITS):
            acc = acc.double()
        acc = acc.add(wpt)
    return acc.to_affine()
