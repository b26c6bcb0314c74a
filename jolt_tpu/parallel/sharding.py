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
