"""Benchmark: sumcheck field-op throughput of the fused GP round kernel.

Runs on whatever backend jax selects (real TPU under the driver).  Measures
the batched-GKR cubic-round kernel — the prover's hottest loop (reference
bench.rs is the Surge XOR prover benchmark whose cost is dominated by these
rounds + MSM).  Prints ONE JSON line.

Baseline: multicore-rayon arkworks BN254 Fr multiplication throughput.
arkworks Fr mul ~= 15-20M/s/core (measured widely; e.g. 65ns/mul), and the
reference parallelizes over ~32 threads on the comparison machine =>
~5e8 field-mul/s.  vs_baseline = ops_per_sec / 5e8.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jolt_tpu.field import device as fd, fr_spec
    from jolt_tpu.subprotocols.grand_product import _gp_cubic_evals, _gp_bind

    spec = fr_spec()
    B = 8            # batched circuits
    n = 1 << 16      # layer length (quads = n/4)
    rng = np.random.default_rng(7)
    layer = fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=(B, n), dtype=np.uint64))))
    eq = fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=(n // 2,), dtype=np.uint64))))
    coeffs = fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=(B,), dtype=np.uint64))))
    r = fd.scalar_to_device(spec, 987654321987654321)

    # K rounds chained ON DEVICE per dispatch: a per-round host round-trip
    # would measure tunnel latency, not kernel throughput.  Each iteration
    # feeds the previous round evals back into the coefficients (a real data
    # dependency, so nothing can be CSE'd away), exactly the shape of work a
    # GKR layer does between Fiat-Shamir challenges.
    K = 64

    def step(layer, eq, coeffs, r):
        def body(_, carry):
            coeffs, acc = carry
            evals = _gp_cubic_evals(spec, layer, eq, coeffs)
            delta = jnp.broadcast_to(evals[:, 0:1], coeffs.shape)
            return fd.fadd(spec, coeffs, delta), fd.fadd(spec, acc, evals)
        coeffs, acc = jax.lax.fori_loop(0, K, body,
                                        (coeffs, fd.zeros(spec, (3,))))
        new_layer, new_eq = _gp_bind(spec, layer, eq, r)
        return acc, new_layer, new_eq

    step_jit = jax.jit(step)
    out = step_jit(layer, eq, coeffs, r)
    jax.block_until_ready(out)  # compile + warmup

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_jit(layer, eq, coeffs, r)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # field muls per cubic-evals round: per quad per batch 2 coeff-muls +
    # 3 product muls = 5; per quad 3 eq muls.  Plus one bind: 2 muls per
    # quad per batch + 1 eq mul per pair.
    quads = n // 4
    muls = K * quads * (B * 5 + 3) + quads * (B * 2) + (n // 2) * 1
    ops_per_sec = muls / dt
    baseline = 5e8  # multicore-rayon arkworks Fr mul/s (see module docstring)
    print(json.dumps({
        "metric": "gp_cubic_round_field_muls_per_sec",
        "value": round(ops_per_sec),
        "unit": "field-muls/s/chip",
        "vs_baseline": round(ops_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
