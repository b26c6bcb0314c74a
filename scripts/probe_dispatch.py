"""Probe: per-dispatch enqueue cost + sync cost through the axon tunnel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jolt_tpu.utils.caches import enable_persistent_compilation_cache

enable_persistent_compilation_cache(jax)

import jax.numpy as jnp


@jax.jit
def tick(x):
    return x + 1


@jax.jit
def tock(x):
    return x * 3


x = jnp.zeros((8, 128), jnp.uint32)
x = tick(x)
jax.block_until_ready(x)
x = tock(x)
jax.block_until_ready(x)

for n in (50, 200):
    t0 = time.perf_counter()
    for _ in range(n):
        x = tick(x)
        x = tock(x)
    t1 = time.perf_counter()
    jax.block_until_ready(x)
    t2 = time.perf_counter()
    print(f"n={n}: enqueue {1e3*(t1-t0)/(2*n):.2f} ms/dispatch, "
          f"drain {t2-t1:.3f}s total ({1e3*(t2-t1)/(2*n):.2f} ms/dispatch)")

# blocking sync per call
t0 = time.perf_counter()
for _ in range(20):
    x = tick(x)
    jax.block_until_ready(x)
t1 = time.perf_counter()
print(f"sync-per-call: {1e3*(t1-t0)/20:.2f} ms/roundtrip")

# small host->device transfer cost
t0 = time.perf_counter()
for i in range(50):
    y = jax.device_put(jnp.zeros(8, jnp.uint32))
jax.block_until_ready(y)
t1 = time.perf_counter()
print(f"small transfer: {1e3*(t1-t0)/50:.2f} ms each")
