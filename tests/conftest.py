"""Test configuration: force an 8-virtual-device CPU platform.

The environment may pre-register a remote TPU backend (axon tunnel) and pin
JAX_PLATFORMS=axon; tests must run on local CPU with 8 virtual devices for
sharding coverage.  jax.config.update works even after jax import, as long
as no backend has been initialized yet.

A persistent compilation cache makes repeated test runs cheap (the limb
kernels compile once per shape ever, not once per process).

Real-TPU benchmarking happens only through bench.py on the driver side.
"""
import os

# Device count: default 1 — the full-VM e2e tests then SHARE the CLI's
# single-device compile cache instead of recompiling every program for a
# partitioned 8-device config (which made a cold fib e2e take >80 min on
# this 1-core box).  Mesh/sharding tests opt into 8 virtual devices via
# JOLT_TEST_DEVICES=8 (run_tests.sh sets it per-file; test_sharding.py
# skips itself when fewer than 8 devices are present).
_n_dev = os.environ.get("JOLT_TEST_DEVICES", "1")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_n_dev}").strip()
# NOTE on cache keys: do NOT try to unify pytest and CLI cache entries by
# aligning XLA flags — the device-count flag above is part of the key and
# the CLI doesn't set it, so they can never match; adding flags here only
# invalidates the (hours-deep) existing pytest cache.  The two key spaces
# stay separate and each stays warm.

# LLVM's JIT mmaps one region per compiled kernel section; with hundreds of
# kernels + persistent-cache loads a long pytest process exhausts the
# default vm.max_map_count (65530), which surfaces as "LLVM compilation
# error: Cannot allocate memory" followed by a SIGSEGV in the cache writer.
# Raise it when we can (root in CI image); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < (1 << 21):
            _f.seek(0)
            _f.write(str(1 << 21))
except OSError:
    pass

import jax  # noqa: E402

# Default: local CPU with 8 virtual devices (sharding coverage, driver CI).
# JOLT_TEST_PLATFORM=axon runs the suite on the real TPU instead — much
# faster compiles/execution on a weak host, and it exercises the Pallas
# kernel paths that production uses.
jax.config.update("jax_platforms",
                  os.environ.get("JOLT_TEST_PLATFORM", "cpu"))
# JOLT_TEST_CACHE_DIR override: concurrent writers can corrupt a shared
# cache (observed SIGSEGV in backend_compile_and_load) — point a second
# test process at its own directory.
from jolt_tpu.utils.caches import jit_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JOLT_TEST_CACHE_DIR", jit_cache_dir()))
# JOLT_TEST_NO_CACHE_WRITE=1: keep cache READS but write nothing — the
# jax 0.9.0 cache writer segfaults on certain executables on this box
# (put_executable_and_time); run_tests.sh retries crashed files this way.
if os.environ.get("JOLT_TEST_NO_CACHE_WRITE"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
