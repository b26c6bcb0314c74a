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

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Default: local CPU with 8 virtual devices (sharding coverage, driver CI).
# JOLT_TEST_PLATFORM=axon runs the suite on the real TPU instead — much
# faster compiles/execution on a weak host, and it exercises the Pallas
# kernel paths that production uses.
jax.config.update("jax_platforms",
                  os.environ.get("JOLT_TEST_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", "/tmp/jolt_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
