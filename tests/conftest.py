"""Test configuration: force an 8-virtual-device CPU platform.

The environment may pre-register a remote TPU backend (axon tunnel) via
sitecustomize and pin JAX_PLATFORMS=axon; tests must run on local CPU with 8
virtual devices for sharding coverage.  jax.config.update works even after
jax import, as long as no backend has been initialized yet.

Real-TPU benchmarking happens only through bench.py on the driver side.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
