"""Test configuration: force an 8-virtual-device CPU platform.

Sharding tests run against a virtual 8-device CPU mesh; real-TPU benchmarking
happens only through bench.py on the driver side.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
