"""Profile Jolt verify on a small fib trace with HyperKZG (CPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from jolt_tpu.utils.caches import enable_persistent_compilation_cache

enable_persistent_compilation_cache(jax)

from jolt_tpu.field import fr_spec
from jolt_tpu.vm.host import fibonacci_program, trace_program
from jolt_tpu.vm.rv32i_vm import rv32i_vm
from jolt_tpu.commitment.hyperkzg import HyperKZG

spec = fr_spec()
vm = rv32i_vm(spec)
steps, device, bytecode_rows = trace_program(fibonacci_program(8), vm)
print(f"trace {len(steps)} steps", flush=True)
n = vm.required_srs_len(device, steps, bytecode_rows)
pcs = HyperKZG.setup(n)
pre = vm.preprocess(bytecode_rows, pcs)
t0 = time.perf_counter()
proof, commitments, pt, pacc = vm.prove(device, steps, pre)
print(f"prove {time.perf_counter()-t0:.1f}s", flush=True)

import cProfile
import pstats

t0 = time.perf_counter()
cProfile.run("vm.verify(pre, proof, commitments)", "/tmp/verify.prof")
print(f"verify {time.perf_counter()-t0:.2f}s", flush=True)
p = pstats.Stats("/tmp/verify.prof")
p.sort_stats("cumulative").print_stats(30)
