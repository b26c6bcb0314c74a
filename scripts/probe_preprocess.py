"""Probe: where do preprocess's 300+ s go?  Runs preprocess TWICE in one
process (second run should load zero programs) and prints the per-program
load table for the first."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

from jolt_tpu.utils.caches import enable_persistent_compilation_cache

enable_persistent_compilation_cache(jax)

from jolt_tpu.field import fr_spec
from jolt_tpu.utils import profiling
from jolt_tpu.vm.guests import sha2_chain_program
from jolt_tpu.vm.host import trace_program
from jolt_tpu.vm.rv32i_vm import rv32i_vm

profiling.enable()
profiling.count_programs()

spec = fr_spec()
vm = rv32i_vm(spec)
steps, device, bytecode_rows = trace_program(sha2_chain_program(1), vm,
                                             inputs=b"\x05" * 32)
from jolt_tpu.commitment import MockCommitmentScheme

for it in range(2):
    profiling.reset()
    profiling.reset_programs()
    t0 = time.perf_counter()
    pre = vm.preprocess(bytecode_rows, MockCommitmentScheme(spec))
    jax.block_until_ready(pre.instruction_lookups.subtable_dev)
    print(f"run {it}: preprocess {time.perf_counter()-t0:.1f}s", flush=True)
    profiling.print_cumulative()
    profiling.print_programs(top=15)
