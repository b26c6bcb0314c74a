"""Benchmark: sumcheck field-op throughput of the fused GP round kernel,
plus a REAL end-to-end prove: sha2-chain on the full RV32I VM with
HyperKZG (the reference's headline workload, bench.rs:212-246).

Runs on whatever backend jax selects (real TPU under the driver).  Prints
ONE JSON line; progress goes to stderr.  JOLT_BENCH_E2E=0 skips the e2e
stage (kernel metric only).

The whole run is watchdogged: a SIGALRM at JOLT_BENCH_TOTAL seconds
(default 520) and the driver's SIGTERM both print the JSON line with
whatever stages completed and exit — a partial bench must never leave
the driver with NO artifact (round-2 lesson: rc=124, parsed=null).

Baseline: multicore-rayon arkworks BN254 Fr multiplication throughput.
arkworks Fr mul ~= 15-20M/s/core (measured widely; e.g. 65ns/mul), and the
reference parallelizes over ~32 threads on the comparison machine =>
~5e8 field-mul/s.  vs_baseline = ops_per_sec / 5e8.
"""
import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.monotonic()
_OUT = {"metric": "gp_cubic_round_field_muls_per_sec", "value": 0,
        "unit": "field-muls/s/chip", "vs_baseline": 0.0}
_PRINTED = False


def _log(msg):
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _finalize(reason=None):
    """Print the ONE json line (idempotent)."""
    global _PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    if reason:
        _OUT.setdefault("partial", reason)
    print(json.dumps(_OUT), flush=True)


def _die(signame):
    def h(signum, frame):
        _log(f"{signame} at +{time.monotonic() - _T0:.0f}s; emitting partial")
        _finalize(f"{signame} watchdog")
        os._exit(0)
    return h


def _watchdog(total):
    """Thread-based deadline: SIGALRM handlers are DEFERRED while the main
    thread sits in a long C call (XLA compile — observed 80s+ deferral);
    a timer thread prints the JSON line and exits regardless."""
    def fire():
        _log(f"watchdog at +{time.monotonic() - _T0:.0f}s; emitting partial")
        _finalize("watchdog")
        os._exit(0)
    t = threading.Timer(max(5.0, total - (time.monotonic() - _T0)), fire)
    t.daemon = True
    t.start()
    return t


def _budget_left(total):
    return total - (time.monotonic() - _T0)


def bench_e2e(backend: str) -> dict:
    """Full-VM prove+verify with HyperKZG on this backend: sha2-chain(1)
    (the reference's headline, bench.rs:212-246) on TPU; on the CPU
    FALLBACK (axon tunnel down) the same pipeline on the fib guest —
    a 1-core host proving sha2-chain would time the box, not the
    framework, and risk leaving no artifact at all."""
    from jolt_tpu.commitment.hyperkzg import HyperKZG
    from jolt_tpu.field import fr_spec
    from jolt_tpu.utils import profiling
    from jolt_tpu.vm.guests import sha2_chain_expected, sha2_chain_program
    from jolt_tpu.vm.host import fibonacci_program, trace_program
    from jolt_tpu.vm.rv32i_vm import rv32i_vm

    profiling.enable()
    profiling.count_programs()
    profiling.reset_programs()
    spec = fr_spec()
    vm = rv32i_vm(spec)
    small = backend == "cpu"
    iters = int(os.environ.get("JOLT_BENCH_E2E_ITERS", "1"))
    workload = "fib(8) rv32i hyperkzg [cpu fallback]" if small else \
        f"sha2-chain({iters}) rv32i hyperkzg"
    inputs = b"" if small else b"\x05" * 32
    program = fibonacci_program(8) if small else sha2_chain_program(iters)
    # stage results land in _OUT INCREMENTALLY: a partial run (driver
    # SIGTERM / watchdog) still reports every completed stage
    _OUT["e2e_workload"] = workload
    t0 = time.perf_counter()
    steps, device, bytecode_rows = trace_program(program, vm, inputs=inputs)
    trace_seconds = time.perf_counter() - t0
    if not small:
        assert bytes(device.outputs)[:32] == sha2_chain_expected(inputs, 1)
    _log(f"e2e: trace {len(steps)} steps in {trace_seconds:.2f}s")
    _OUT["e2e_trace_length"] = len(steps)
    _OUT["e2e_trace_seconds"] = round(trace_seconds, 3)
    n = vm.required_srs_len(device, steps, bytecode_rows)
    t0 = time.perf_counter()
    pcs = HyperKZG.setup(n)
    srs_seconds = time.perf_counter() - t0
    _log(f"e2e: SRS 2^{n.bit_length() - 1} in {srs_seconds:.1f}s")
    _OUT["e2e_srs_seconds"] = round(srs_seconds, 3)
    t0 = time.perf_counter()
    pre = vm.preprocess(bytecode_rows, pcs)
    _log(f"e2e: preprocess {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    proof, commitments, _, _ = vm.prove(device, steps, pre)
    prove_seconds = time.perf_counter() - t0
    _log(f"e2e: prove {prove_seconds:.2f}s")
    _OUT["e2e_prove_seconds"] = round(prove_seconds, 3)
    # distinct-program accounting (VERDICT r4 item 2): cold e2e cost is
    # dominated by per-process first-use program loads, not compute
    pstats = profiling.program_stats()
    _OUT["e2e_program_count"] = pstats["count"]
    _OUT["e2e_program_load_seconds"] = pstats["seconds"]
    _log(f"e2e: {pstats['count']} distinct XLA programs, "
         f"{pstats['seconds']:.1f}s local load")
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profiling.print_cumulative()   # per-span roofline -> stderr
    for line in buf.getvalue().splitlines():
        _log(f"e2e:   {line}")
    t0 = time.perf_counter()
    vm.verify(pre, proof, commitments)
    verify_seconds = time.perf_counter() - t0
    _log(f"e2e: verify {verify_seconds:.2f}s")
    return {
        "e2e_workload": workload,
        "e2e_trace_length": len(steps),
        "e2e_prove_seconds": round(prove_seconds, 3),
        "e2e_verify_seconds": round(verify_seconds, 3),
    }


def main():
    # Internal deadline: 29 min.  A SHORTER driver timeout is fine — its
    # SIGTERM lands in _die() which prints the JSON with every completed
    # stage (the kernel metric lands within ~2 min).  The old 540 s default
    # self-truncated the e2e stage even when the driver would have allowed
    # it to finish.
    total = int(os.environ.get("JOLT_BENCH_TOTAL", "1740"))
    signal.signal(signal.SIGTERM, _die("SIGTERM"))
    wd = _watchdog(total)

    try:  # LLVM JIT map exhaustion guard (no-op without privileges)
        with open("/proc/sys/vm/max_map_count", "r+") as f:
            if int(f.read()) < (1 << 21):
                f.seek(0)
                f.write(str(1 << 21))
    except OSError:
        pass
    import jax
    # persistent kernel cache (repo-local: survives to the driver's run):
    # repeated bench runs skip the (slow, 1-core) XLA/Mosaic compiles
    from jolt_tpu.utils.caches import enable_persistent_compilation_cache
    enable_persistent_compilation_cache(jax)
    # The axon tunnel has been observed to hang backend init indefinitely
    # (device discovery retry loop).  Fall back to CPU after a deadline so
    # the driver always gets a JSON line tagged with the measured backend.
    def _backend_timeout(signum, frame):
        raise TimeoutError("backend init timed out")

    backend = None
    signal.signal(signal.SIGALRM, _backend_timeout)
    try:
        signal.alarm(min(300, max(60, int(_budget_left(total)) - 120)))
        backend = jax.devices()[0].platform
    except Exception as e:
        _log(f"TPU backend init failed ({e}); falling back to CPU")
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        backend = jax.devices()[0].platform
    finally:
        signal.alarm(0)
    _log(f"backend: {backend}")
    _OUT["backend"] = backend
    import jax.numpy as jnp
    import numpy as np
    from jolt_tpu.field import device as fd, fr_spec
    from jolt_tpu.subprotocols.grand_product import (_pair_bind,
                                                     _pair_cubic_evals)

    if os.environ.get("JOLT_BENCH_KERNEL", "1") in ("0", ""):
        # e2e-only debugging mode
        _OUT.update(value=0, vs_baseline=0.0)
        if os.environ.get("JOLT_BENCH_E2E", "1") not in ("0", ""):
            try:
                _OUT.update(bench_e2e(backend))
            except Exception as e:
                _OUT["e2e_error"] = f"{type(e).__name__}: {e}"[:300]
        wd.cancel()
        _finalize()
        return

    spec = fr_spec()
    B = 32           # batched circuits — real Jolt GP batches are this size
    #                  or larger (memory checking batches all ~54 memories'
    #                  read/write circuits into ONE grand product,
    #                  grand_product.rs:335-396 / memory_checking.rs), so a
    #                  wide batch is the representative workload
    n = 1 << 16      # interleaved layer length (pairs per side = n/4)
    s = n // 2       # per-side (l, r) length in the bit-reversed pair layout
    rng = np.random.default_rng(7)
    mk = lambda *shape: fd.to_mont_device(spec, jnp.asarray(
        fd.pack_u64(rng.integers(1, 1 << 63, size=shape, dtype=np.uint64))))
    l = jnp.moveaxis(mk(B, s), 0, 1)    # [B, L, s]
    rt = jnp.moveaxis(mk(B, s), 0, 1)
    eq = mk(s)
    coeffs = mk(B)
    r = fd.scalar_to_device(spec, 987654321987654321)

    # The REAL prover inner loop: GKR rounds of (cubic evals -> bind),
    # chained ON DEVICE in one dispatch (a per-round host round-trip would
    # measure tunnel latency, not kernel throughput).  Each round's
    # challenge is derived from its own evals (a real data dependency, so
    # nothing can be CSE'd away) — exactly the dataflow a GKR layer runs
    # between Fiat-Shamir events.  Every rep runs at ONE canonical shape
    # (the layer-top round, where ~all the muls are): the bound halves are
    # tiled back to full size, so the whole step uses exactly TWO Mosaic
    # kernel geometries — the old halving sweep compiled/loaded six, which
    # cost ~290 s of the bench window on a warm cache (docs/PERF.md).
    R = 8

    def step(l, rt, eq, coeffs, r):
        acc = fd.zeros(spec, (3,))
        for k in range(R):
            evals = _pair_cubic_evals(spec, l, rt, eq, coeffs)
            acc = fd.fadd(spec, acc, evals)
            r_chal = evals[:, 0]                  # stand-in FS challenge
            nl, nr, neq = _pair_bind(spec, l, rt, eq, r_chal)
            l = jnp.concatenate([nl, nl], axis=-1)
            rt = jnp.concatenate([nr, nr], axis=-1)
            eq = jnp.concatenate([neq, neq], axis=-1)
        return acc

    step_jit = jax.jit(step)
    out = step_jit(l, rt, eq, coeffs, r)
    jax.block_until_ready(out)  # compile + warmup
    _log("kernel stage compiled")

    iters = 20
    t0 = time.perf_counter()
    outs = [step_jit(l, rt, eq, coeffs, r) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters

    # field muls per round at per-side size s (h = s/2 sibling pairs):
    # evals h*(B*5 + 3), bind h*(B*2 + 1), R top-shape rounds per step
    muls = R * (s // 2) * (B * 5 + 3 + B * 2 + 1)
    ops_per_sec = muls / dt
    baseline = 5e8  # multicore-rayon arkworks Fr mul/s (see module docstring)
    _OUT.update(
        value=round(ops_per_sec),
        vs_baseline=round(ops_per_sec / baseline, 4),
    )
    _log(f"kernel: {ops_per_sec / 1e6:.1f}M muls/s "
         f"({ops_per_sec / baseline:.3f}x baseline)")

    if os.environ.get("JOLT_BENCH_MSM", "1") not in ("0", ""):
        # MSM commit throughput — the OTHER half of the declared
        # sumcheck+MSM north-star metric (BASELINE.md:22; msm/mod.rs:68-220
        # is the reference path).  A witness-shaped batch commit: mostly
        # u32-sized scalars plus a few full-width RLC columns, over a
        # generated SRS prefix.
        try:
            from jolt_tpu.commitment.kzg import kzg_commit_batch, srs_setup
            n_msm = 1 << 14
            pk, _vk = srs_setup(n_msm)
            cols = [fd.to_mont_device(spec, jnp.asarray(fd.pack_u64(
                rng.integers(0, 1 << 32, size=n_msm, dtype=np.uint64))))
                for _ in range(14)]
            cols += [mk(n_msm), mk(n_msm)]   # full-width RLC columns
            kzg_commit_batch(pk, cols)       # compile/load warmup
            t0 = time.perf_counter()
            msm_iters = 3
            for _ in range(msm_iters):
                kzg_commit_batch(pk, cols)
            msm_dt = (time.perf_counter() - t0) / msm_iters
            msm_ops = len(cols) * n_msm / msm_dt
            _OUT["msm_commit_scalar_muls_per_sec"] = round(msm_ops)
            _OUT["msm_commit_batch"] = f"{len(cols)}x2^14"
            _log(f"msm: {msm_ops / 1e6:.2f}M scalar-muls/s "
                 f"(batch {len(cols)} cols x 2^14, {msm_dt:.2f}s/commit)")
        except Exception as e:
            _OUT["msm_error"] = f"{type(e).__name__}: {e}"[:200]
    if os.environ.get("JOLT_BENCH_E2E", "1") not in ("0", ""):
        # the e2e stage gets whatever remains of the total budget minus a
        # print margin; if the watchdog fires mid-prove the kernel metric
        # above still lands
        left = _budget_left(total) - 15
        if left < 60:
            _OUT["e2e_error"] = f"skipped: only {left:.0f}s budget left"
        else:
            try:
                _OUT.update(bench_e2e(backend))
            except Exception as e:  # never lose the kernel metric
                _OUT["e2e_error"] = f"{type(e).__name__}: {e}"[:300]
    wd.cancel()
    _finalize()


if __name__ == "__main__":
    main()
