#!/bin/bash
# Cache-warming babysitter for bench.py on the tunneled TPU.
#
# The axon tunnel occasionally wedges a process mid-execution (epoll wait,
# no response frame, no timeout on either side).  This loop runs the e2e
# bench, watches for progress (stderr growth), and kills + restarts on a
# stall; the persistent compile cache accumulates across attempts, so each
# retry resumes further along.  Exits when a run completes (JSON on stdout).
#
# Usage: scripts/warm_bench.sh [attempts] [stall_seconds]
ATTEMPTS=${1:-6}
STALL=${2:-420}
OUT=${JOLT_WARM_OUT:-/tmp/e2e_out.txt}
ERR=${JOLT_WARM_ERR:-/tmp/e2e_err.txt}

for i in $(seq 1 "$ATTEMPTS"); do
  echo "[warm] attempt $i" >&2
  TF_CPP_MIN_LOG_LEVEL=3 JOLT_SPAN_LOG=1 JOLT_BENCH_KERNEL=${JOLT_BENCH_KERNEL:-0} \
    JOLT_BENCH_TOTAL=${JOLT_BENCH_TOTAL:-13500} JOLT_MSM_DEBUG=1 \
    python -u bench.py > "$OUT" 2> "$ERR" &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    # progress = either output file moved OR the compile cache grew
    mt1=$(stat -c %Y "$ERR" 2>/dev/null || echo 0)
    mt2=$(stat -c %Y "$OUT" 2>/dev/null || echo 0)
    mt3=$(stat -c %Y .cache/jit 2>/dev/null || echo 0)
    mt=$(printf '%s\n' "$mt1" "$mt2" "$mt3" | sort -n | tail -1)
    if [ $((now - mt)) -gt "$STALL" ]; then
      echo "[warm] stalled $((now - mt))s; terminating $pid" >&2
      kill -TERM "$pid" 2>/dev/null   # bench has a SIGTERM handler
      sleep 20
      kill -9 "$pid" 2>/dev/null
      # The remote reaps a dead client's session ~15-20 min later and the
      # reap wedges whatever client is active at that moment (observed
      # repeatedly) — wait out the reap BEFORE the next attempt.
      sleep "${JOLT_WARM_DRAIN:-1500}"
      break
    fi
  done
  wait "$pid" 2>/dev/null
  if grep -q '"metric"' "$OUT" 2>/dev/null && \
     grep -q 'e2e_verify_seconds\|e2e_error' "$OUT" 2>/dev/null; then
    echo "[warm] complete on attempt $i" >&2
    cat "$OUT"
    exit 0
  fi
done
echo "[warm] exhausted $ATTEMPTS attempts" >&2
cat "$OUT" 2>/dev/null
exit 1
