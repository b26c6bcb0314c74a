#!/bin/bash
# Sequential per-file test runner with progressive timing (1-core box).
LOG=${1:-/tmp/jolt_tests.log}
: > "$LOG"
for f in $(ls tests/test_*.py); do
  start=$(date +%s)
  out=$(timeout 7200 python -m pytest "$f" -q -m "not slow" 2>&1 | tail -2)
  end=$(date +%s)
  echo "[$((end-start))s] $f :: $out" | tr '\n' ' ' >> "$LOG"
  echo >> "$LOG"
done
echo "ALL DONE" >> "$LOG"
