#!/bin/bash
# Round-4 chip measurement chain (run serially — one chip, one host core).
# Each stage appends to scripts/chip_r4_results.log; safe to re-run, the
# persistent jax compilation cache makes repeats cheap.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/chip_r4_results.log
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

run() {
  echo "=== $(stamp) $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(stamp)" >> "$LOG"
}

run python bench.py --steps 50 --attempts 2
run python bench.py --eval --steps 50 --attempts 2
run python scripts/scaling_curve.py --steps 30 --timeout 1500
