#!/bin/bash
# Round-5 chip measurement chain (VERDICT r4 #1/#2/#6). Run serially — one
# chip, one host core.
#
# Provenance discipline (ADVICE r4): raw output goes to an UNTRACKED
# timestamped log (scripts/chip_r5_raw_*.log, gitignored); curated COMPLETE
# results are hand-copied into scripts/chip_r5_results.log and committed
# separately. Re-running never dirties the worktree.
#
# Timeout discipline (ADVICE r4): each stage's wrapper budget COVERS its
# inner retry/timeout structure — bench.py default --attempt_timeout 1800 x
# --attempts 2 + backoff 30 needs ~3700s, so the wrapper gives 3900;
# scaling_curve.py bounds each of its 8 configs at --timeout 1500 itself,
# so its wrapper covers 8x1500 + overhead.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-scripts/chip_r5_raw_$(date -u +%s).log}
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

run() {
  local budget=$1; shift
  echo "=== $(stamp) [budget ${budget}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(stamp)" >> "$LOG"
}

# 1. headline train bench bs16 (now prints the e2e pipeline line too)
run 3900 python bench.py --steps 50 --attempts 2
# 2. bs32 headline candidate (VERDICT r4 #1b)
run 3900 python bench.py --steps 50 --attempts 2 --skip_e2e --bs 32
# 3. eval (serving) bench
run 3900 python bench.py --eval --steps 50 --attempts 2
# 4. eval one-batch-lookahead e2e delta (VERDICT r4 weak #2)
run 2400 python scripts/ab_eval_lookahead.py
# 5. scaling curve under the shipped program (closes VERDICT r3 #6)
run 12600 python scripts/scaling_curve.py --steps 30 --timeout 1500
