#!/bin/bash
# Round-5 chip chain, part B: the pieces that depend on part A's outcomes —
# eval bench at its production batch (part A ran the bs16 default by
# mistake), the Pallas BN-epilogue A/B (VERDICT r4 #1a), a scoped-VMEM
# re-sweep at the new bs32 headline shape (the 32 MiB optimum was tuned at
# bs16), the on-chip multi-clip training runs (VERDICT r4 #6), and a final
# default-config bench to prime the compile cache for the driver's
# round-end capture. Same provenance/timeout discipline as chip_chain_r5.sh.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-scripts/chip_r5b_raw_$(date -u +%s).log}
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

run() {
  local budget=$1; shift
  echo "=== $(stamp) [budget ${budget}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(stamp)" >> "$LOG"
}

# 1. serving bench at the production dispatch batch
run 3900 python bench.py --eval --bs 128 --steps 50 --attempts 2
# 2. Pallas BN epilogue A/B at the headline shape
run 3600 python scripts/ab_bn_pallas.py --bs 32 --steps 20
# 3. scoped-VMEM sweep at bs32 (the shipped 32M was tuned at bs16)
run 9000 python scripts/ab_xla_flags.py --bs 32 --steps 20 --reps 2 \
    --only baseline,vmem_24m,vmem_32m,vmem_40m,vmem_48m,vmem_64m
# 4. eval-lookahead A/B rerun: part A's run was polluted by a concurrent
# CPU job on this 1-core host (timings 27-41 s across reps); host-sensitive
# stages need the host idle
run 3600 python scripts/ab_eval_lookahead.py --reps 5
# 5+6. multi-clip training on-chip: the round-2 synthetic 12-epoch zero-shot
# protocol at --n_clips 2, both pooling modes (clip-mean features vs
# per-clip embeddings; /root/reference/network.py:76 vs :595-600)
run 5400 python -m zeroshotvideoclassification_tpu.cli.main \
    --dataset synthetic --class_total 16 --train_samples 320 \
    --clip_len 8 --bs 16 --steps_per_call 4 --n_epochs 12 \
    --n_clips 2 --clip_pool feature --nopretrained --no-progressbar \
    --save_path /tmp/zsvc_r5_mc_feature
run 5400 python -m zeroshotvideoclassification_tpu.cli.main \
    --dataset synthetic --class_total 16 --train_samples 320 \
    --clip_len 8 --bs 16 --steps_per_call 4 --n_epochs 12 \
    --n_clips 2 --clip_pool embedding --nopretrained --no-progressbar \
    --save_path /tmp/zsvc_r5_mc_embedding
# 6. final default-config bench: the driver's round-end capture must hit a
# primed compile cache
run 3900 python bench.py --steps 50 --attempts 2
