#!/usr/bin/env bash
# Launcher preset, parity with /root/reference/run.sh: the paper's headline
# configuration (R(2+1)D-18, kinetics -> zero-shot UCF101+HMDB51).
set -euo pipefail

DATA=${DATA:-kinetics2oboth}
NET=${NET:-r2plus1d_18}
EPOCHS=${EPOCHS:-150}
LR=${LR:-1e-3}
BS=${BS:-22}
DATA_ROOT=${DATA_ROOT:-/mnt/hdd1}

exec python -m zeroshotvideoclassification_tpu.cli.main \
    --dataset "$DATA" \
    --network "$NET" \
    --n_epochs "$EPOCHS" \
    --lr "$LR" \
    --bs "$BS" \
    --clip_len 16 \
    --class_overlap 0.04 \
    --data_root "$DATA_ROOT" \
    "$@"
