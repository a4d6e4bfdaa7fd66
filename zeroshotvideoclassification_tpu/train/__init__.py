"""Training layer: pjit'd step, optimizer/schedule, checkpointing, trainer."""

from zeroshotvideoclassification_tpu.train.optimizer import (
    make_optimizer,
    multistep_lr,
)
from zeroshotvideoclassification_tpu.train.step import (
    TrainState,
    make_train_step,
    make_scan_train_step,
    make_eval_step,
    create_train_state,
)
from zeroshotvideoclassification_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    read_meta,
    warm_start,
)
