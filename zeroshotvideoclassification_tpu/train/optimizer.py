"""Adam + MultiStepLR, matching the reference's optimizer setup.

Parity target: /root/reference/main.py:129-137 —
  Adam(lr) with torch defaults (b1=0.9, b2=0.999, eps=1e-8);
  MultiStepLR milestones [60, 120] gamma 0.1 when lr == 1e-3, else
  [int(0.8 * n_epochs)].
The reference's AMP GradScaler is unnecessary on TPU (bf16 needs no loss
scaling); its inf/NaN step-skip safety is provided by skip_nonfinite below.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def multistep_lr(base_lr: float, n_epochs: int) -> "callable":
    """epoch -> lr, reference milestone logic (main.py:132-135)."""
    if base_lr == 1e-3:
        milestones = (60, 120)
    else:
        milestones = (int(0.8 * n_epochs),)

    def lr_at(epoch: int) -> float:
        lr = base_lr
        for m in milestones:
            if epoch >= m:
                lr *= 0.1
        return lr

    return lr_at


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (the trainer sets it per epoch
    from multistep_lr, mirroring scheduler.step(), main.py:374)."""
    return optax.inject_hyperparams(_adam_with_guard)(learning_rate=lr)


def _adam_with_guard(learning_rate) -> optax.GradientTransformation:
    # apply_if_finite wraps the WHOLE optimizer: a non-finite gradient leaves
    # params, Adam moments and the bias-correction count all untouched —
    # exact GradScaler step-skip semantics (main.py:197-203). (Zeroing the
    # gradient before adam would NOT skip: momentum still moves params.)
    # max_consecutive_errors is effectively infinite: apply_if_finite would
    # otherwise APPLY the NaN update once the count is exceeded, poisoning
    # params — GradScaler never does that.
    return optax.apply_if_finite(
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        max_consecutive_errors=10**8,
    )


def set_lr(opt_state, lr: float):
    """Update the injected learning rate in-place-ish (returns new state)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
