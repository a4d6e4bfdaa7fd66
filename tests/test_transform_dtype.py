"""bf16 transform output: bit-exactness + plumbing.

Config.transform_dtype='auto' makes the fused transform emit the model's
compute dtype. Under bf16 compute this must be BIT-IDENTICAL to the f32
pipeline: the stem conv casts x to the compute dtype anyway
(models/layers.py conv3d), so emitting bf16 from the transform only moves
WHERE the f32->bf16 rounding happens — while halving the transform's HBM
write and the stem's activation read (the round-3 roofline's one untried
bandwidth lever). These tests pin that equivalence so the perf default can
never silently change numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeroshotvideoclassification_tpu.config import Config
from zeroshotvideoclassification_tpu.data.datasets import VideoTable
from zeroshotvideoclassification_tpu.data.pipeline import (
    HostPipeline,
    device_batch,
    transform_out_dtype,
)


def _host_batch(bs=2, n_clips=1, clip_len=4, size=32):
    rng = np.random.default_rng(0)
    cfg = Config(bs=bs, clip_len=clip_len, size=size, n_clips=n_clips,
                 prefetch_depth=0)
    fnames = np.asarray([(int(i % 3), i) for i in range(bs)], object)
    table = VideoTable(
        name="t", fnames=fnames, label_idx=np.arange(bs, dtype=np.int32) % 3,
        classes=["a", "b", "c"],
        class_embed=rng.normal(size=(3, 300)).astype(np.float32),
        loader="synthetic", is_validation=False, n_clips=n_clips)
    return next(iter(HostPipeline(table, cfg, bs, seed=0))), cfg


def test_resolver_follows_compute_dtype():
    assert transform_out_dtype(Config(compute_dtype="bfloat16")) == jnp.bfloat16
    assert transform_out_dtype(Config(compute_dtype="float32")) == jnp.float32
    assert transform_out_dtype(
        Config(compute_dtype="bfloat16", transform_dtype="float32")
    ) == jnp.float32


def test_bf16_transform_is_rounded_f32_transform():
    """x_bf16 == round_to_bf16(x_f32) elementwise — the transform computes
    in f32 either way; out_dtype only moves the final cast."""
    hb, cfg = _host_batch()
    a = device_batch(hb, 1, cfg.clip_len, out_dtype=jnp.float32)["x"]
    b = device_batch(hb, 1, cfg.clip_len, out_dtype=jnp.bfloat16)["x"]
    assert b.dtype == jnp.bfloat16
    assert bool(jnp.all(a.astype(jnp.bfloat16) == b))


def test_eval_forward_bit_identical_under_bf16_compute():
    """The eval embedding from a bf16 transform output equals the embedding
    from the f32 output exactly, when the model computes in bf16."""
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    hb, cfg = _host_batch()
    cfg = cfg.replace(network="r3d_18", head="mlp")
    model = get_network(cfg)
    ts = create_train_state(model, make_optimizer(cfg.lr),
                            jax.random.PRNGKey(0))
    step = make_eval_step(model, compute_dtype=jnp.bfloat16)
    xa = device_batch(hb, 1, cfg.clip_len, out_dtype=jnp.float32)["x"]
    xb = device_batch(hb, 1, cfg.clip_len, out_dtype=jnp.bfloat16)["x"]
    ea = np.asarray(jax.device_get(step(ts.params, ts.model_state, xa)))
    eb = np.asarray(jax.device_get(step(ts.params, ts.model_state, xb)))
    np.testing.assert_array_equal(ea, eb)


def test_train_step_bit_identical_under_bf16_compute():
    """One full train step (grads + Adam + BN stats) is bit-identical with
    bf16 vs f32 transform output under bf16 compute."""
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    hb, cfg = _host_batch()
    cfg = cfg.replace(network="r3d_18", head="mlp")
    model = get_network(cfg)
    optimizer = make_optimizer(cfg.lr)
    step = make_train_step(model, optimizer, compute_dtype=jnp.bfloat16)
    ce = jnp.asarray(np.eye(3, 300, dtype=np.float32))
    key = jax.random.PRNGKey(1)

    outs = []
    for dt in (jnp.float32, jnp.bfloat16):
        ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
        batch = device_batch(hb, 1, cfg.clip_len, out_dtype=dt)
        ts2, metrics = step(ts, batch["x"], batch["z"], batch["label"],
                            batch["weight"], ce, key)
        outs.append((float(metrics["loss"]),
                     np.asarray(jax.device_get(
                         jax.tree.leaves(ts2.params)[0]))))
    assert outs[0][0] == pytest.approx(outs[1][0], abs=0.0)
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
