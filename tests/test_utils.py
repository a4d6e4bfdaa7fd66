"""Utils coverage: config naming parity, GIF inverse, metrics logger."""

import json
import os

import numpy as np
import pytest

from zeroshotvideoclassification_tpu.config import Config, config_from_args
from zeroshotvideoclassification_tpu.utils.gif import batch2gif, inverse_transform
from zeroshotvideoclassification_tpu.utils.logging import MetricsLogger, Timer


def test_savename_parity():
    cfg = Config(dataset="kinetics2oboth", clip_len=16, lr=1e-3,
                 network="r2plus1d_18", bs=22, class_overlap=0.04)
    name = cfg.savename(n_devices=1)
    # reference format: CLIP%d_LR%f_%s_BS%d + _CLASSOVERLAP%.2f (main.py:75-80)
    assert name.endswith(
        "kinetics2oboth/CLIP16_LR0.001000_r2plus1d_18_BS22_CLASSOVERLAP0.04")
    cfg2 = cfg.replace(fixconvs=True, nopretrained=True, class_total=60,
                       train_samples=500)
    n2 = cfg2.savename(2)  # global bs doubles with 2 data shards
    assert "_BS44_" in n2 and n2.endswith(
        "_CLASSOVERLAP0.04_NCLASS60_NTRAIN500_FixedConvs_NotPretrained")
    cfg3 = cfg.replace(split=3)
    assert cfg3.savename(1).endswith("split3")


def test_config_json_roundtrip():
    cfg = Config(network="c3d", bs=7, canvas_hw=(128, 160))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_config_from_args_parity_flags():
    cfg = config_from_args([
        "--dataset", "kinetics2others", "--network", "c3d", "--fixconvs",
        "--nopretrained", "--clip_len", "8", "--class_overlap", "0.1"])
    assert cfg.dataset == "kinetics2others" and cfg.network == "c3d"
    assert cfg.fixconvs and cfg.nopretrained
    assert cfg.clip_len == 8 and cfg.class_overlap == 0.1


def test_inverse_transform_roundtrip(rng):
    frames_u8 = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    normed = ((frames_u8.astype(np.float32) / 255.0) - 1.0) / 2.0
    back = inverse_transform(normed, mode="active")
    np.testing.assert_array_equal(back, frames_u8)


def test_batch2gif_writes_file(tmp_path, rng):
    frames = rng.uniform(-0.5, 0, size=(4, 16, 16, 3)).astype(np.float32)
    path = batch2gif(frames, 1, str(tmp_path) + "/sample_", classes=["a", "b/c"])
    assert os.path.exists(path) and path.endswith("b_c.gif")


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path), use_tensorboard=False)
    log.scalar("Train/Loss", 0.5, 1)
    log.scalars({"a": 1.0, "b": 2}, 2, prefix="x/")
    log.csv_append("foo_accuracy.csv", "0, 1.0,2.0")
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert {l["tag"] for l in lines} == {"Train/Loss", "x/a", "x/b"}
    assert open(tmp_path / "foo_accuracy.csv").read() == "0, 1.0,2.0\n"


def test_timer_accumulates():
    t = Timer()
    with t:
        pass
    with t:
        pass
    assert t.total >= 0


def test_step_stats_summary():
    from zeroshotvideoclassification_tpu.utils.profiler import StepStats

    s = StepStats(warmup=1)
    assert s.summary() == {}
    for _ in range(5):
        s.tick()
    out = s.summary(items_per_step=16)
    assert out["n"] == 3  # 4 intervals, 1 warmup dropped
    assert out["items_per_sec"] > 0
    assert out["p50_s"] <= out["p90_s"]


def test_device_trace_writes_profile(tmp_path):
    import glob

    import jax
    import jax.numpy as jnp

    from zeroshotvideoclassification_tpu.utils.profiler import device_trace

    with device_trace(str(tmp_path)):
        jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert glob.glob(str(tmp_path / "plugins" / "profile" / "*" / "*"))


def test_gif_inverse_meanstd_scheme():
    """The SUN/upstream mean-std scheme must round-trip too (SURVEY quirk #5:
    the reference's inverse assumed the DISABLED scheme; ours handles both)."""
    from zeroshotvideoclassification_tpu.data.stillimages import (
        KINETICS_MEAN,
        KINETICS_STD,
    )

    src = np.random.default_rng(0).integers(0, 256, (3, 6, 7, 3), np.uint8)
    meanstd = (src.astype(np.float32) / 255.0 - KINETICS_MEAN) / KINETICS_STD
    np.testing.assert_array_equal(inverse_transform(meanstd, "meanstd"), src)
    with pytest.raises(ValueError):
        inverse_transform(meanstd, "nope")


def test_batch2gif_readback(tmp_path, rng):
    imageio = pytest.importorskip("imageio")
    frames = rng.uniform(-0.5, 0, (4, 8, 8, 3)).astype(np.float32)
    path = batch2gif(frames, 0, str(tmp_path) + "/ep0_", classes=["a"])
    back = imageio.mimread(path)
    assert len(back) == 4 and back[0].shape[:2] == (8, 8)


def test_tpu_compiler_options_gating(monkeypatch):
    """Tuned XLA flags ship ONLY on TPU backends; env kill-switch + JSON
    override; the returned dict is a fresh copy (callers may mutate)."""
    import jax

    from zeroshotvideoclassification_tpu.utils import xla_tuning

    # CI runs on the forced-CPU backend -> no options.
    monkeypatch.delenv("ZSVC_XLA_TUNING", raising=False)
    monkeypatch.delenv("ZSVC_XLA_FLAGS", raising=False)
    assert jax.default_backend() == "cpu"
    assert xla_tuning.tpu_compiler_options() is None

    # Simulated TPU backend -> the per-program tuned set, as an
    # independent copy.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    opts = xla_tuning.tpu_compiler_options()
    assert opts == xla_tuning.TUNED_TPU_TRAIN_OPTIONS
    assert (xla_tuning.tpu_compiler_options("eval")
            == xla_tuning.TUNED_TPU_EVAL_OPTIONS)
    assert opts != xla_tuning.tpu_compiler_options("eval")
    opts["xla_tpu_scoped_vmem_limit_kib"] = "1"
    assert xla_tuning.tpu_compiler_options() != opts
    with pytest.raises(ValueError):
        xla_tuning.tpu_compiler_options("serve")

    # Kill switch wins over everything.
    monkeypatch.setenv("ZSVC_XLA_TUNING", "0")
    assert xla_tuning.tpu_compiler_options() is None
    monkeypatch.delenv("ZSVC_XLA_TUNING")

    # JSON override replaces the tuned set entirely.
    monkeypatch.setenv("ZSVC_XLA_FLAGS", '{"xla_tpu_foo": "7"}')
    assert xla_tuning.tpu_compiler_options() == {"xla_tpu_foo": "7"}


def test_tpu_compiler_options_keyed_override(monkeypatch):
    """ZSVC_XLA_FLAGS keyed form overrides per program; a missing key keeps
    that program's shipped set; the flat form applies to both."""
    import jax

    from zeroshotvideoclassification_tpu.utils import xla_tuning

    monkeypatch.delenv("ZSVC_XLA_TUNING", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.setenv("ZSVC_XLA_FLAGS",
                       '{"train": {"xla_a": "1"}}')
    assert xla_tuning.tpu_compiler_options("train") == {"xla_a": "1"}
    assert (xla_tuning.tpu_compiler_options("eval")
            == xla_tuning.TUNED_TPU_EVAL_OPTIONS)

    monkeypatch.setenv("ZSVC_XLA_FLAGS",
                       '{"train": {"xla_a": "1"}, "eval": {}}')
    assert xla_tuning.tpu_compiler_options("eval") == {}

    monkeypatch.setenv("ZSVC_XLA_FLAGS", '{"xla_flat": "2"}')
    assert xla_tuning.tpu_compiler_options("train") == {"xla_flat": "2"}
    assert xla_tuning.tpu_compiler_options("eval") == {"xla_flat": "2"}


def test_enable_persistent_cache(monkeypatch, tmp_path):
    """CLI cache helper: honors ZSVC_XLA_CACHE dir override and '0' disable;
    restores global config afterwards so other tests see the default."""
    import jax

    from zeroshotvideoclassification_tpu.utils.xla_tuning import (
        enable_persistent_cache,
    )

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv("ZSVC_XLA_CACHE", "0")
        enable_persistent_cache(str(tmp_path / "unused"))
        assert jax.config.jax_compilation_cache_dir == old_dir

        monkeypatch.setenv("ZSVC_XLA_CACHE", str(tmp_path / "cache"))
        enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")

        monkeypatch.delenv("ZSVC_XLA_CACHE")
        enable_persistent_cache(str(tmp_path / "default"))
        assert (jax.config.jax_compilation_cache_dir
                == str(tmp_path / "default"))
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


def test_config_from_json_ignores_unknown_keys():
    """Checkpoints carry the writer's config_json; a different framework
    version must still parse it (e.g. the removed keep_bn_fp32 field)."""
    cfg = Config.from_json(
        '{"bs": 7, "keep_bn_fp32": false, "future_flag": "x"}')
    assert cfg.bs == 7
