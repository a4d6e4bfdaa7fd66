"""End-to-end CLI smoke: train + zero-shot eval + checkpoint on the
synthetic dataset (tiny shapes; 8-device CPU mesh). The preemption-recovery
runs live in test_cli_resume.py so each slow FILE fits a 10-minute process
budget on a 1-core host (README "Running the tests")."""

import glob
import json
import os

import numpy as np

from zeroshotvideoclassification_tpu.cli.main import Experiment
from zeroshotvideoclassification_tpu.config import config_from_args
from zeroshotvideoclassification_tpu.data.datasets import build_datasets

ARGS = [
    "--dataset", "synthetic", "--class_total", "4", "--train_samples", "16",
    "--bs", "8", "--n_epochs", "1", "--clip_len", "2", "--size", "32",
    "--network", "r3d_18", "--compute_dtype", "float32", "--seed", "1",
]


def _run(tmp_path, extra=(), **cfg_overrides):
    cfg = config_from_args(ARGS + ["--save_path", str(tmp_path)] + list(extra))
    # keep eval cheap on the 1-core CPU host: 2 clips/video under --evaluate
    # (training-time validation uses n_clips=1, reference dataset.py:134);
    # nopretrained keeps these runs hermetic (no asset autoload)
    cfg = cfg.replace(eval_n_clips_both=2, eval_n_clips_others=2,
                      nopretrained=True, **cfg_overrides)
    exp = Experiment(cfg, build_datasets(cfg, None))
    return exp.run()


def test_cli_train_eval_checkpoint_resume(tmp_path):
    summary = _run(tmp_path)
    assert "loss" in summary and np.isfinite(summary["loss"])
    assert 0 <= summary["synthetic_test_accuracy"] <= 100

    ckpts = glob.glob(str(tmp_path / "**" / "checkpoint.npz"), recursive=True)
    assert ckpts, "best checkpoint must be written"
    run_dir = os.path.dirname(ckpts[0])
    # observability surface: CSV appender + metrics.jsonl + stamp file
    assert os.path.exists(os.path.join(run_dir, "synthetic_test_accuracy.csv"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert glob.glob(os.path.join(run_dir, "train_samples_*_*.txt"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        tags = {json.loads(l)["tag"] for l in f}
    assert "synthetic_test/Accuracy" in tags

    # full resume continues from the saved epoch
    summary2 = _run(tmp_path, extra=["--resume", ckpts[0], "--n_epochs", "2"])
    assert "best_accuracy" in summary2

    # evaluation-only mode loads the checkpoint and skips training — and is
    # READ-ONLY: it must not write a checkpoint as a side effect of the
    # save-best path (accuracy is still tracked in the summary)
    summary3 = _run(tmp_path, extra=["--evaluate", "--weights", ckpts[0]])
    assert "loss" not in summary3
    assert 0 <= summary3["synthetic_test_accuracy"] <= 100
    assert summary3["best_accuracy"] == summary3["synthetic_test_accuracy"]
    assert not glob.glob(str(tmp_path / "**" / "evaluation" / "*.npz"),
                         recursive=True)

    # fused multi-step dispatch: same run with --steps_per_call 2 exercises
    # the pending/flush/stack trainer path (incl. the odd-tail single-step
    # drain: 2 batches/epoch -> one scan group of 2 after the cap check);
    # --save_samples additionally dumps a debug GIF of the first clip
    summary4 = _run(tmp_path, extra=["--steps_per_call", "2", "--save_samples"])
    assert np.isfinite(summary4["loss"])
    assert glob.glob(str(tmp_path / "**" / "samples" / "*.gif"), recursive=True)


def test_pretrained_autoload_changes_init(tmp_path):
    """--nopretrained is a REAL switch (reference quirk #3): with it unset the
    trainer auto-loads the ported backbone from pretrained_dir and trains one
    epoch warm-started; with it set, init stays random."""
    import jax
    import torch

    from tests.test_porting import _export_video_resnet
    from zeroshotvideoclassification_tpu.models.resnet3d import r3d_18
    from zeroshotvideoclassification_tpu.tools.port_checkpoint import (
        main as port_main,
    )

    bb_params, bb_state = jax.jit(r3d_18().init)(jax.random.PRNGKey(123))
    src = str(tmp_path / "src.pth")
    torch.save(_export_video_resnet(bb_params, bb_state, "r3d_18"), src)
    pdir = str(tmp_path / "pretrained")
    port_main(["--src", src, "--network", "r3d_18",
               "--out", f"{pdir}/r3d_18.npz"])

    cfg = config_from_args(ARGS + ["--save_path", str(tmp_path / "exp")])
    cfg = cfg.replace(eval_n_clips_both=2, eval_n_clips_others=2,
                      pretrained_dir=pdir)
    ds = build_datasets(cfg, None)

    exp = Experiment(cfg, ds)
    got = np.asarray(exp.state.params["backbone"]["stem"]["conv1"]["w"])
    np.testing.assert_array_equal(got, np.asarray(bb_params["stem"]["conv1"]["w"]))
    got_bn = np.asarray(exp.state.model_state["backbone"]["stem"]["bn1"]["var"])
    np.testing.assert_array_equal(got_bn,
                                  np.asarray(bb_state["stem"]["bn1"]["var"]))
    summary = exp.run()  # one warm-started epoch end-to-end
    assert np.isfinite(summary["loss"])

    exp2 = Experiment(cfg.replace(nopretrained=True), ds)
    rand = np.asarray(exp2.state.params["backbone"]["stem"]["conv1"]["w"])
    assert not np.array_equal(rand, got)


def test_sun2both_route_end_to_end(tmp_path):
    """SUN image pretraining driven through the full trainer: _compose_sun ->
    camera-motion inflation -> train epoch -> zero-shot eval on video test
    sets. Also pins the reference's halved image-train batch
    (/root/reference/dataset.py:26: `opt.bs // 2` for image training),
    replicated here at per-device granularity."""
    import json as _json

    import cv2
    import jax

    from zeroshotvideoclassification_tpu.text import SyntheticWordVectors

    root = tmp_path / "data"
    rng = np.random.default_rng(0)

    # SUN397 fixture: 2 classes x 3 images
    sun = root / "SUN397"
    (sun).mkdir(parents=True)
    (sun / "ClassName.txt").write_text("/a/abbey\n/b/beach\n")
    for cp in ("/a/abbey", "/b/beach"):
        d = str(sun) + cp
        os.makedirs(d)
        for i in range(3):
            img = rng.integers(0, 255, (200, 260, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f"img{i}.jpg"), img)

    # UCF/HMDB test fixtures with real JPEG frames
    def write_frames(d, n=4):
        os.makedirs(d)
        for i in range(n):
            frame = rng.integers(0, 255, (80, 100, 3), np.uint8)
            cv2.imwrite(os.path.join(d, "img_%05d.jpg" % (i + 1)), frame)

    for name in ("v_Basketball_g01_c01", "v_Diving_g01_c01"):
        write_frames(str(root / "UCF101" / "frames" / name / "images"))
    hm = root / "HMDB51"
    write_frames(str(hm / "frames" / "vidA" / "images"))
    (hm / "hmdb51_classes.txt").write_text("climb 0\n")
    (hm / "hmdb51.json").write_text(_json.dumps(
        {"database": {"vidA": {"annotations": 0}}}))

    cfg = config_from_args([
        "--dataset", "sun2both", "--bs", "4", "--n_epochs", "1",
        "--clip_len", "2", "--size", "32", "--network", "r3d_18",
        "--compute_dtype", "float32", "--nopretrained",
        "--save_path", str(tmp_path / "exp"), "--data_root", str(root)])
    ds = build_datasets(cfg, SyntheticWordVectors())
    assert ds["training"][0].loader == "image"
    assert [t.name for t in ds["testing"]] == ["ucf101", "hmdb51"]

    exp = Experiment(cfg, ds)
    summary = exp.run()
    assert np.isfinite(summary["loss"])
    assert 0 <= summary["ucf101_accuracy"] <= 100
    assert 0 <= summary["hmdb51_accuracy"] <= 100

    # halved image-train batch: 6 SUN samples / (bs//2 * n_data) batches
    n_data = exp.mesh.shape.get("data", 1)
    pipe_bs = max(cfg.bs // 2, 1) * n_data // jax.process_count()
    assert pipe_bs == 2 * n_data


def test_eval_batch_size():
    from zeroshotvideoclassification_tpu.cli.main import eval_batch_size

    # reference semantics floor: global_bs // n_clips, before the clip-budget
    # floor kicks in the result is at least that (dataset.py:75,131)
    # big table, 1 clip/video, budget 128, 1 device: floor at 128 clips
    assert eval_batch_size(16, 1, 1, 1, 10_000, 128) == 128
    # 25 clips/video: ceil(128/25) = 6 videos -> >= 128 clips per dispatch
    bs = eval_batch_size(16, 25, 1, 1, 10_000, 128)
    assert bs * 25 >= 128 and bs == 6
    # 8-way data mesh wants 8*128 clips and a multiple of 8 videos
    bs = eval_batch_size(16, 25, 8, 1, 10_000, 128)
    assert bs % 8 == 0 and bs * 25 >= 8 * 128
    # tiny table: capped at table size rounded up to the shard multiple
    assert eval_batch_size(16, 1, 8, 1, 10, 128) == 16
    assert eval_batch_size(16, 1, 1, 1, 3, 128) == 3
    # process_count divides the global batch evenly too (lcm rounding)
    bs = eval_batch_size(16, 1, 8, 2, 10_000, 128)
    assert bs % 8 == 0 and bs % 2 == 0 and bs >= 8 * 128
    # without the budget (0) the reference scale-down survives unchanged
    assert eval_batch_size(100, 25, 1, 1, 10_000, 0) == 4
    # ... and budget 0 skips the tiny-table cap too — the restore is EXACT
    # (only shard-divisibility rounding remains)
    assert eval_batch_size(16, 1, 1, 1, 3, 0) == 16
    assert eval_batch_size(16, 1, 8, 1, 3, 0) == 16


def test_tp_flag_builds_model_axis_and_trains(tmp_path):
    """--tp N: CLI-level tensor parallelism — (data=-1, model=N) mesh, head
    MLP sharded over 'model', full train+eval green on the virtual mesh."""
    cfg = config_from_args(["--tp", "2"])
    assert cfg.mesh_shape == (-1, 2) and cfg.mesh_axes == ("data", "model")
    summary = _run(tmp_path, extra=["--tp", "2"])
    assert np.isfinite(summary["loss"])
    assert 0 <= summary["synthetic_test_accuracy"] <= 100


def test_tp_experiment_commits_model_axis_shardings(tmp_path):
    """--tp 2 must actually PLACE the head weights — and the Adam moments
    that update them — on the 'model' mesh axis, not merely build the mesh
    (round-2 advisor finding: the state was device_put replicated, so the
    flag silently halved data parallelism with zero tensor-parallel
    benefit)."""
    import jax
    from jax.sharding import PartitionSpec as P

    cfg = config_from_args(ARGS + ["--save_path", str(tmp_path),
                                   "--tp", "2"])
    cfg = cfg.replace(eval_n_clips_both=2, eval_n_clips_others=2,
                      nopretrained=True)
    exp = Experiment(cfg, build_datasets(cfg, None))
    fc1 = exp.state.params["head"]["fc1"]["w"]
    fc2 = exp.state.params["head"]["fc2"]["w"]
    assert fc1.sharding.spec == P(None, "model"), fc1.sharding
    assert fc2.sharding.spec == P("model", None), fc2.sharding
    # backbone stays replicated (DP is the win for an 18-layer conv net)
    stem = exp.state.params["backbone"]["stem"]["conv1"]["w"]
    assert stem.sharding.spec == P()
    # optimizer moments mirror the param shardings (mu AND nu of fc1/fc2)
    n_tp_moments = sum(
        1 for path, leaf in
        jax.tree_util.tree_flatten_with_path(exp.state.opt_state)[0]
        if np.ndim(leaf) == 2 and "model" in str(leaf.sharding.spec))
    assert n_tp_moments >= 4, n_tp_moments


def test_flag_polish_parses():
    """Round-3 flag fixes: --progressbar is a real on/off pair (it was a
    store_true with default=True — permanently on); --prefetch_depth and
    --canvas_hw are CLI-visible."""
    cfg = config_from_args(["--no-progressbar", "--prefetch_depth", "3",
                            "--canvas_hw", "128", "160"])
    assert cfg.progressbar is False
    assert cfg.prefetch_depth == 3
    assert cfg.canvas_hw == (128, 160)
    assert config_from_args([]).progressbar is True

