"""Preemption-recovery CLI tests: periodic checkpoints, --resume auto, and
bit-exact resume determinism.

Split out of test_cli.py so each slow FILE stays under a 10-minute process
budget on a 1-core host (README "Running the tests"): these two tests run
5 full driver jobs between them (~7 min warm-cache).
"""

import glob
import json
import os

from tests.test_cli import _run


def test_periodic_checkpoint_and_auto_resume(tmp_path):
    """Preemption recovery: --checkpoint_every writes <run>/last.npz each N
    epochs; --resume auto picks up the newest full-state checkpoint and
    REUSES the run dir (no _N dedup fork). A fresh dir with --resume auto
    falls through to a normal fresh run."""
    _run(tmp_path, extra=["--checkpoint_every", "1"])
    lasts = glob.glob(str(tmp_path / "**" / "last.npz"), recursive=True)
    assert lasts, "periodic checkpoint must be written"
    run_dir = os.path.dirname(lasts[0])
    n_dirs = len(os.listdir(os.path.dirname(run_dir)))

    summary2 = _run(tmp_path, extra=["--resume", "auto", "--n_epochs", "2",
                                     "--checkpoint_every", "1"])
    assert "best_accuracy" in summary2
    # same run dir continued: no new dedup dir, and last.npz advanced to
    # the resumed epoch
    assert len(os.listdir(os.path.dirname(run_dir))) == n_dirs
    from zeroshotvideoclassification_tpu.train.checkpoint import read_meta

    assert int(read_meta(lasts[0]).get("epoch", -1)) == 1

    # fresh savename + --resume auto = fresh run (no checkpoint to pick up)
    fresh = tmp_path / "fresh"
    summary3 = _run(fresh, extra=["--resume", "auto"])
    assert "loss" in summary3


def test_resume_is_bit_deterministic(tmp_path):
    """Preemption recovery must be EXACT: a run interrupted at an epoch
    boundary and resumed (--resume auto) reproduces the uninterrupted run's
    epoch metrics bit-for-bit. Holds because the host pipeline and device
    rng are seeded per (seed, epoch) — independent of history — and the
    checkpoint stores full state (params + BN stats + optimizer + epoch)."""

    def epoch_metrics(root):
        out = {}
        for p in glob.glob(str(root / "**" / "metrics.jsonl"), recursive=True):
            with open(p) as f:
                for line in f:
                    rec = json.loads(line)
                    out[(rec["tag"], rec["step"])] = rec["value"]
        return out

    a_dir = tmp_path / "uninterrupted"
    _run(a_dir, extra=["--n_epochs", "2", "--checkpoint_every", "1"])
    a = epoch_metrics(a_dir)

    b_dir = tmp_path / "interrupted"
    _run(b_dir, extra=["--n_epochs", "1", "--checkpoint_every", "1"])
    _run(b_dir, extra=["--resume", "auto", "--n_epochs", "2",
                       "--checkpoint_every", "1"])
    b = epoch_metrics(b_dir)

    # the resumed job must see epoch 1 exactly as the uninterrupted one did
    epoch1_tags = [k for k in a if k[1] == 1]
    assert epoch1_tags, sorted(a)
    for k in epoch1_tags:
        assert k in b, (k, sorted(b))
        assert a[k] == b[k], (k, a[k], b[k])
