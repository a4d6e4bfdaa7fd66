"""Serving CLI: zero-shot classify arbitrary videos against arbitrary class
names (cli/infer.py). Covers loader auto-detection (frame dir + .npy in one
call), synthetic word2vec embeddings, precomputed --class_embed npz, ranking
consistency, and the broken-input convention."""

import json
import os

import numpy as np
import pytest

from zeroshotvideoclassification_tpu.cli import infer


@pytest.fixture
def fixtures(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    # a JPEG frame dir (the reference's Kinetics layout)
    d = tmp_path / "vidA" / "images"
    os.makedirs(d)
    for i in range(6):
        cv2.imwrite(str(d / ("img_%05d.jpg" % (i + 1))),
                    rng.integers(0, 255, (64, 80, 3), np.uint8))
    # a pre-extracted npy clip stack
    npy = tmp_path / "clipB.npy"
    np.save(npy, rng.integers(0, 255, (8, 64, 80, 3), np.uint8))
    return str(tmp_path / "vidA"), str(npy)


ARGS = ["--network", "r3d_18", "--clip_len", "2", "--size", "32",
        "--n_clips", "2", "--bs", "2", "--compute_dtype", "float32",
        "--synthetic_word2vec"]


def test_infer_mixed_loaders_and_ranking(fixtures, capsys):
    frame_dir, npy = fixtures
    classes = ["playing guitar", "swimming", "riding a horse"]
    results = infer.main(
        ["--videos", frame_dir, npy, "--classes", *classes, *ARGS])
    assert [r["video"] for r in results] == [frame_dir, npy]
    for r in results:
        assert r["top_class"] in classes
        ks = r["topk"]
        assert len(ks) == 3 and {k["class"] for k in ks} == set(classes)
        sims = [k["similarity"] for k in ks]
        assert sims == sorted(sims, reverse=True)  # ranked by similarity
        assert r["top_class"] == ks[0]["class"]
        assert all(-1.0001 <= s <= 1.0001 for s in sims)
    # stdout is one JSON line per video (the serving contract)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2 and all(json.loads(l)["video"] for l in lines)


def test_infer_class_embed_npz_and_broken_input(fixtures, tmp_path):
    frame_dir, _ = fixtures
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(4, 300)).astype(np.float32)
    ce = tmp_path / "ce.npz"
    np.savez(ce, classes=np.asarray(["a", "b", "c", "d"]),
             embeddings=emb)
    missing = str(tmp_path / "nonexistent_video_dir")
    results = infer.main(["--videos", frame_dir, missing,
                          "--class_embed", str(ce), "--top_k", "2", *ARGS])
    assert results[0]["top_class"] in "abcd" and len(results[0]["topk"]) == 2
    assert results[1] == {"video": missing, "error": "decode failed"}


def test_infer_requires_classes(fixtures):
    frame_dir, _ = fixtures
    with pytest.raises(SystemExit):
        infer.main(["--videos", frame_dir, *ARGS])
