"""Offline ActivityNet extractor (tools/extract_activitynet_clips.py).

Parity target: /root/reference/auxiliary/auxiliary_activitynet.py:59-143 —
annotations_all.csv rows, per-segment frame cutting at round(t*fps), height
rescale to 256, uint8 npy output — validated on a synthesized MJPG video whose
frames encode their own index as a solid gray value.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from zeroshotvideoclassification_tpu.tools.extract_activitynet_clips import (  # noqa: E402
    extract_one,
    write_annotations_csv,
)

FPS = 25.0
N_FRAMES = 50
W, H = 64, 48


def _make_source(tmp_path):
    src = tmp_path / "src"
    (src / "training").mkdir(parents=True)
    (src / "validation").mkdir()
    path = str(src / "training" / "v_test1.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS, (W, H))
    assert wr.isOpened()
    for i in range(N_FRAMES):
        wr.write(np.full((H, W, 3), i * 4, np.uint8))
    wr.release()
    database = {
        "v_test1": {
            "subset": "training",
            "annotations": [
                {"segment": [0.4, 1.0], "label": "Doing karate"},
                {"segment": [1.2, 1.6], "label": "Doing karate"},
            ],
        },
        # testing subset must be skipped entirely
        "v_skipme": {"subset": "testing",
                     "annotations": [{"segment": [0, 1], "label": "X"}]},
        # missing file must be a no-op, not an error
        "v_absent": {"subset": "training",
                     "annotations": [{"segment": [0, 1], "label": "Y"}]},
    }
    with open(src / "activity_net.v1.3.min.json", "w") as f:
        json.dump({"database": database}, f)
    return src, database


def test_annotations_csv_rows(tmp_path):
    src, database = _make_source(tmp_path)
    dest = tmp_path / "dest"
    dest.mkdir()
    path = write_annotations_csv(database, str(dest))
    rows = open(path).read().splitlines()
    assert rows == ["v_test1_0,Doing karate", "v_test1_1,Doing karate",
                    "v_skipme_0,X", "v_absent_0,Y"]


def test_extract_segments_frame_ranges_and_rescale(tmp_path):
    src, database = _make_source(tmp_path)
    dest = tmp_path / "dest"
    dest.mkdir()

    assert extract_one(str(src), str(dest), "v_skipme",
                       database["v_skipme"]) is None
    assert extract_one(str(src), str(dest), "v_absent",
                       database["v_absent"]) is None
    written = extract_one(str(src), str(dest), "v_test1", database["v_test1"])
    assert written == 2

    # segment [0.4, 1.0]s @25fps -> frames 10..24; [1.2, 1.6]s -> 30..39
    for k, (start, end) in enumerate([(10, 25), (30, 40)]):
        clip = np.load(dest / f"v_test1_{k}.npy")
        n = end - start
        # height rescaled to 256, width scaled by the same ratio
        assert clip.shape == (n, 256, int(256.0 / H * W), 3)
        assert clip.dtype == np.uint8
        # solid-gray frames encode their index (MJPG is lossy: wide tol)
        got = clip.reshape(n, -1).mean(axis=1)
        want = np.arange(start, end) * 4.0
        np.testing.assert_allclose(got, want, atol=6.0)

    # idempotence: second call short-circuits on the existing last clip
    assert extract_one(str(src), str(dest), "v_test1",
                       database["v_test1"]) == 0


def test_extracted_clips_feed_the_npy_loader(tmp_path):
    """The extractor's output is directly consumable by decode_npy (the
    ActivityNet train/eval path, auxiliary_activitynet.py:22-50)."""
    from zeroshotvideoclassification_tpu.data.decode import decode_npy

    src, database = _make_source(tmp_path)
    dest = tmp_path / "dest"
    dest.mkdir()
    extract_one(str(src), str(dest), "v_test1", database["v_test1"])

    rng = np.random.default_rng(0)
    frames, ok = decode_npy(str(dest / "v_test1_0.npy"), n_clips=1,
                            clip_len=8, is_validation=True, rng=rng)
    assert ok
    assert frames.shape[0] == 8 and frames.dtype == np.uint8
