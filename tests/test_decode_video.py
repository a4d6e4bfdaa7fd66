"""decode_video — the reference's load_clips_tsn analog (cv2.VideoCapture
sequential decode + TSN gather, auxiliary_dataset.py:158-208) — against real
encoded video files, standalone and through the host pipeline."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from zeroshotvideoclassification_tpu.config import Config
from zeroshotvideoclassification_tpu.data.datasets import VideoTable
from zeroshotvideoclassification_tpu.data.decode import decode_video
from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline
from zeroshotvideoclassification_tpu.data.sampling import tsn_frame_indices

W, H, N = 64, 48, 40


def _write_video(path, n=N):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25.0,
                         (W, H))
    assert wr.isOpened()
    for i in range(n):
        # one flat gray level per frame: survives MJPG loss well enough to
        # identify which source frame each output row came from
        wr.write(np.full((H, W, 3), i * 6, np.uint8))
    wr.release()


def test_decode_video_validation_matches_tsn_indices(tmp_path):
    p = tmp_path / "v.avi"
    _write_video(p)
    frames, ok = decode_video(str(p), clip_len=4, n_clips=2,
                              is_validation=True)
    assert ok and frames.shape == (8, H, W, 3)
    idx = tsn_frame_indices(N, 4, 2, True, None)
    got = frames.reshape(8, -1).mean(axis=1)
    np.testing.assert_allclose(got, np.asarray(idx, np.float64) * 6.0,
                               atol=3.0)


def test_decode_video_train_start_is_seeded_and_in_range(tmp_path):
    p = tmp_path / "v.avi"
    _write_video(p)
    a, ok_a = decode_video(str(p), 4, 2, False, np.random.default_rng(3))
    b, ok_b = decode_video(str(p), 4, 2, False, np.random.default_rng(3))
    assert ok_a and ok_b
    np.testing.assert_array_equal(a, b)  # same rng -> same TSN windows
    levels = np.round(a.reshape(8, -1).mean(axis=1) / 6.0).astype(int)
    assert levels.min() >= 0 and levels.max() < N
    # consecutive frames within each clip (TSN windows are contiguous)
    for c in range(2):
        np.testing.assert_array_equal(np.diff(levels[c * 4:(c + 1) * 4]), 1)


def test_decode_video_missing_file(tmp_path):
    frames, ok = decode_video(str(tmp_path / "nope.avi"), 4, 1, True)
    assert frames is None and not ok


def test_video_loader_through_pipeline(tmp_path):
    """VideoTable(loader='video') end to end: decode -> canvas fit -> batch,
    including the weight-0 convention for an unreadable file."""
    good = tmp_path / "good.avi"
    _write_video(good)
    bad = tmp_path / "bad.avi"
    bad.write_bytes(b"not a video")
    emb = np.eye(2, 300, dtype=np.float32)
    table = VideoTable(
        name="vidfix",
        fnames=np.asarray([str(good), str(bad)], object),
        label_idx=np.asarray([0, 1], np.int32),
        classes=["a", "b"],
        class_embed=emb,
        loader="video",
        is_validation=True,
        n_clips=1,
    )
    cfg = Config(dataset="synthetic", bs=2, clip_len=4, canvas_hw=(192, 224))
    batches = list(HostPipeline(table, cfg, 2, seed=0))
    assert len(batches) == 1
    hb = batches[0]
    # h2d_window default: static crop-source window of the 192x224 canvas
    assert hb.canvas.shape == (2, 4, 170, 170, 3)
    np.testing.assert_array_equal(hb.weight, [1.0, 0.0])  # bad file masked
    assert hb.label[0] == 0


# ------------------------------------------------- native libav decoder -----

def _native_video_or_skip():
    from zeroshotvideoclassification_tpu.data import native_decode

    if not native_decode.video_available():
        pytest.skip("libzsvc_video.so not built (make -C native)")
    return native_decode


def test_native_probe_matches_cv2(tmp_path):
    nd = _native_video_or_skip()
    p = tmp_path / "v.avi"
    _write_video(p)
    meta = nd.video_probe(str(p))
    assert meta is not None
    n, h, w = meta
    cap = cv2.VideoCapture(str(p))
    assert (n, h, w) == (int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
                         int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                         int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)))
    cap.release()
    assert nd.video_probe(str(tmp_path / "nope.avi")) is None


def test_native_video_matches_cv2(tmp_path, monkeypatch):
    """Bit-level parity of the libav gatherer against the cv2 path on the
    same container (both sit on ffmpeg's MJPEG decoder, so the pixels must
    agree exactly), across validation and seeded-train sampling."""
    _native_video_or_skip()
    p = tmp_path / "v.avi"
    _write_video(p)
    for args in ((4, 2, True, None), (4, 2, False, np.random.default_rng(3)),
                 (6, 1, True, None)):
        cl, nc, val, _ = args
        rng_n = np.random.default_rng(3) if not val else None
        rng_c = np.random.default_rng(3) if not val else None
        a, ok_a = decode_video(str(p), cl, nc, val, rng_n)
        monkeypatch.setenv("ZSVC_NATIVE_VIDEO", "0")
        b, ok_b = decode_video(str(p), cl, nc, val, rng_c)
        monkeypatch.delenv("ZSVC_NATIVE_VIDEO")
        assert ok_a and ok_b
        np.testing.assert_array_equal(a, b)


def test_native_video_loop_padded_indices(tmp_path):
    """clip_len > frame count: TSN loop-pads with REPEATED indices — the
    native gather must dedup, decode once, and fan back out."""
    _native_video_or_skip()
    p = tmp_path / "tiny.avi"
    _write_video(p, n=5)
    frames, ok = decode_video(str(p), clip_len=8, n_clips=1,
                              is_validation=True)
    assert ok and frames.shape == (8, H, W, 3)
    idx = tsn_frame_indices(5, 8, 1, True, None)
    got = np.round(frames.reshape(8, -1).mean(axis=1) / 6.0).astype(int)
    np.testing.assert_array_equal(got, np.asarray(idx))


def test_native_video_unreadable_falls_back_broken(tmp_path):
    _native_video_or_skip()
    bad = tmp_path / "bad.avi"
    bad.write_bytes(b"certainly not a video container")
    frames, ok = decode_video(str(bad), 4, 1, True)
    assert frames is None and not ok
