"""Native C++ libjpeg batch decoder: build (if needed) + parity vs cv2 +
failure semantics + frame-dir pipeline integration."""

import os
import shutil
import subprocess

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


@pytest.fixture(scope="module")
def native():
    from zeroshotvideoclassification_tpu.data import native_decode

    if not native_decode.available():
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no native toolchain")
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr.decode()[:200]}")
        native_decode._lib = None  # force re-probe
    if not native_decode.available():
        pytest.skip("native decoder unavailable")
    return native_decode


def _write_jpegs(tmp_path, rng, n=5, hw=(120, 160)):
    paths, imgs = [], []
    for i in range(n):
        img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
        imgs.append(img)
    return paths, imgs


def test_native_matches_cv2(native, tmp_path, rng):
    paths, _ = _write_jpegs(tmp_path, rng)
    out = native.decode_jpeg_batch(paths)
    ref = np.stack([cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                    for p in paths])
    np.testing.assert_array_equal(out, ref)


def test_native_failure_semantics(native, tmp_path, rng):
    paths, _ = _write_jpegs(tmp_path, rng)
    with open(paths[2], "wb") as f:
        f.write(b"not a jpeg")
    out = native.decode_jpeg_batch(paths)
    np.testing.assert_array_equal(out[2], out[1])  # repeat-last fill
    with open(paths[0], "wb") as f:
        f.write(b"junk")
    assert native.decode_jpeg_batch(paths) is None  # first-frame failure


def test_native_in_frame_dir_decoder(native, tmp_path, rng):
    """decode_frame_dir must produce identical output through the native
    path and the cv2 fallback."""
    from zeroshotvideoclassification_tpu.data import decode as D

    images = tmp_path / "vid" / "images"
    images.mkdir(parents=True)
    for i in range(12):
        img = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
        cv2.imwrite(str(images / ("img_%05d.jpg" % (i + 1))),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    frames_native, ok = D.decode_frame_dir(str(tmp_path / "vid"), 4, 2, True)
    assert ok and frames_native.shape == (8, 96, 128, 3)
    old = D._native
    try:
        D._native = False  # force cv2 fallback
        frames_cv2, ok2 = D.decode_frame_dir(str(tmp_path / "vid"), 4, 2, True)
    finally:
        D._native = old
    assert ok2
    np.testing.assert_array_equal(frames_native, frames_cv2)


# ------------------------------------------------------------ DCT scaling ---
# Config.decode_scale: oversized JPEGs decode directly at 1/2, 1/4 or 1/8 via
# libjpeg's DCT-domain scaling (input-pipeline throughput lever; default off
# for bit-exact parity with the reference's full decode,
# auxiliary_dataset.py:211-266).


def _write_one(tmp_path, img, name="a.jpg"):
    p = str(tmp_path / name)
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
    return p


def test_scaled_dims_are_ceil(native, tmp_path, rng):
    p = _write_one(tmp_path, rng.integers(0, 256, (250, 339, 3), np.uint8))
    for d in (1, 2, 4, 8):
        assert native.jpeg_dims(p, d) == (-(-250 // d), -(-339 // d))


def test_scaled_decode_matches_pil_draft(native, tmp_path, rng):
    """PIL's draft mode drives the same libjpeg scaled-IDCT path — a
    bit-exactness oracle for every supported denominator."""
    PIL_Image = pytest.importorskip("PIL.Image")
    if not native.has_scaled_decode():
        pytest.skip("library predates scaled decode")
    # dims divisible by 8 so PIL's draft picks the exact same denominator
    p = _write_one(tmp_path, rng.integers(0, 256, (256, 344, 3), np.uint8))
    for d in (2, 4, 8):
        h, w = native.jpeg_dims(p, d)
        out = native.decode_jpeg_batch([p], scale_denom=d)[0]
        im = PIL_Image.open(p)
        im.draft("RGB", (w, h))
        pil = np.asarray(im)
        assert pil.shape == (h, w, 3)
        np.testing.assert_array_equal(out, pil)


def test_scaled_decode_approximates_box_downsample(native, tmp_path):
    """1/2 DCT scaling is a low-pass + decimate: on smooth content it sits
    within ~1 LSB of a true 2x2 box filter of the full decode."""
    if not native.has_scaled_decode():
        pytest.skip("library predates scaled decode")
    yy, xx = np.mgrid[0:256, 0:344]
    smooth = np.stack([(yy * 0.5 + xx * 0.3) % 256, (xx * 0.7) % 256,
                       (yy * 0.9) % 256], -1).astype(np.uint8)
    p = _write_one(tmp_path, smooth)
    full = native.decode_jpeg_batch([p])[0].astype(np.float32)
    half = native.decode_jpeg_batch([p], scale_denom=2)[0].astype(np.float32)
    box = full.reshape(128, 2, 172, 2, 3).mean((1, 3))
    diff = np.abs(half - box)
    assert diff.mean() < 1.0 and diff.max() <= 2.0


def test_pick_decode_denom_never_upsamples():
    from zeroshotvideoclassification_tpu.data.decode import pick_decode_denom

    # 256-short-side Kinetics frames, target short side 128 -> exactly 1/2
    assert pick_decode_denom((256, 342), 8, 128) == 2
    # plenty of margin -> deeper scaling, capped by the config
    assert pick_decode_denom((1080, 1920), 8, 128) == 8
    assert pick_decode_denom((1080, 1920), 4, 128) == 4
    assert pick_decode_denom((1080, 1920), 1, 128) == 1
    # already at/below target -> full decode
    assert pick_decode_denom((128, 171), 8, 128) == 1
    assert pick_decode_denom((96, 128), 8, 128) == 1
    # ceil semantics: 255/2 -> 128 still covers 128
    assert pick_decode_denom((255, 340), 8, 128) == 2


def test_frame_dir_scaled_decode(native, tmp_path, rng):
    """scale_cap halves big sources, leaves small ones at full size, and the
    cv2 fallback (no native) ignores the hint but still succeeds."""
    from zeroshotvideoclassification_tpu.data import decode as D

    big = tmp_path / "big" / "images"
    big.mkdir(parents=True)
    for i in range(8):
        img = rng.integers(0, 256, (256, 342, 3), np.uint8)
        cv2.imwrite(str(big / ("img_%05d.jpg" % (i + 1))),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    frames, ok = D.decode_frame_dir(str(tmp_path / "big"), 4, 1, True,
                                    scale_cap=8, min_short_side=128)
    assert ok and frames.shape == (4, 128, 171, 3)

    small = tmp_path / "small" / "images"
    small.mkdir(parents=True)
    for i in range(8):
        img = rng.integers(0, 256, (140, 180, 3), np.uint8)
        cv2.imwrite(str(small / ("img_%05d.jpg" % (i + 1))),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    frames, ok = D.decode_frame_dir(str(tmp_path / "small"), 4, 1, True,
                                    scale_cap=8, min_short_side=128)
    assert ok and frames.shape == (4, 140, 180, 3)

    old = D._native
    try:
        D._native = False
        frames, ok = D.decode_frame_dir(str(tmp_path / "big"), 4, 1, True,
                                        scale_cap=8, min_short_side=128)
    finally:
        D._native = old
    assert ok and frames.shape == (4, 256, 342, 3)


def test_pipeline_decode_scale_integration(native, tmp_path, rng):
    """HostPipeline with decode_scale=2: static batch shapes are unchanged
    (canvas contract), every sample decodes, and the packed frames are the
    scaled decode (top-left window matches bit-for-bit)."""
    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.data.datasets import VideoTable
    from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline

    n_videos, n_frames = 3, 12
    fnames = []
    for v in range(n_videos):
        images = tmp_path / f"vid{v}" / "images"
        images.mkdir(parents=True)
        for i in range(n_frames):
            img = rng.integers(0, 256, (256, 342, 3), np.uint8)
            cv2.imwrite(str(images / ("img_%05d.jpg" % (i + 1))),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        fnames.append(str(tmp_path / f"vid{v}"))

    class_embed = rng.normal(size=(2, 300)).astype(np.float32)
    table = VideoTable(
        fnames=np.asarray(fnames, object),
        label_idx=np.zeros(n_videos, np.int32),
        classes=["a", "b"],
        class_embed=class_embed, n_clips=1, is_validation=True,
        loader="frame_dir", name="t")
    # h2d_window off -> frames pack top-left at their natural size, so the
    # canvas window can be compared bit-for-bit against the scaled decode
    cfg = Config(bs=n_videos, clip_len=4, decode_scale=2, h2d_window=False)
    batches = list(HostPipeline(table, cfg, batch_size=n_videos))
    assert len(batches) == 1
    hb = batches[0]
    assert hb.weight.sum() == n_videos
    # the canvas carries 128x171 frames (halved), not 256x342
    from zeroshotvideoclassification_tpu.data.decode import decode_frame_dir
    ref, ok = decode_frame_dir(fnames[0], 4, 1, True,
                               scale_cap=2, min_short_side=128)
    assert ok and ref.shape[1:3] == (128, 171)
    np.testing.assert_array_equal(hb.canvas[0][:, :128, :171], ref)
