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
