"""SUN still-image camera-motion path: trajectory math + device kernel parity.

Two device kernels, two oracles:
  * plain-bilinear kernel (--no-sun_antialias): torch non-antialiased
    bilinear resize (half-pixel, size-ratio mapping);
  * ANTIALIASED kernel (Config.sun_antialias, the default): the reference's
    actual semantics — torchvision Resize on a PIL image
    (/root/reference/auxiliary/auxiliary_stillimages.py:56-62,130-134), i.e.
    PIL's scaled-triangle-filter bilinear. Oracled twice: tight against
    torch `interpolate(..., antialias=True)` (same float math) and loose
    against PIL itself (PIL rounds to uint8 between the horizontal and
    vertical passes, bounding the gap at ~1.5/255 per channel).
Both apply per-channel Kinetics mean/std normalization.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from zeroshotvideoclassification_tpu.config import Config
from zeroshotvideoclassification_tpu.data.datasets import VideoTable
from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline, device_batch
from zeroshotvideoclassification_tpu.data.stillimages import (
    KINETICS_MEAN,
    KINETICS_STD,
    camera_motion_trajectory,
    motion_resample_indices,
)
from zeroshotvideoclassification_tpu.ops.resample import (
    fused_image_motion_transform,
)

CROP = 112


def test_trajectory_bounds(rng):
    for _ in range(20):
        hw = (int(rng.integers(180, 400)), int(rng.integers(180, 400)))
        traj = camera_motion_trajectory(hw, CROP, 16, rng)
        assert traj.shape == (16, 3)
        y, x, side = traj[:, 0], traj[:, 1], traj[:, 2]
        assert (side >= CROP).all()
        assert (y >= 0).all() and (x >= 0).all()
        assert (y + side <= hw[0] + 1).all() and (x + side <= hw[1] + 1).all()


def _oracle_frame(img_u8, y, x, side):
    crop = img_u8[y:y + side, x:x + side].astype(np.float32) / 255.0
    t = torch.from_numpy(crop).permute(2, 0, 1)[None]
    t = F.interpolate(t, size=(CROP, CROP), mode="bilinear", align_corners=False)
    t = (t[0].permute(1, 2, 0).numpy() - KINETICS_MEAN) / KINETICS_STD
    return t


def test_motion_kernel_matches_oracle(rng):
    img = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    traj = camera_motion_trajectory((240, 320), CROP, 4, rng)
    y0, y1, wy, x0, x1, wx = motion_resample_indices(traj, (240, 320), CROP)
    from zeroshotvideoclassification_tpu.data.stillimages import CH_OFFSET, CH_SCALE

    out = np.asarray(fused_image_motion_transform(
        img[None], y0[None], y1[None], wy[None], x0[None], x1[None], wx[None],
        CH_SCALE, CH_OFFSET))
    assert out.shape == (1, 4, CROP, CROP, 3)
    for f, (y, x, side) in enumerate(traj):
        want = _oracle_frame(img, y, x, side)
        np.testing.assert_allclose(out[0, f], want, atol=2e-4)


def test_motion_kernel_matches_oracle_on_overhanging_boxes(rng):
    """Boxes that extend past the image (reachable: load_and_bound_image's
    integer-scale quirk keeps min sides in [87, 111] unscaled, where
    side=112 must overhang) follow the reference semantics — numpy slicing
    truncates the crop at the border and Resize((112,112)) STRETCHES what
    survived (auxiliary_stillimages.py:132-134) — not edge-row repetition."""
    hw = (100, 400)  # min side inside the unscaled [87, 111] window
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    # y+side=112 > 100 on every frame; x overhangs on the last frame too
    traj = np.asarray([[0, 5, 112], [0, 200, 112], [0, 300, 112]])
    y0, y1, wy, x0, x1, wx = motion_resample_indices(traj, hw, CROP)
    from zeroshotvideoclassification_tpu.data.stillimages import CH_OFFSET, CH_SCALE

    out = np.asarray(fused_image_motion_transform(
        img[None], y0[None], y1[None], wy[None], x0[None], x1[None], wx[None],
        CH_SCALE, CH_OFFSET))
    for f, (y, x, side) in enumerate(traj):
        want = _oracle_frame(img, y, x, side)  # numpy-clamped crop + resize
        np.testing.assert_allclose(out[0, f], want, atol=2e-4)


def _aa_kernel(img_u8, traj, hw, impl="mxu"):
    from zeroshotvideoclassification_tpu.data.stillimages import (
        CH_OFFSET,
        CH_SCALE,
    )
    from zeroshotvideoclassification_tpu.ops.resample import (
        fused_image_motion_transform_aa,
    )

    return np.asarray(fused_image_motion_transform_aa(
        img_u8[None], np.asarray(traj, np.int32)[None],
        np.asarray([hw], np.int32), CH_SCALE, CH_OFFSET, crop_size=CROP,
        impl=impl))[0]


def _oracle_frame_aa_torch(img_u8, y, x, side):
    crop = img_u8[y:y + side, x:x + side].astype(np.float32) / 255.0
    t = torch.from_numpy(crop).permute(2, 0, 1)[None]
    t = F.interpolate(t, size=(CROP, CROP), mode="bilinear",
                      align_corners=False, antialias=True)
    return (t[0].permute(1, 2, 0).numpy() - KINETICS_MEAN) / KINETICS_STD


def _oracle_frame_aa_pil(img_u8, y, x, side):
    from PIL import Image

    crop = img_u8[y:y + side, x:x + side]
    r = np.asarray(Image.fromarray(crop).resize((CROP, CROP), Image.BILINEAR),
                   np.float32) / 255.0
    return (r - KINETICS_MEAN) / KINETICS_STD


@pytest.mark.parametrize("impl", ["mxu", "gather"])
def test_aa_motion_kernel_matches_torch_antialias(rng, impl):
    """Float-exact (1e-4) agreement with torch's antialiased bilinear."""
    img = rng.integers(0, 256, size=(384, 460, 3), dtype=np.uint8)
    traj = camera_motion_trajectory((384, 460), CROP, 6, rng)
    out = _aa_kernel(img, traj, (384, 460), impl)
    for f, (y, x, side) in enumerate(traj):
        want = _oracle_frame_aa_torch(img, y, x, side)
        np.testing.assert_allclose(out[f], want, atol=2e-3)


@pytest.mark.parametrize("impl", ["mxu", "gather"])
def test_aa_motion_kernel_matches_pil(rng, impl):
    """PIL (the reference's actual resize) agreement within its own uint8
    inter-pass rounding: 2/255 per channel pre-normalization."""
    img = rng.integers(0, 256, size=(300, 512, 3), dtype=np.uint8)
    traj = camera_motion_trajectory((300, 512), CROP, 6, rng)
    out = _aa_kernel(img, traj, (300, 512), impl)
    tol = 2.0 / 255.0 / KINETICS_STD.min()
    for f, (y, x, side) in enumerate(traj):
        want = _oracle_frame_aa_pil(img, y, x, side)
        assert np.abs(out[f] - want).max() < tol


@pytest.mark.parametrize("impl", ["mxu", "gather"])
def test_aa_motion_kernel_overhanging_and_upscale(rng, impl):
    """The clamp-stretch quirk and the upscale degenerate case both follow
    PIL: an overhanging box resizes only the surviving extent; a crop
    smaller than 112 (min side in [87, 111] survives the integer-scale
    bound) upscales with plain bilinear (PIL disables the filter scale when
    scale < 1)."""
    hw = (100, 400)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    traj = np.asarray([[0, 5, 112], [0, 340, 112], [0, 10, 250]])
    out = _aa_kernel(img, traj, hw, impl)
    for f, (y, x, side) in enumerate(traj):
        want_t = _oracle_frame_aa_torch(img, y, x, side)
        np.testing.assert_allclose(out[f], want_t, atol=2e-3)
        want_p = _oracle_frame_aa_pil(img, y, x, side)
        assert np.abs(out[f] - want_p).max() < 2.0 / 255.0 / KINETICS_STD.min()


@pytest.mark.parametrize("impl", ["mxu", "gather"])
def test_aa_zero_weight_sample_is_finite(impl):
    """All-zero trajectory rows (broken samples) must produce finite output
    (weight 0 masks them downstream, but NaNs would poison debug_nans)."""
    img = np.zeros((64, 64, 3), np.uint8)
    out = _aa_kernel(img, np.zeros((4, 3), np.int32), (64, 64), impl)
    assert np.isfinite(out).all()


def test_aa_gather_rejects_insufficient_max_taps():
    """The gather impl must REFUSE (trace time) rather than silently drop
    filter taps: a 512-canvas -> 64 resize needs ~18 taps, above the
    default 11."""
    from zeroshotvideoclassification_tpu.data.stillimages import (
        CH_OFFSET,
        CH_SCALE,
    )
    from zeroshotvideoclassification_tpu.ops.resample import (
        fused_image_motion_transform_aa,
    )

    img = np.zeros((1, 512, 512, 3), np.uint8)
    traj = np.zeros((1, 2, 3), np.int32)
    hw = np.asarray([[512, 512]], np.int32)
    with pytest.raises(ValueError, match="max_taps"):
        fused_image_motion_transform_aa(
            img, traj, hw, CH_SCALE, CH_OFFSET, crop_size=64, impl="gather")
    # the mxu impl has no tap cap — same call succeeds
    out = fused_image_motion_transform_aa(
        img, traj, hw, CH_SCALE, CH_OFFSET, crop_size=64, impl="mxu")
    assert out.shape == (1, 2, 64, 64, 3)
    with pytest.raises(ValueError, match="impl"):
        fused_image_motion_transform_aa(
            img, traj, hw, CH_SCALE, CH_OFFSET, crop_size=64, impl="MXU")


@pytest.mark.parametrize("aa", [True, False])
def test_sun_pipeline_end_to_end(tmp_path, rng, aa):
    import cv2

    paths = []
    for i in range(4):
        img = rng.integers(0, 256, size=(200, 260, 3), dtype=np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))  # broken sample

    emb = rng.normal(size=(2, 300)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    table = VideoTable(
        name="sun", fnames=np.asarray(paths, object),
        label_idx=np.asarray([0, 1, 0, 1, 0], np.int32),
        classes=["a", "b"], class_embed=emb, loader="image",
        is_validation=False, n_clips=1)
    cfg = Config(dataset="sun2both", clip_len=4, canvas_hw=(512, 512),
                 sun_antialias=aa)
    hb = next(iter(HostPipeline(table, cfg, 5, seed=0)))
    assert hb.image_mode and hb.canvas.shape == (5, 512, 512, 3)
    assert (hb.trajectory is not None) == aa
    assert hb.weight.sum() == 4  # the missing image got weight 0
    batch = device_batch(hb, 1, 4)
    assert batch["x"].shape == (5, 1, 4, CROP, CROP, 3)
    x = np.asarray(batch["x"])
    assert np.isfinite(x).all()
    # normalized scale: values roughly in (-2.1, 2.9) for uint8 inputs
    assert x.min() > -3 and x.max() < 3.5
