"""Device transform kernel parity vs the reference CPU chain (torch oracle).

The oracle reproduces /root/reference/auxiliary/transforms.py:41-56 exactly:
uint8 -> (x/255 - 1)/2 -> F.interpolate(scale_factor=128/min(h,w), bilinear,
align_corners=False) -> crop 112 -> optional horizontal flip.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from zeroshotvideoclassification_tpu.data.transform_params import (
    TransformParams,
    make_transform_params,
    resample_indices,
    resized_dims,
)
from zeroshotvideoclassification_tpu.ops.resample import fused_video_transform

CROP = 112


def torch_reference_chain(frames_u8, crop_ij, flip, short_side=128):
    """frames_u8: [T, h, w, 3] uint8 -> [T, 112, 112, 3] float32."""
    vid = torch.from_numpy(frames_u8)
    x = (vid.permute(3, 0, 1, 2).to(torch.float32) / 255 - 1.0) / 2.0  # [C,T,h,w]
    scale = float(short_side) / min(x.shape[-2:])
    x = F.interpolate(x, scale_factor=scale, mode="bilinear", align_corners=False)
    i, j = crop_ij
    x = x[..., i : i + CROP, j : j + CROP]
    if flip:
        x = x.flip(dims=(-1,))
    return x.permute(1, 2, 3, 0).numpy()  # [T, 112, 112, C]


def _run_kernel(batch_frames, src_hw, crop_ij, flip, canvas_hw=(256, 342)):
    b = len(batch_frames)
    t = batch_frames[0].shape[0]
    canvas = np.zeros((b, t, canvas_hw[0], canvas_hw[1], 3), np.uint8)
    for k, fr in enumerate(batch_frames):
        canvas[k, :, : fr.shape[1], : fr.shape[2]] = fr
    params = TransformParams(
        src_hw=np.asarray(src_hw, np.int32),
        scale=np.asarray(
            [resized_dims(h, w, 128)[2] for h, w in src_hw], np.float32
        ),
        crop_ij=np.asarray(crop_ij, np.int32),
        flip=np.asarray(flip, bool),
    )
    idx = resample_indices(params, CROP)
    out = fused_video_transform(canvas, *idx.astuple())
    return np.asarray(out)


@pytest.mark.parametrize("h,w", [(240, 320), (128, 171), (226, 400), (130, 130), (100, 90)])
def test_parity_center_crop(h, w, rng):
    frames = rng.integers(0, 256, size=(4, h, w, 3), dtype=np.uint8)
    hr, wr, _ = resized_dims(h, w, 128)
    ci, cj = round((hr - CROP) / 2.0), round((wr - CROP) / 2.0)
    want = torch_reference_chain(frames, (ci, cj), False)
    got = _run_kernel([frames], [(h, w)], [(ci, cj)], [False], canvas_hw=(256, 456))
    np.testing.assert_allclose(got[0], want, atol=3e-5)


def test_parity_random_crop_and_flip(rng):
    h, w = 240, 320
    frames = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
    hr, wr, _ = resized_dims(h, w, 128)
    for flip in (False, True):
        ci = int(rng.integers(0, hr - CROP + 1))
        cj = int(rng.integers(0, wr - CROP + 1))
        want = torch_reference_chain(frames, (ci, cj), flip)
        got = _run_kernel([frames], [(h, w)], [(ci, cj)], [flip])
        np.testing.assert_allclose(got[0], want, atol=3e-5)


def test_parity_mixed_batch(rng):
    sizes = [(240, 320), (128, 171), (200, 150)]
    batch, crops, flips = [], [], []
    for h, w in sizes:
        batch.append(rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8))
        hr, wr, _ = resized_dims(h, w, 128)
        crops.append((int(rng.integers(0, hr - CROP + 1)), int(rng.integers(0, wr - CROP + 1))))
        flips.append(bool(rng.integers(0, 2)))
    got = _run_kernel(batch, sizes, crops, flips)
    for k, (fr, cr, fl) in enumerate(zip(batch, crops, flips)):
        want = torch_reference_chain(fr, cr, fl)
        np.testing.assert_allclose(got[k], want, atol=3e-5)


def test_output_range(rng):
    frames = rng.integers(0, 256, size=(2, 240, 320, 3), dtype=np.uint8)
    got = _run_kernel([frames], [(240, 320)], [(8, 29)], [False])
    assert got.min() >= -0.5 - 1e-6 and got.max() <= 0.0 + 1e-6


def test_make_transform_params_validation_center():
    p = make_transform_params(np.array([[240, 320]]), CROP, is_validation=True)
    hr, wr, _ = resized_dims(240, 320, 128)
    assert tuple(p.crop_ij[0]) == (round((hr - CROP) / 2.0), round((wr - CROP) / 2.0))
    assert not p.flip[0]


def test_make_transform_params_train_bounds(rng):
    src = np.tile(np.array([[240, 320]]), (200, 1))
    p = make_transform_params(src, CROP, is_validation=False, rng=rng)
    hr, wr, _ = resized_dims(240, 320, 128)
    assert p.crop_ij[:, 0].min() >= 0 and p.crop_ij[:, 0].max() <= hr - CROP
    assert p.crop_ij[:, 1].min() >= 0 and p.crop_ij[:, 1].max() <= wr - CROP
    # randint upper bound is inclusive in the reference -> both extremes reachable
    assert p.crop_ij[:, 1].max() == wr - CROP or len(set(p.crop_ij[:, 1])) > 1
    assert 0.2 < p.flip.mean() < 0.8


def test_resized_dims_matches_torch():
    for h, w in [(240, 320), (256, 455), (171, 128), (113, 113), (90, 100)]:
        hr, wr, s = resized_dims(h, w, 128)
        x = torch.zeros(1, 1, h, w)
        y = F.interpolate(x, scale_factor=float(128) / min(h, w), mode="bilinear",
                          align_corners=False)
        assert (hr, wr) == tuple(y.shape[-2:]), (h, w)
