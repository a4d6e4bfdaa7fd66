"""Pallas transform kernel vs the XLA gather reference (interpret mode on
CPU CI; the compiled TPU path was validated on hardware to 1.2e-7)."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

import zeroshotvideoclassification_tpu.ops.resample_pallas as rp
from zeroshotvideoclassification_tpu.data.transform_params import (
    make_transform_params,
    resample_indices,
)
from zeroshotvideoclassification_tpu.ops.resample import fused_video_transform


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(rp.pl, "pallas_call", patched)


def test_pallas_matches_xla_gather(interpret_pallas, rng):
    canvas = rng.integers(0, 256, (2, 3, 160, 200, 3), dtype=np.uint8)
    p = make_transform_params(
        np.array([[150, 190], [150, 190]]), 112, False, rng)
    idx = resample_indices(p, 112)
    a = np.asarray(fused_video_transform(canvas, *idx.astuple()))
    b = np.asarray(rp.fused_video_transform_pallas(canvas, *idx.astuple()))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_pallas_validation_and_flip(interpret_pallas, rng):
    canvas = rng.integers(0, 256, (1, 2, 160, 200, 3), dtype=np.uint8)
    p = make_transform_params(np.array([[150, 190]]), 112, True, rng)
    p.flip[0] = True
    idx = resample_indices(p, 112)
    a = np.asarray(fused_video_transform(canvas, *idx.astuple()))
    b = np.asarray(rp.fused_video_transform_pallas(canvas, *idx.astuple()))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_pallas_image_motion_matches_xla_gather(interpret_pallas, rng):
    """The MXU image-motion kernel (SUN camera-motion inflation) must match
    the XLA gather version, including the per-channel mean/std affine."""
    import jax.numpy as jnp

    from zeroshotvideoclassification_tpu.data.stillimages import (
        CH_OFFSET,
        CH_SCALE,
        camera_motion_trajectory,
        motion_resample_indices,
    )
    from zeroshotvideoclassification_tpu.ops.resample import (
        fused_image_motion_transform,
    )

    imgs = rng.integers(0, 256, (2, 180, 220, 3), dtype=np.uint8)
    t, s = 4, 112
    idx = []
    for b in range(2):
        traj = camera_motion_trajectory((180, 220), s, t, rng)
        idx.append(motion_resample_indices(traj, (180, 220), s))
    stacked = [np.stack([idx[b][k] for b in range(2)]) for k in range(6)]
    a = np.asarray(fused_image_motion_transform(
        imgs, *stacked, jnp.asarray(CH_SCALE), jnp.asarray(CH_OFFSET)))
    b = np.asarray(rp.fused_image_motion_transform_pallas(
        imgs, *stacked, ch_scale=tuple(map(float, CH_SCALE)),
        ch_offset=tuple(map(float, CH_OFFSET))))
    assert b.shape == (2, t, s, s, 3)
    np.testing.assert_allclose(b, a, atol=1e-5)
