"""Fused on-device input transform: bilinear resize + crop + flip + normalize.

Replaces the reference's per-sample CPU chain
(/root/reference/auxiliary/transforms.py:41-56: ToFloatTensorInZeroOne ->
Resize(short=128, bilinear, align_corners=False) -> Random/CenterCrop(112) ->
RandomHorizontalFlip) with ONE batched XLA computation.

Because bilinear resampling is linear in pixel values and its interpolation
weights sum to 1, the affine normalization (x/255 - 1)/2 commutes with it —
so the kernel gathers uint8, lerps in float, and applies the affine once at
the end. The resize->crop->flip composition is folded into precomputed
separable gather indices (data/transform_params.py:resample_indices), making
this kernel a pure static-shape gather+lerp: ideal for XLA, zero dynamic
shapes, and trivially shardable on the batch axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fused_video_transform(
    canvas: jax.Array,  # uint8 [B, T, Hc, Wc, C]
    y0: jax.Array,      # int32 [B, S]
    y1: jax.Array,      # int32 [B, S]
    wy: jax.Array,      # float32 [B, S]
    x0: jax.Array,      # int32 [B, S]
    x1: jax.Array,      # int32 [B, S]
    wx: jax.Array,      # float32 [B, S]
    out_dtype=jnp.float32,
) -> jax.Array:
    """-> [B, T, S, S, C] in [-0.5, 0], matching the reference CPU chain."""

    def one(img, y0, y1, wy, x0, x1, wx):
        # img: uint8 [T, Hc, Wc, C]
        img = img.astype(jnp.float32)
        r0 = jnp.take(img, y0, axis=1)            # [T, S, Wc, C]
        r1 = jnp.take(img, y1, axis=1)
        wyb = wy[None, :, None, None]
        rows = r0 * (1.0 - wyb) + r1 * wyb
        c0 = jnp.take(rows, x0, axis=2)           # [T, S, S, C]
        c1 = jnp.take(rows, x1, axis=2)
        wxb = wx[None, None, :, None]
        out = c0 * (1.0 - wxb) + c1 * wxb
        return ((out / 255.0) - 1.0) / 2.0        # transforms.py:117

    out = jax.vmap(one)(canvas, y0, y1, wy, x0, x1, wx)
    return out.astype(out_dtype)
