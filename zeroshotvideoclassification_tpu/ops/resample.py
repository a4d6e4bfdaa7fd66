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


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fused_image_motion_transform(
    images: jax.Array,   # uint8 [B, Hc, Wc, C] — ONE still image per sample
    y0: jax.Array,       # int32 [B, T, S] — per-FRAME gather indices
    y1: jax.Array,
    wy: jax.Array,       # float32 [B, T, S]
    x0: jax.Array,
    x1: jax.Array,
    wx: jax.Array,
    ch_scale: jax.Array,  # float32 [C] per-channel affine: out = v*scale+offset
    ch_offset: jax.Array,
    out_dtype=jnp.float32,
) -> jax.Array:
    """-> [B, T, S, S, C]: the SUN 'camera motion' inflation
    (/root/reference/auxiliary/auxiliary_stillimages.py:92-138) as one device
    kernel — T different crop boxes of one image, each bilinearly resized to
    SxS, with per-channel mean/std normalization (the SUN path keeps the
    Kinetics mean/std scheme the video path dropped; SURVEY quirk #5)."""

    def one(img, y0, y1, wy, x0, x1, wx):
        img = img.astype(jnp.float32)  # [Hc, Wc, C]

        def frame(fy0, fy1, fwy, fx0, fx1, fwx):
            r0 = jnp.take(img, fy0, axis=0)       # [S, Wc, C]
            r1 = jnp.take(img, fy1, axis=0)
            rows = r0 * (1.0 - fwy)[:, None, None] + r1 * fwy[:, None, None]
            c0 = jnp.take(rows, fx0, axis=1)      # [S, S, C]
            c1 = jnp.take(rows, fx1, axis=1)
            return c0 * (1.0 - fwx)[None, :, None] + c1 * fwx[None, :, None]

        out = jax.vmap(frame)(y0, y1, wy, x0, x1, wx)  # [T, S, S, C]
        return out * ch_scale + ch_offset

    out = jax.vmap(one)(images, y0, y1, wy, x0, x1, wx)
    return out.astype(out_dtype)
