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


@functools.partial(
    jax.jit, static_argnames=("crop_size", "max_taps", "out_dtype", "impl"))
def fused_image_motion_transform_aa(
    images: jax.Array,      # uint8 [B, Hc, Wc, C] — ONE still image per sample
    trajectory: jax.Array,  # int32 [B, T, 3] per-frame (y, x, side) crop boxes
    img_hw: jax.Array,      # int32 [B, 2] true (h, w) inside the canvas
    ch_scale: jax.Array,    # float32 [C]: out = v*scale + offset
    ch_offset: jax.Array,
    crop_size: int = 112,
    max_taps: int = 11,
    out_dtype=jnp.float32,
    impl: str = "mxu",
) -> jax.Array:
    """ANTIALIASED SUN camera-motion inflation -> [B, T, S, S, C].

    The reference resizes each trajectory crop with torchvision Resize on a
    PIL image (/root/reference/auxiliary/auxiliary_stillimages.py:56-62,
    130-134) — PIL's bilinear is a triangle filter whose support scales with
    the downscale ratio (antialiased), NOT the 2-tap half-pixel lerp of
    `fused_image_motion_transform`. Since the crop side is >= crop_size by
    construction (auxiliary_stillimages.py:119-127 draws sides in
    [crop, fit)), every frame is a downscale and the filter footprint
    matters.

    TPU-first design: the host ships only the integer trajectory ([T, 3]
    per sample — ~100 bytes instead of the bilinear path's ~21 KB of gather
    indices); tap indices and PIL-exact normalized triangle weights are
    computed ON DEVICE with static shapes. Each output pixel reads a fixed
    window of `max_taps` source rows/cols (zero-weight-padded past the true
    window), so the whole transform is K unrolled gather+FMA passes per
    axis — static shapes, no data-dependent control flow, batch-shardable.

    `max_taps` must cover ceil(2 * side_max/crop_size) + 1; the host bound
    (data/stillimages.py:load_and_bound_image) caps the usable side at 512,
    so 11 taps cover 112-px crops with margin. Boxes overhanging the image
    reproduce the reference's numpy-truncate-then-stretch behavior (the
    per-axis extent is clamped before the filter scale is derived).
    Upscaling crops (possible for images the integer-scale bound leaves
    with min side in [87, 111]) degrade to plain bilinear, exactly as PIL
    does when scale < 1.

    Two equivalent implementations (same math, same oracle tests):
      * impl='mxu' (default): the separable resize is two small matmuls per
        frame, out = Wy @ img @ Wx^T, with the DENSE [S, Hc]/[S, Wc]
        triangle-weight matrices built elementwise on device. ~3.4 GFLOP per
        image rides the MXU (f32, Precision.HIGHEST for PIL fidelity)
        instead of 2*K serial VPU gather passes; `max_taps` is unused.
        On-chip A/B (scripts/ab_sun_antialias.py, v5e): 10.4x faster than
        'gather' (1.41 vs 14.7 ms/batch-of-11), bringing antialiased parity
        to 1.47x the cost of the plain-bilinear shortcut.
      * impl='gather': K zero-weight-padded taps per output pixel, unrolled
        gather+FMA — kept as the fallback shape for backends where dense
        matmuls lose, and as a second oracle-tested formulation.
    """
    S = crop_size
    K = max_taps

    if impl == "mxu":
        def dense_w(origin, side, limit, n_src):
            # origin/side: int32 [T]; -> normalized weights [T, S, n_src].
            # Same window/clamp math as taps() below, expressed densely: the
            # triangle is zero outside PIL's [lo, hi) int window except for
            # the edge clips, which the `valid` mask reproduces.
            o = origin.astype(jnp.float32)
            extent = jnp.minimum(side.astype(jnp.float32),
                                 limit.astype(jnp.float32) - o)  # [T]
            scale = extent / float(S)
            fs = jnp.maximum(scale, 1.0)
            d = jnp.arange(S, dtype=jnp.float32)
            center = (d[None, :] + 0.5) * scale[:, None] + o[:, None]  # [T,S]
            h = jnp.arange(n_src, dtype=jnp.float32)                # [n_src]
            arg = (h[None, None, :] + 0.5 - center[:, :, None]) / (
                fs[:, None, None])
            w = jnp.maximum(1.0 - jnp.abs(arg), 0.0)
            valid = ((h[None, :] >= o[:, None]) &
                     (h[None, :] < o[:, None] + extent[:, None]))
            w = w * valid[:, None, :]
            return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-20)

        hc, wc = images.shape[1], images.shape[2]

        def one_mxu(img, traj, hw):
            img = img.astype(jnp.float32)                    # [Hc, Wc, C]
            wy = dense_w(traj[:, 0], traj[:, 2], hw[0], hc)  # [T, S, Hc]
            wx = dense_w(traj[:, 1], traj[:, 2], hw[1], wc)  # [T, S, Wc]
            rows = jnp.einsum("tsh,hwc->tswc", wy, img,
                              precision=jax.lax.Precision.HIGHEST)
            out = jnp.einsum("txw,tswc->tsxc", wx, rows,
                             precision=jax.lax.Precision.HIGHEST)
            return out * ch_scale + ch_offset

        out = jax.vmap(one_mxu)(images, trajectory, img_hw)
        return out.astype(out_dtype)

    if impl != "gather":
        raise ValueError(f"impl must be 'mxu' or 'gather', got {impl!r}")

    # Trace-time guard: PIL's window for a crop of extent E is
    # [floor(c - fs + .5), floor(c + fs + .5)) with fs = E/S, i.e. at most
    # floor(2*fs) + 2 integer taps. extent <= the static canvas dim, so a
    # too-small K would silently DROP tail taps (taps() renormalizes, so the
    # output would quietly under-antialias instead of erroring).
    worst_fs = max(images.shape[1], images.shape[2]) / float(S)
    need = int(2 * worst_fs) + 2 if worst_fs > 1.0 else 3
    if K < need:
        raise ValueError(
            f"max_taps={K} cannot cover the worst-case PIL window for "
            f"canvas {images.shape[1]}x{images.shape[2]} -> {S}: need "
            f">= {need} taps (or use impl='mxu', which has no tap cap)")

    def taps(origin, side, limit):
        # origin/side: int32 [T]; limit: int32 scalar -> idx/w [T, S, K]
        o = origin.astype(jnp.float32)
        extent = jnp.minimum(side.astype(jnp.float32),
                             limit.astype(jnp.float32) - o)  # [T]
        scale = extent / float(S)
        fs = jnp.maximum(scale, 1.0)  # filter scale (support of the triangle)
        d = jnp.arange(S, dtype=jnp.float32)
        center = (d[None, :] + 0.5) * scale[:, None]          # [T, S]
        # PIL: xmin = max((int)(center - support + .5), 0),
        #      xmax = min((int)(center + support + .5), in_size)
        lo = jnp.maximum(jnp.floor(center - fs[:, None] + 0.5), 0.0)
        hi = jnp.minimum(jnp.floor(center + fs[:, None] + 0.5),
                         extent[:, None])
        j = lo[:, :, None] + jnp.arange(K, dtype=jnp.float32)  # [T, S, K]
        arg = (j + 0.5 - center[:, :, None]) / fs[:, None, None]
        w = jnp.maximum(1.0 - jnp.abs(arg), 0.0) * (j < hi[:, :, None])
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-20)
        idx = jnp.clip(j.astype(jnp.int32) + origin[:, None, None],
                       0, limit - 1)
        return idx, w

    def one(img, traj, hw):
        img = img.astype(jnp.float32)  # [Hc, Wc, C]
        yi, wy = taps(traj[:, 0], traj[:, 2], hw[0])
        xi, wx = taps(traj[:, 1], traj[:, 2], hw[1])

        def frame(fyi, fwy, fxi, fwx):
            rows = fwy[:, 0, None, None] * jnp.take(img, fyi[:, 0], axis=0)
            for k in range(1, K):                 # [S, Wc, C]
                rows = rows + fwy[:, k, None, None] * jnp.take(
                    img, fyi[:, k], axis=0)
            out = fwx[None, :, 0, None] * jnp.take(rows, fxi[:, 0], axis=1)
            for k in range(1, K):                 # [S, S, C]
                out = out + fwx[None, :, k, None] * jnp.take(
                    rows, fxi[:, k], axis=1)
            return out

        out = jax.vmap(frame)(yi, wy, xi, wx)     # [T, S, S, C]
        return out * ch_scale + ch_offset

    out = jax.vmap(one)(images, trajectory, img_hw)
    return out.astype(out_dtype)
