"""Pallas TPU kernel: fused input transform as MXU matmuls.

Same contract as ops.resample.fused_video_transform (bilinear resize + crop +
flip + normalize, indices precomputed host-side), but implemented as a Pallas
kernel that rewrites the separable bilinear gather into two matrix products
per (sample, frame, channel) plane:

    R[s, h] = (h == y0[s]) * (1 - wy[s]) + (h == y1[s]) * wy[s]   # [S, Hc]
    C[s, w] = (w == x0[s]) * (1 - wx[s]) + (w == x1[s]) * wx[s]   # [S, Wc]
    out     = normalize( R @ img_plane @ C^T )

(edge clamping makes y0 == y1 at borders, where the weights sum to 1 — the
one-hot rows then coincide and R stays a proper interpolation matrix).

Why a kernel: the XLA gather formulation materializes the row-interpolated
intermediate [B, T, S, Wc, C] in f32 HBM (~150 MB for a bs16 canvas batch)
and gathers on the VPU; here the interpolation matrices are built from iota
compares directly in VMEM, both contractions run on the MXU, and only the
final [S, S] tiles are written back. The canvas is processed channel-planar
([B, T, C, Hc, Wc], transposed outside the kernel) so each plane is a proper
(sublane, lane) tile; Mosaic cannot reshape a trailing size-3 channel dim
into lanes.

Grid = (B, T); each cell streams one uint8 frame (C x Hc x Wc, ~260 KB)
through VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(canvas_ref, y0r, y1r, wyr, x0r, x1r, wxr, out_ref, affine=None):
    # canvas_ref: [C, Hc, Wc] uint8 (one frame); y0r...: [S]; out: [C, S, S].
    # affine: None -> the video chain's exact ((v/255)-1)/2 expression
    # (kept verbatim so bitwise agreement with ops.resample holds);
    # otherwise static per-channel (scale, offset) tuples -> v*scale+offset
    # (the SUN mean/std scheme).
    c, hc, wc = canvas_ref.shape
    s = y0r.shape[0]

    def interp_matrix(i0, i1, w, length):
        ids = jax.lax.broadcasted_iota(jnp.int32, (s, length), 1)
        m0 = (ids == i0[:, None]).astype(jnp.float32)
        m1 = (ids == i1[:, None]).astype(jnp.float32)
        return m0 * (1.0 - w[:, None]) + m1 * w[:, None]

    rmat = interp_matrix(y0r[:], y1r[:], wyr[:], hc)   # [S, Hc]
    cmat = interp_matrix(x0r[:], x1r[:], wxr[:], wc)   # [S, Wc]

    for ch in range(c):
        # Mosaic has no direct uint8->f32 cast; widen through int32.
        plane = canvas_ref[ch].astype(jnp.int32).astype(jnp.float32)
        # full f32 precision: default MXU bf16 passes cost ~1e-3 absolute
        # error on the interpolation weights; this op must match the CPU
        # reference chain to ~1e-5 for embedding-fidelity tests
        rows = jnp.dot(rmat, plane, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out = jnp.dot(rows, cmat.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        if affine is None:
            out_ref[ch] = ((out / 255.0) - 1.0) / 2.0
        else:
            scale, offset = affine
            out_ref[ch] = out * scale[ch] + offset[ch]


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fused_video_transform_pallas(
    canvas: jax.Array,  # uint8 [B, T, Hc, Wc, C]
    y0: jax.Array, y1: jax.Array, wy: jax.Array,   # [B, S]
    x0: jax.Array, x1: jax.Array, wx: jax.Array,
    out_dtype=jnp.float32,
) -> jax.Array:
    b, t, hc, wc, c = canvas.shape
    s = y0.shape[1]
    canvas_p = jnp.transpose(canvas, (0, 1, 4, 2, 3))  # [B, T, C, Hc, Wc]
    # Mosaic tiling: lane (last) dim of the VMEM frame block must be a
    # multiple of 128, sublane a multiple of 8. Pad once on-device; padded
    # columns are never selected by the interpolation matrices.
    hcp = ((hc + 7) // 8) * 8
    wcp = ((wc + 127) // 128) * 128
    if (hcp, wcp) != (hc, wc):
        canvas_p = jnp.pad(
            canvas_p, ((0, 0), (0, 0), (0, 0), (0, hcp - hc), (0, wcp - wc)))
    hc, wc = hcp, wcp

    # Pad the output-pixel axis to the 128-lane tile so per-sample dynamic
    # row slices inside the kernel stay tile-aligned; the padded rows carry
    # index 0 / weight 0 and are sliced away after the call.
    sp = ((s + 127) // 128) * 128

    def pad(a, fill=0):
        return jnp.pad(a, ((0, 0), (0, sp - s)), constant_values=fill)

    frame_spec = pl.BlockSpec(
        (1, 1, c, hc, wc), lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)
    # index vectors are tiny ([B, Sp]): keep the FULL arrays resident in VMEM
    # and select the sample row with program_id inside the kernel.
    idx_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 1, c, sp, sp), lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)

    def kernel(canvas_ref, y0r, y1r, wyr, x0r, x1r, wxr, out_ref):
        bi = pl.program_id(0)
        _kernel(
            canvas_ref.at[0, 0], y0r.at[bi], y1r.at[bi], wyr.at[bi],
            x0r.at[bi], x1r.at[bi], wxr.at[bi], out_ref.at[0, 0])

    out = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[frame_spec] + [idx_spec] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c, sp, sp), jnp.float32),
    )(canvas_p, pad(y0), pad(y1), pad(wy.astype(jnp.float32)),
      pad(x0), pad(x1), pad(wx.astype(jnp.float32)))
    out = out[:, :, :, :s, :s]
    return jnp.transpose(out, (0, 1, 3, 4, 2)).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("ch_scale", "ch_offset", "out_dtype"))
def fused_image_motion_transform_pallas(
    images: jax.Array,  # uint8 [B, Hc, Wc, C] — ONE still image per sample
    y0: jax.Array, y1: jax.Array, wy: jax.Array,   # [B, T, S] per-FRAME
    x0: jax.Array, x1: jax.Array, wx: jax.Array,
    ch_scale=(1.0, 1.0, 1.0),   # STATIC per-channel affine (hash-stable
    ch_offset=(0.0, 0.0, 0.0),  # python tuples, not traced arrays)
    out_dtype=jnp.float32,
) -> jax.Array:
    """MXU variant of ops.resample.fused_image_motion_transform: the SUN
    camera-motion inflation (T crop boxes of one image, each bilinearly
    resized; /root/reference/auxiliary/auxiliary_stillimages.py:92-138).

    Same rewrite as the video kernel — per (frame, channel) plane the
    separable bilinear gather becomes two interpolation-matrix products —
    but the source image block is REUSED across the T grid steps (the crop
    trajectory only changes the tiny index vectors), so HBM reads the
    canvas once per sample instead of materializing the [B, T, S, Wc, C]
    row-interpolated intermediate the XLA gather version writes."""
    b, hc, wc, c = images.shape
    t, s = y0.shape[1], y0.shape[2]
    images_p = jnp.transpose(images, (0, 3, 1, 2))  # [B, C, Hc, Wc]
    hcp = ((hc + 7) // 8) * 8
    wcp = ((wc + 127) // 128) * 128
    if (hcp, wcp) != (hc, wc):
        images_p = jnp.pad(
            images_p, ((0, 0), (0, 0), (0, hcp - hc), (0, wcp - wc)))
    hc, wc = hcp, wcp
    sp = ((s + 127) // 128) * 128

    def pad(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, sp - s)))

    image_spec = pl.BlockSpec(
        (1, c, hc, wc), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 1, c, sp, sp), lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)
    affine = (tuple(float(v) for v in ch_scale),
              tuple(float(v) for v in ch_offset))

    def kernel(img_ref, y0r, y1r, wyr, x0r, x1r, wxr, out_ref):
        bi, ti = pl.program_id(0), pl.program_id(1)
        _kernel(
            img_ref.at[0], y0r.at[bi, ti], y1r.at[bi, ti], wyr.at[bi, ti],
            x0r.at[bi, ti], x1r.at[bi, ti], wxr.at[bi, ti],
            out_ref.at[0, 0], affine=affine)

    out = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[image_spec] + [idx_spec] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c, sp, sp), jnp.float32),
    )(images_p, pad(y0), pad(y1), pad(wy.astype(jnp.float32)),
      pad(x0), pad(x1), pad(wx.astype(jnp.float32)))
    out = out[:, :, :, :s, :s]
    return jnp.transpose(out, (0, 1, 3, 4, 2)).astype(out_dtype)
