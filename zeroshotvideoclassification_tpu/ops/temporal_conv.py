"""Pallas TPU kernel: the (3,1,1) temporal conv of R(2+1)D blocks.

The step profile (scripts/analyze_step_hlo.py) shows the layer1 temporal-conv
forward fusions at ~30% MFU — well under both the compute wall (the N=64
output-channel tile caps the MXU at 50%) and the bandwidth wall (~390 GB/s
observed). Everything else in the conv family is within ~15% of a wall, so
this is the one spot a hand kernel can recover.

Formulation: y[n, t, p, :] = sum_dt x[n, t+dt-1, p, :] @ W[dt]  (SAME pad),
with (H, W) flattened into p. Grid = (N, P/PT); each cell streams a
[T+2, PT, Ci] slab through VMEM and runs three MXU dots with f32
accumulation. K = Ci maps onto sublanes (granularity 8 — 144 is exact), so
the only intrinsic waste is the N=64 lane tile.

Backward uses the straight XLA convolution transpose/wgrad (measured at their
own walls already) via jax.custom_vjp over a reference lax.conv.

MEASURED VERDICT (v5e, layer1 shape [16,16,56,56,144]->64): this kernel runs
4.90 ms fwd vs XLA's 1.26 ms — XLA's TPU conv emitter wins (as it also did
vs shifted-matmul 3x, 2D-folding 3.7x, and space-to-depth 1.7x). Kept as a
tested reference kernel and as the recorded adjudication; NOT wired into the
model. See ROADMAP.md "Round-2 single-chip perf adjudication".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ref_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Reference formulation: x [N,T,P,Ci], w [3,Ci,Co] -> [N,T,P,Co]."""
    return jax.lax.conv_general_dilated(
        x, w[:, None], window_strides=(1, 1),
        padding=[(1, 1), (0, 0)],
        dimension_numbers=("NDHC", "DHIO", "NDHC"),
    )


def _kernel(x_ref, w_ref, out_ref):
    # x_ref: [1, T+2, PT, Ci]; w_ref: [3, Ci, Co]; out_ref: [1, T, PT, Co]
    t, pt, co = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    ci = x_ref.shape[3]
    acc = jnp.zeros((t * pt, co), jnp.float32)
    for dt in range(3):
        xs = x_ref[0, dt:dt + t].reshape(t * pt, ci)
        acc += jnp.dot(xs, w_ref[dt], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(t, pt, co).astype(out_ref.dtype)


def _pick_tile(p: int, t: int, ci: int, budget_bytes: int = 1 << 20) -> int:
    """Largest PT dividing p with a [T+2, PT, Ci] bf16 slab under budget
    (double-buffered input + output + f32 accumulator must fit 16 MB VMEM;
    a 4 MB slab OOMed at the layer1 shape)."""
    # Mosaic: the second-to-last block dim must be a multiple of 8
    for pt in (1024, 784, 512, 448, 392, 256, 128, 112, 64, 32, 16, 8):
        if p % pt == 0 and (t + 2) * pt * ci * 2 <= budget_bytes:
            return pt
    # no listed tile divides p: any 8-multiple divisor under budget still
    # satisfies both constraints (returning p itself could break the
    # multiple-of-8 rule AND blow the budget for prime-ish p)
    for pt in range(min(p, budget_bytes // ((t + 2) * ci * 2)) // 8 * 8,
                    0, -8):
        if p % pt == 0:
            return pt
    raise ValueError(
        f"temporal_conv3: no legal tile for p={p} (t={t}, ci={ci}) — "
        f"spatial size must have a multiple-of-8 divisor whose slab fits "
        f"VMEM; pad p to a multiple of 8 first")


def _pallas_forward(x: jax.Array, w: jax.Array, interpret: bool = False):
    n, t, p, ci = x.shape
    co = w.shape[2]
    pt = _pick_tile(p, t, ci)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return pl.pallas_call(
        _kernel,
        grid=(n, p // pt),
        in_specs=[
            pl.BlockSpec((1, t + 2, pt, ci), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, pt, co), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, p, co), x.dtype),
        interpret=interpret,
    )(xp, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tconv(x, w, interpret=False):
    return _pallas_forward(x, w, interpret)


def _tconv_fwd(x, w, interpret):
    return _pallas_forward(x, w, interpret), (x, w)


def _tconv_bwd(interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(_ref_conv, x, w)
    return vjp(g)


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def temporal_conv3(
    x: jax.Array,   # [N, T, H, W, Ci]
    w: jax.Array,   # [3, 1, 1, Ci, Co]
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Stride-1 SAME (3,1,1) conv, NDHWC, via the Pallas kernel."""
    n, t, h, wd, ci = x.shape
    co = w.shape[4]
    y = _tconv(x.astype(compute_dtype).reshape(n, t, h * wd, ci),
               w[:, 0, 0].astype(compute_dtype), interpret)
    return y.reshape(n, t, h, wd, co)
