"""Pallas TPU kernel: fused BN-apply + residual + ReLU epilogue (fwd + bwd)
on lane-flattened views.

The round-1 perf plan's one unbuilt lever (VERDICT r4 weak #1a): most
activations in these nets carry C in {45, 64, 144, 230, 460, 921} channels,
so every elementwise/reduce pass over a [..., C] array wastes 11-184% of the
128-wide lane dimension on tile padding. This op runs the BN normalize(+
residual add)(+ReLU) and its backward on [R, W*C] views — W folds into the
lane dimension, cutting the padding waste to <2% — with both backward
reductions (sum(g), sum(g*x_hat)) fused into the same pass that produces dx.

Factorization: the op treats (mean, var) as plain INPUTS and returns
d_mean/d_var, so the batch-statistic chain rule flows through the stats
graph that jnp already builds (layers.batchnorm_apply); the kernel never
needs the cross-batch correction terms. Forward math (f32 internally):

    a = scale * rsqrt(var + eps);  b = bias - mean * a
    y = relu(x * a + b + residual)

Backward, with g = dy * (y > 0):
    dx = g * a                      d_residual = g
    S1[c] = sum g                   S2[c] = sum g * x_hat
    d_scale = S2                    d_bias = S1
    d_mean = -a * S1                d_var = -0.5 * scale * sinv^2 * S2

Honest expectations, recorded up front: XLA currently FUSES this epilogue
into the adjacent convolutions (disabling conv input fusion measured 1.77x
WORSE, ROADMAP round-3); a pallas_call is a fusion barrier, so the win from
full lanes must beat the loss from un-fusing + the relayout at each
boundary. The A/B (scripts/ab_bn_pallas.py) decides; the default is OFF
(ZSVC_PALLAS_BN=1 opts in). Parity anchor for the epilogue semantics:
BN+ReLU/residual-add structure of /root/reference/resnet.py:79-113.

Single-device only: inside a jit over a >1-device mesh a pallas_call cannot
be auto-partitioned; callers (models/layers.py) gate on device count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_rows_block(rows: int, lanes: int, target_bytes: int = 1 << 21) -> int:
    """Largest divisor of `rows` that keeps one f32 block under target_bytes
    (several such blocks live in VMEM at once, double-buffered)."""
    cap = max(8, target_bytes // max(lanes * 4, 1))
    best = 1
    d = 1
    while d * d <= rows:
        if rows % d == 0:
            for c in (d, rows // d):
                if c <= cap and c > best:
                    best = c
        d += 1
    return best


def eligible(x: jax.Array, rows_min: int = 8) -> bool:
    """Shapes the kernel accepts: >=2 dims, a foldable [R, W*C] view with a
    usable row block."""
    if x.ndim < 2:
        return False
    rows = 1
    for s in x.shape[:-2]:
        rows *= s
    lanes = x.shape[-2] * x.shape[-1]
    return _pick_rows_block(rows, lanes) >= rows_min


# ------------------------------------------------------------- kernels ------

def _fwd_kernel(x_ref, a_ref, b_ref, y_ref, *, relu):
    y = x_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd_res_kernel(x_ref, r_ref, a_ref, b_ref, y_ref, *, relu):
    y = (x_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
         + r_ref[:].astype(jnp.float32))
    if relu:
        y = jnp.maximum(y, 0.0)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, y_ref, dy_ref, a_ref, s_ref, m_ref,
                dx_ref, g_ref, s1_ref, s2_ref, *, relu, want_g):
    """One pass: dx + (optionally) g + both reductions, accumulated across
    the sequential TPU grid."""
    g = dy_ref[:].astype(jnp.float32)
    if relu:
        g = g * (y_ref[:].astype(jnp.float32) > 0.0)
    xh = x_ref[:].astype(jnp.float32) * s_ref[:] - m_ref[:]
    dx_ref[:] = (g * a_ref[:]).astype(dx_ref.dtype)
    if want_g:
        g_ref[:] = g.astype(g_ref.dtype)
    p1 = jnp.sum(g, axis=0, keepdims=True)
    p2 = jnp.sum(g * xh, axis=0, keepdims=True)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = p1
        s2_ref[:] = p2

    @pl.when(i > 0)
    def _acc():
        s1_ref[:] += p1
        s2_ref[:] += p2


# --------------------------------------------------------- host wrappers ----

def _tile(v, w):
    """[C] -> [1, W*C] (column j = w*C + c reads channel c)."""
    return jnp.tile(v, w)[None, :]


def _flatten(x):
    w, c = x.shape[-2], x.shape[-1]
    rows = x.size // (w * c)
    return x.reshape(rows, w * c), rows, w, c


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def bn_apply_relu_pallas(x, scale, bias, mean, var, residual,
                         relu: bool = True, eps: float = 1e-5):
    """y = [relu](x * scale_hat + bias_hat [+ residual]) on a lane-flattened
    view. x/residual: [..., W, C] (any leading dims); scale/bias/mean/var:
    [C] f32. Returns x.dtype."""
    y, _ = _fwd(x, scale, bias, mean, var, residual, relu, eps)
    return y


def _fwd(x, scale, bias, mean, var, residual, relu, eps):
    x2d, rows, w, c = _flatten(x)
    lanes = w * c
    br = _pick_rows_block(rows, lanes)
    sinv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    a = scale.astype(jnp.float32) * sinv
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
    a_t, b_t = _tile(a, w), _tile(b, w)

    vec_spec = pl.BlockSpec((1, lanes), lambda i: (0, 0))
    blk_spec = pl.BlockSpec((br, lanes), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((rows, lanes), x.dtype)
    if residual is None:
        y2d = pl.pallas_call(
            functools.partial(_fwd_kernel, relu=relu),
            grid=(rows // br,),
            in_specs=[blk_spec, vec_spec, vec_spec],
            out_specs=blk_spec,
            out_shape=out_shape,
        )(x2d, a_t, b_t)
    else:
        r2d = residual.reshape(rows, lanes)
        y2d = pl.pallas_call(
            functools.partial(_fwd_res_kernel, relu=relu),
            grid=(rows // br,),
            in_specs=[blk_spec, blk_spec, vec_spec, vec_spec],
            out_specs=blk_spec,
            out_shape=out_shape,
        )(x2d, r2d, a_t, b_t)
    y = y2d.reshape(x.shape)
    return y, (x, y, scale, mean, var, residual is None)


def _bwd(relu, eps, res, dy):
    x, y, scale, mean, var, no_residual = res
    x2d, rows, w, c = _flatten(x)
    lanes = w * c
    br = _pick_rows_block(rows, lanes)
    sinv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    a = scale.astype(jnp.float32) * sinv
    a_t = _tile(a, w)
    s_t = _tile(sinv, w)
    m_t = _tile(mean.astype(jnp.float32) * sinv, w)
    y2d = y.reshape(rows, lanes)
    dy2d = dy.reshape(rows, lanes)

    vec_spec = pl.BlockSpec((1, lanes), lambda i: (0, 0))
    blk_spec = pl.BlockSpec((br, lanes), lambda i: (i, 0))
    want_g = not no_residual
    # unused g output: one revisited scratch block (never materialized wide)
    g_spec = blk_spec if want_g else pl.BlockSpec((br, lanes),
                                                  lambda i: (0, 0))
    g_rows = rows if want_g else br
    dx2d, g2d, s1, s2 = pl.pallas_call(
        functools.partial(_bwd_kernel, relu=relu, want_g=want_g),
        grid=(rows // br,),
        in_specs=[blk_spec, blk_spec, blk_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(blk_spec, g_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), x.dtype),
            jax.ShapeDtypeStruct((g_rows, lanes), dy.dtype),
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
        ),
    )(x2d, y2d, dy2d, a_t, s_t, m_t)

    s1c = s1.reshape(w, c).sum(axis=0)
    s2c = s2.reshape(w, c).sum(axis=0)
    dx = dx2d.reshape(x.shape)
    d_scale = s2c
    d_bias = s1c
    d_mean = -a * s1c
    # d(y)/d(var) = gamma (x-mu) (-1/2)(var+eps)^-3/2 = -1/2 gamma sinv^2 xh
    d_var = -0.5 * scale.astype(jnp.float32) * sinv * sinv * s2c
    d_res = None if no_residual else g2d.reshape(x.shape)
    return dx, d_scale, d_bias, d_mean, d_var, d_res


bn_apply_relu_pallas.defvjp(
    lambda x, scale, bias, mean, var, residual, relu, eps: _fwd(
        x, scale, bias, mean, var, residual, relu, eps),
    _bwd,
)
