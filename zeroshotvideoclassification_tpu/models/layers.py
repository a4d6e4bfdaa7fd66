"""Functional building blocks: conv3d, batchnorm, linear, pooling.

Numerical parity notes (vs torch, the reference's substrate):
  * conv3d: lax.conv_general_dilated, NDHWC x DHWIO -> NDHWC. Weights are
    stored in DHWIO; the port from torch's [O, I, kD, kH, kW] is a transpose.
  * batchnorm: eps 1e-5, momentum 0.1; training normalizes with biased batch
    variance but running-var updates with the UNBIASED estimate (torch
    semantics). Statistics and normalization run in float32 regardless of the
    compute dtype (bf16-safe).
  * linear init: torch default (kaiming_uniform a=sqrt(5)) => U(+-1/sqrt(fan_in))
    for both weight and bias.
  * conv init: kaiming normal fan_out (resnet.py:226-230).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


# ----------------------------------------------------------------- init -----

def kaiming_normal_fanout(rng, shape_dhwio) -> jax.Array:
    """Kaiming normal, mode=fan_out, relu gain (resnet.py:228)."""
    kd, kh, kw, _, cout = shape_dhwio
    fan_out = cout * kd * kh * kw
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(rng, shape_dhwio, dtype=jnp.float32) * std


def torch_linear_init(rng, fan_in: int, fan_out: int):
    """torch.nn.Linear default init: W, b ~ U(+-1/sqrt(fan_in))."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def normal_linear_init(rng, fan_in: int, fan_out: int, std: float = 0.01):
    """resnet.py:234-236 style: N(0, 0.01) weight, zero bias."""
    w = jax.random.normal(rng, (fan_in, fan_out), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}


# ----------------------------------------------------------------- conv -----

def conv3d_init(rng, k_dhw: Sequence[int], cin: int, cout: int):
    kd, kh, kw = k_dhw
    return {"w": kaiming_normal_fanout(rng, (kd, kh, kw, cin, cout))}


def conv3d(
    x: jax.Array,
    params,
    stride_dhw: Sequence[int] = (1, 1, 1),
    padding_dhw: Sequence[int] = (0, 0, 0),
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """x: [N, D, H, W, Cin] -> [N, D', H', W', Cout]."""
    w = params["w"].astype(compute_dtype)
    x = x.astype(compute_dtype)
    kd, kh, kw = w.shape[:3]
    sd, sh, sw = stride_dhw
    pd, ph, pw = padding_dhw
    # f32 path: full 'highest' precision (parity/tests). bf16 path: keep the
    # conv output in bf16 (MXU accumulates in f32 internally; requesting an
    # f32 preferred_element_type on bf16 inputs breaks the conv VJP's dtype
    # matching in jax 0.9) — every BN/linear after a conv upcasts to f32.
    precision = "highest" if compute_dtype == jnp.float32 else None

    # Optional decomposition experiments (ZSVC_CONV_FOLD=spatial,temporal):
    # folding (1,k,k) kernels into 2D convs wins in single-op microbenchmarks
    # (84 vs 49 TFLOP/s) but LOSES end-to-end (140 vs 220 clips/s on v5e) —
    # XLA's native 3-spatial-dim lowering already picks better layouts across
    # the whole graph, and the manual reshapes block fusion. Default: off.
    import os as _os
    _fold = _os.environ.get("ZSVC_CONV_FOLD", "none")
    if kd == 1 and pd == 0 and "spatial" in _fold:
        # Spatial-only kernel as a true 2D conv; a temporal stride on a
        # 1-deep kernel is plain subsampling, applied first.
        if sd != 1:
            x = x[:, ::sd]
        n, t, h, wd, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(n * t, h, wd, c), w[0],
            window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        y = y.reshape(n, t, y.shape[1], y.shape[2], y.shape[3])
    elif kh == 1 and kw == 1 and ph == 0 and pw == 0 and "temporal" in _fold:
        # Temporal-only kernel: run as a 2D conv over (T, H*W). A spatial
        # stride on a 1x1 kernel is plain subsampling.
        if sh != 1 or sw != 1:
            x = x[:, :, ::sh, ::sw]
        n, t, h, wd, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(n, t, h * wd, c), w[:, 0],
            window_strides=(sd, 1), padding=[(pd, pd), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        y = y.reshape(n, y.shape[1], h, wd, y.shape[3])
    else:
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=tuple(stride_dhw),
            padding=[(p, p) for p in padding_dhw],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=precision,
        )
    if "b" in params:
        y = y + params["b"].astype(compute_dtype)
    # Tag for remat policies: under --remat convs the blocks save ONLY these
    # (the expensive MXU results) and recompute BN/ReLU chains in backward,
    # halving saved-activation HBM traffic. A no-op outside jax.checkpoint.
    return checkpoint_name(y, "conv_out")


def stem_conv_s2d(
    x: jax.Array,
    params,
    stride_d: int = 1,
    padding_d: int = 0,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """(kd,7,7)-kernel stem conv with spatial stride 2, computed via 2x2
    space-to-depth — numerically the SAME sum, reassociated.

    Why: the stem consumes 3-channel input, so the MXU contracts over K=3 of
    128 lanes (~2% utilization) and the stem family costs ~5.5 ms of the
    bs16 train step (profiled). Folding 2x2 spatial blocks into channels
    gives K=12 and turns the strided 7-tap window into a dense 4-tap window:

        out[p] = sum_{k=0..6} x[2p-3+k] w[k]          (pad 3, stride 2)
               = sum_{j=0..3} sum_{r=0,1} u[p+j-2][r] w[2j+r-1]   (w[-1]=0)

    where u[q][r] = x[2q+r]. Per spatial axis; both axes fold. The weight
    rearrangement is exact (zero-filled phantom tap), so parameters stay in
    the canonical [kd,7,7,3,C] layout — checkpoints, porting and oracles are
    untouched. Requires even H and W (the 112/128-px pipeline always is;
    callers fall back to the direct conv otherwise)."""
    w = params["w"].astype(compute_dtype)
    kd, kh, kw, cin, cout = w.shape
    assert (kh, kw) == (7, 7) and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
    n, t, h, wd, c = x.shape
    x = x.astype(compute_dtype)
    # space-to-depth: [N,T,H,W,C] -> [N,T,H/2,W/2,(rh,rw,C)=4C]
    u = x.reshape(n, t, h // 2, 2, wd // 2, 2, c)
    u = u.transpose(0, 1, 2, 4, 3, 5, 6).reshape(n, t, h // 2, wd // 2, 4 * c)
    # weights: wpad[i] = w[i-1] (zero row in front), then fold (tap, phase)
    wpad = jnp.pad(w, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))  # [kd,8,8,c,o]
    w2 = wpad.reshape(kd, 4, 2, 4, 2, cin, cout)
    w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kd, 4, 4, 4 * cin, cout)
    return jax.lax.conv_general_dilated(
        u, w2, window_strides=(stride_d, 1, 1),
        padding=[(padding_d, padding_d), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision="highest" if compute_dtype == jnp.float32 else None,
    )


# ------------------------------------------------------------ batchnorm -----

def batchnorm_init(c: int):
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def batchnorm_apply(
    params,
    state,
    x: jax.Array,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    compute_dtype=jnp.bfloat16,
):
    """Per-channel BN over all leading axes. Returns (y, new_state).

    Under a pjit-sharded batch the reductions below become GLOBAL (XLA inserts
    the cross-replica collectives automatically) — i.e. sync-BN, strictly more
    correct than the reference's per-GPU DataParallel statistics.
    """
    xf = x.astype(jnp.float32)
    mean, var, new_state = bn_statistics(state, xf, train, momentum)
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (xf - mean) * inv + params["bias"]
    return y.astype(compute_dtype), new_state


def bn_statistics(state, xf: jax.Array, train: bool, momentum: float = 0.1):
    """(mean, var, new_state) — the statistics half of batchnorm_apply.

    One-pass statistics: E[s] and E[s^2] are independent reductions, so
    XLA fuses them into a SINGLE read of the activation. The two-pass
    centered form (mean first, then E[(x-mean)^2]) costs a second full
    HBM pass per BN — profiled at ~half the whole train step's time on
    this conv-light/BN-heavy net (convert_reduce fusions, see ROADMAP).
    Shifting by the RUNNING mean first (s = x - m0, fuses into the same
    read) removes the E[x^2]-E[x]^2 catastrophic-cancellation risk for
    large-DC-offset activations: the residual mean E[s] is near zero
    once running stats warm up, so the subtraction loses no precision."""
    axes = tuple(range(xf.ndim - 1))
    if not train:
        return state["mean"], state["var"], state
    m0 = state["mean"]
    s_mean = jnp.mean(xf - m0, axis=axes)
    s_sq = jnp.mean(jnp.square(xf - m0), axis=axes)
    mean = s_mean + m0
    var = jnp.maximum(s_sq - jnp.square(s_mean), 0.0)
    count = float(np.prod([xf.shape[a] for a in axes]))
    unbiased = var * (count / max(count - 1.0, 1.0))
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * mean,
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
    }
    return mean, var, new_state


def _use_pallas_bn(x) -> bool:
    """Opt-in gate for the fused Pallas BN epilogue (ZSVC_PALLAS_BN=1).

    Single-device only: a pallas_call inside a jit spanning a >1-device mesh
    cannot be auto-partitioned (the sharded transform kernel goes through
    shard_map instead, data/pipeline.py). Default OFF — the A/B
    (scripts/ab_bn_pallas.py) adjudicates it on the chip."""
    import os

    if os.environ.get("ZSVC_PALLAS_BN", "0") != "1":
        return False
    import jax as _jax

    if _jax.device_count() != 1:
        return False
    from zeroshotvideoclassification_tpu.ops import bn_pallas

    return bn_pallas.eligible(x)


def batchnorm_relu(
    params,
    state,
    x: jax.Array,
    train: bool,
    residual: Optional[jax.Array] = None,
    relu_after: bool = True,
    momentum: float = 0.1,
    eps: float = 1e-5,
    compute_dtype=jnp.bfloat16,
):
    """BN apply (+ residual add) (+ ReLU) — the block epilogue as ONE call.

    Default path composes batchnorm_apply + add + relu exactly as the blocks
    always did (bit-identical). Under ZSVC_PALLAS_BN=1 the epilogue runs as
    the fused lane-flattened Pallas kernel (ops/bn_pallas.py); its internal
    math is f32 end-to-end, so under bf16 compute the residual add rounds
    once instead of twice (tests bound the delta). Returns (y, new_state)."""
    if _use_pallas_bn(x):
        from zeroshotvideoclassification_tpu.ops.bn_pallas import (
            bn_apply_relu_pallas,
        )

        # statistics stay on the jnp path (they fuse into the producing
        # conv's output read); only the apply/epilogue moves into Pallas
        mean, var, new_state = bn_statistics(
            state, x.astype(jnp.float32), train, momentum)
        xc = x.astype(compute_dtype)
        res = None if residual is None else residual.astype(compute_dtype)
        y = bn_apply_relu_pallas(xc, params["scale"], params["bias"],
                                 mean, var, res, relu_after, eps)
        return y, new_state

    y, new_state = batchnorm_apply(params, state, x, train, momentum, eps,
                                   compute_dtype)
    if residual is not None:
        y = y + residual
    if relu_after:
        y = relu(y)
    return y, new_state


# ---------------------------------------------------------------- linear ----

def linear(x: jax.Array, params, compute_dtype=None) -> jax.Array:
    dtype = compute_dtype or x.dtype
    precision = "highest" if dtype == jnp.float32 else None
    y = jnp.dot(x.astype(dtype), params["w"].astype(dtype), precision=precision)
    return (y.astype(jnp.float32) + params["b"].astype(jnp.float32))


# ---------------------------------------------------------------- pooling ---

def maxpool3d(
    x: jax.Array,
    window_dhw: Sequence[int],
    stride_dhw: Sequence[int],
    padding_dhw: Sequence[int] = (0, 0, 0),
) -> jax.Array:
    """torch MaxPool3d semantics (pad with -inf)."""
    dims = (1, *window_dhw, 1)
    strides = (1, *stride_dhw, 1)
    pads = ((0, 0), *[(p, p) for p in padding_dhw], (0, 0))
    # init value must be a PYTHON scalar: a jnp.array init prevents jax from
    # recognizing the max monoid, falling back to the generic reduce_window
    # primitive which has NO reverse-mode autodiff rule (C3D training would
    # fail at pool backward)
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = -np.inf
    else:
        neg = int(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(x, neg, jax.lax.max, dims, strides, pads)


def global_avgpool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool3d((1,1,1)) + flatten: [N,D,H,W,C] -> [N,C] (fp32)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))


# ----------------------------------------------------------------- misc -----

def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """F.normalize(dim=-1) parity: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps))


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)
