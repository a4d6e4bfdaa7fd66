"""Video ResNets: R3D-18, MC3-18, R(2+1)D-18 — TPU-native functional form.

Architecture parity target: /root/reference/resnet.py (vendored torchvision
VideoResNet). Key facts reproduced:
  * BasicBlock midplanes formula (resnet.py:91):
      midplanes = (inplanes * planes * 3*3*3) // (inplanes * 3*3 + 3 * planes)
  * Conv2Plus1D = (1x3x3 conv, BN, ReLU, 3x1x1 conv), both bias-free
    (resnet.py:37-53); R2Plus1dStem uses 45 midplanes (resnet.py:176-187)
  * stages [2,2,2,2], channels 64/128/256/512, strides 1/2/2/2
    (resnet.py:217-220); downsample = 1x1x1 conv + BN, with stride
    (s,s,s) for Simple/2Plus1 convs and (1,s,s) for NoTemporal (resnet.py:33-76)
  * forward returns (global-avg-pooled flat, layer4 feature map) and skips fc
    (resnet.py:243-256)
  * init: kaiming normal fan_out for convs, BN scale 1 / bias 0
    (resnet.py:226-233)

All tensors are channels-last [N, T, H, W, C]; convs run in the configured
compute dtype (bf16 by default) with fp32 accumulation; BN stats are fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from zeroshotvideoclassification_tpu.models import layers as L

# conv-builder kinds per stage
SIMPLE, NO_TEMPORAL, TWO_PLUS_ONE = "simple", "no_temporal", "2plus1d"


def _midplanes(inplanes: int, planes: int) -> int:
    return (inplanes * planes * 3 * 3 * 3) // (inplanes * 3 * 3 + 3 * planes)


# ------------------------------------------------------------ conv makers ---

def _conv_init(rng, kind: str, cin: int, cout: int, midplanes: int):
    if kind == SIMPLE:
        return {"conv": L.conv3d_init(rng, (3, 3, 3), cin, cout)}
    if kind == NO_TEMPORAL:
        return {"conv": L.conv3d_init(rng, (1, 3, 3), cin, cout)}
    if kind == TWO_PLUS_ONE:
        ks, kt, kb = jax.random.split(rng, 3)
        bn_p, bn_s = L.batchnorm_init(midplanes)
        return {
            "conv_s": L.conv3d_init(ks, (1, 3, 3), cin, midplanes),
            "bn_m": bn_p,
            "conv_t": L.conv3d_init(kt, (3, 1, 1), midplanes, cout),
            "_state": {"bn_m": bn_s},
        }
    raise ValueError(kind)


def _conv_apply(kind: str, params, state, x, stride: int, train: bool, dtype):
    """Returns (y, new_state). `stride` is the block's scalar stride."""
    if kind == SIMPLE:
        return L.conv3d(x, params["conv"], (stride,) * 3, (1, 1, 1), dtype), state
    if kind == NO_TEMPORAL:
        return (
            L.conv3d(x, params["conv"], (1, stride, stride), (0, 1, 1), dtype),
            state,
        )
    if kind == TWO_PLUS_ONE:
        y = L.conv3d(x, params["conv_s"], (1, stride, stride), (0, 1, 1), dtype)
        y, bn_s = L.batchnorm_relu(params["bn_m"], state["bn_m"], y, train,
                                   compute_dtype=dtype)
        y = L.conv3d(y, params["conv_t"], (stride, 1, 1), (1, 0, 0), dtype)
        return y, {"bn_m": bn_s}
    raise ValueError(kind)


def _downsample_stride(kind: str, stride: int) -> Tuple[int, int, int]:
    if kind == NO_TEMPORAL:
        return (1, stride, stride)
    return (stride, stride, stride)


# ----------------------------------------------------------- basic block ----

def _block_init(rng, kind: str, inplanes: int, planes: int, stride: int):
    mid = _midplanes(inplanes, planes)
    k1, k2, kd = jax.random.split(rng, 3)
    c1 = _conv_init(k1, kind, inplanes, planes, mid)
    c2 = _conv_init(k2, kind, planes, planes, mid)
    bn1_p, bn1_s = L.batchnorm_init(planes)
    bn2_p, bn2_s = L.batchnorm_init(planes)
    params = {
        "conv1": {k: v for k, v in c1.items() if k != "_state"},
        "bn1": bn1_p,
        "conv2": {k: v for k, v in c2.items() if k != "_state"},
        "bn2": bn2_p,
    }
    state = {
        "conv1": c1.get("_state", {}),
        "bn1": bn1_s,
        "conv2": c2.get("_state", {}),
        "bn2": bn2_s,
    }
    if stride != 1 or inplanes != planes:
        ds_p, ds_s = L.batchnorm_init(planes)
        params["downsample"] = {
            "conv": L.conv3d_init(kd, (1, 1, 1), inplanes, planes),
            "bn": ds_p,
        }
        state["downsample"] = {"bn": ds_s}
    return params, state


def _block_apply(kind, params, state, x, stride, train, dtype):
    new_state = {}
    out, new_state["conv1"] = _conv_apply(
        kind, params["conv1"], state["conv1"], x, stride, train, dtype)
    out, new_state["bn1"] = L.batchnorm_relu(
        params["bn1"], state["bn1"], out, train, compute_dtype=dtype)
    out, new_state["conv2"] = _conv_apply(
        kind, params["conv2"], state["conv2"], out, 1, train, dtype)
    if "downsample" in params:
        res = L.conv3d(x, params["downsample"]["conv"],
                       _downsample_stride(kind, stride), (0, 0, 0), dtype)
        res, ds_bn = L.batchnorm_apply(
            params["downsample"]["bn"], state["downsample"]["bn"], res, train,
            compute_dtype=dtype)
        new_state["downsample"] = {"bn": ds_bn}
    else:
        res = x
    # relu(bn2(out) + res): the block epilogue, fused when ZSVC_PALLAS_BN=1
    out, new_state["bn2"] = L.batchnorm_relu(
        params["bn2"], state["bn2"], out, train, residual=res,
        compute_dtype=dtype)
    return out, new_state


# ----------------------------------------------------------------- stems ----

def _stem_init(rng, kind: str):
    if kind == "r2plus1d":
        k1, k2 = jax.random.split(rng)
        bn1_p, bn1_s = L.batchnorm_init(45)
        bn2_p, bn2_s = L.batchnorm_init(64)
        return (
            {"conv1": L.conv3d_init(k1, (1, 7, 7), 3, 45), "bn1": bn1_p,
             "conv2": L.conv3d_init(k2, (3, 1, 1), 45, 64), "bn2": bn2_p},
            {"bn1": bn1_s, "bn2": bn2_s},
        )
    bn_p, bn_s = L.batchnorm_init(64)
    return (
        {"conv1": L.conv3d_init(rng, (3, 7, 7), 3, 64), "bn1": bn_p},
        {"bn1": bn_s},
    )


def _stem_conv1(params, x, pad_d, dtype):
    """Stem (kd,7,7)/stride-(1,2,2) conv; space-to-depth path for even H/W
    (K=3 starves the MXU's 128-lane contraction — see L.stem_conv_s2d)."""
    import os

    # Measured SLOWER on the v5e chip (1.98 vs 1.14 ms fwd, 3.49 vs 2.24
    # fwd+bwd at the bs16 stem shape): XLA's conv emitter already packs the
    # 3-channel contraction efficiently, so the reassociation only adds the
    # space-to-depth transpose. Kept as an opt-in (ZSVC_STEM_S2D=1) with its
    # exactness test; same verdict family as ZSVC_CONV_FOLD (see layers.py).
    if (x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
            and os.environ.get("ZSVC_STEM_S2D", "0") == "1"):
        return L.stem_conv_s2d(x, params["conv1"], 1, pad_d, dtype)
    return L.conv3d(x, params["conv1"], (1, 2, 2), (pad_d, 3, 3), dtype)


def _stem_apply(kind, params, state, x, train, dtype):
    new_state = {}
    if kind == "r2plus1d":
        y = _stem_conv1(params, x, 0, dtype)
        y, new_state["bn1"] = L.batchnorm_relu(
            params["bn1"], state["bn1"], y, train, compute_dtype=dtype)
        y = L.conv3d(y, params["conv2"], (1, 1, 1), (1, 0, 0), dtype)
        y, new_state["bn2"] = L.batchnorm_relu(
            params["bn2"], state["bn2"], y, train, compute_dtype=dtype)
        return y, new_state
    y = _stem_conv1(params, x, 1, dtype)
    y, new_state["bn1"] = L.batchnorm_relu(
        params["bn1"], state["bn1"], y, train, compute_dtype=dtype)
    return y, new_state


# ------------------------------------------------------------- the model ----

_STAGES = ((64, 1), (128, 2), (256, 2), (512, 2))


@dataclasses.dataclass(frozen=True)
class VideoResNet:
    """Static architecture spec; params/state are explicit pytrees."""

    conv_makers: Tuple[str, str, str, str]
    stem: str  # 'basic' | 'r2plus1d'
    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    feature_dim: int = 512
    # Rematerialization of the blocks (jax.checkpoint). False: save every
    # intermediate (XLA default). True / "full": save only block inputs,
    # recompute everything in backward (~1/3 more conv FLOPs, O(depth) less
    # live HBM — enables larger per-chip batches). "convs": save the conv
    # (MXU) outputs but recompute the BN/ReLU elementwise chains — no conv
    # recompute, halves the saved-activation HBM traffic the backward
    # fusions read (the profiled bandwidth wall, see ROADMAP).
    remat: object = False

    def init(self, rng) -> Tuple[Dict, Dict]:
        keys = jax.random.split(rng, 1 + sum(self.layers))
        params = {}
        state = {}
        params["stem"], state["stem"] = _stem_init(keys[0], self.stem)
        inplanes, ki = 64, 1
        for si, ((planes, stride), nblocks, kind) in enumerate(
            zip(_STAGES, self.layers, self.conv_makers)
        ):
            for bi in range(nblocks):
                name = f"layer{si + 1}_{bi}"
                s = stride if bi == 0 else 1
                params[name], state[name] = _block_init(
                    keys[ki], kind, inplanes, planes, s)
                inplanes = planes
                ki += 1
        return params, state

    def apply(
        self, params, state, x: jax.Array, train: bool,
        compute_dtype=jnp.bfloat16,
    ):
        """x: [N, T, H, W, 3] -> (pooled [N, 512] fp32,
                                  featmap [N, T', H', W', 512],
                                  new_state)."""
        new_state = {}
        block_fn = _block_apply
        if self.remat:
            policy = None
            if self.remat == "convs":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out")
            block_fn = jax.checkpoint(
                _block_apply, static_argnums=(0, 4, 5, 6), policy=policy)
        y, new_state["stem"] = _stem_apply(
            self.stem, params["stem"], state["stem"], x, train, compute_dtype)
        for si, ((planes, stride), nblocks, kind) in enumerate(
            zip(_STAGES, self.layers, self.conv_makers)
        ):
            for bi in range(nblocks):
                name = f"layer{si + 1}_{bi}"
                s = stride if bi == 0 else 1
                y, new_state[name] = block_fn(
                    kind, params[name], state[name], y, s, train, compute_dtype)
        pooled = L.global_avgpool(y)  # fc is skipped, parity: resnet.py:251-256
        return pooled, y, new_state


def r3d_18() -> VideoResNet:
    return VideoResNet(conv_makers=(SIMPLE,) * 4, stem="basic")


def mc3_18() -> VideoResNet:
    return VideoResNet(conv_makers=(SIMPLE,) + (NO_TEMPORAL,) * 3, stem="basic")


def r2plus1d_18() -> VideoResNet:
    return VideoResNet(conv_makers=(TWO_PLUS_ONE,) * 4, stem="r2plus1d")
