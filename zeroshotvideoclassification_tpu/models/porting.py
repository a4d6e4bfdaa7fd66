"""Torch-checkpoint -> JAX pytree weight porting (offline tool).

Sources supported:
  * torchvision video-resnet checkpoints (r3d_18 / mc3_18 / r2plus1d_18,
    the URLs vendored at /root/reference/resnet.py:11-15)
  * the reference's own `checkpoint.pth.tar` (a DataParallel state_dict with
    'module.' prefixes, /root/reference/main.py:114-124)
  * c3d.pickle (DavideA/c3d-pytorch state_dict, /root/reference/network.py:130)

Layout conversions:
  conv3d  [O, I, kD, kH, kW] -> DHWIO  (transpose 2,3,4,1,0)
  linear  [out, in]          -> [in, out]
  BN      weight/bias/running_mean/running_var -> scale/bias/mean/var
The classifier 'fc.*' of torchvision checkpoints is skipped: the reference
forward never uses it (resnet.py:254) and this framework does not create it.

This module only needs numpy; torch is used (CPU) just to deserialize
.pth/.pickle files when available.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(t, np.float32), (2, 3, 4, 1, 0)))


def _lin_w(t) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(t, np.float32).T)


def _f32(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Deserialize a .pth/.pickle file to {key: numpy array}, stripping any
    DataParallel 'module.' prefixes (main.py:117-119 semantics)."""
    import torch  # local import: porting is an offline tool

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _bn(sd: Dict, prefix: str):
    params = {"scale": _f32(sd[prefix + ".weight"]), "bias": _f32(sd[prefix + ".bias"])}
    state = {
        "mean": _f32(sd[prefix + ".running_mean"]),
        "var": _f32(sd[prefix + ".running_var"]),
    }
    return params, state


def _block_conv(sd: Dict, prefix: str, kind: str):
    """One conv-builder inside a block. torchvision nesting:
    Conv3DSimple / Conv3DNoTemporal: `{prefix}.weight`;
    Conv2Plus1D (a Sequential): `{prefix}.0.weight` (spatial),
    `{prefix}.1.*` (mid BN), `{prefix}.3.weight` (temporal)."""
    if kind == "2plus1d":
        bn_p, bn_s = _bn(sd, prefix + ".1")
        return (
            {
                "conv_s": {"w": _conv_w(sd[prefix + ".0.weight"])},
                "bn_m": bn_p,
                "conv_t": {"w": _conv_w(sd[prefix + ".3.weight"])},
            },
            {"bn_m": bn_s},
        )
    return {"conv": {"w": _conv_w(sd[prefix + ".weight"])}}, {}


def port_video_resnet(
    sd: Dict[str, np.ndarray], arch: str, layers=(2, 2, 2, 2)
) -> Tuple[Dict, Dict]:
    """-> (params, state) pytrees for models.resnet3d.VideoResNet."""
    kinds = {
        "r3d_18": ("simple",) * 4,
        "mc3_18": ("simple",) + ("no_temporal",) * 3,
        "r2plus1d_18": ("2plus1d",) * 4,
    }[arch]
    params, state = {}, {}

    # stem: BasicStem = Sequential(conv, bn, relu); R2Plus1dStem adds a second
    # conv+bn (resnet.py:165-187)
    if arch == "r2plus1d_18":
        bn1_p, bn1_s = _bn(sd, "stem.1")
        bn2_p, bn2_s = _bn(sd, "stem.4")
        params["stem"] = {
            "conv1": {"w": _conv_w(sd["stem.0.weight"])}, "bn1": bn1_p,
            "conv2": {"w": _conv_w(sd["stem.3.weight"])}, "bn2": bn2_p,
        }
        state["stem"] = {"bn1": bn1_s, "bn2": bn2_s}
    else:
        bn_p, bn_s = _bn(sd, "stem.1")
        params["stem"] = {"conv1": {"w": _conv_w(sd["stem.0.weight"])}, "bn1": bn_p}
        state["stem"] = {"bn1": bn_s}

    for si, (nblocks, kind) in enumerate(zip(layers, kinds)):
        for bi in range(nblocks):
            tv = f"layer{si + 1}.{bi}"          # torchvision name
            name = f"layer{si + 1}_{bi}"         # our name
            c1_p, c1_s = _block_conv(sd, tv + ".conv1.0", kind)
            c2_p, c2_s = _block_conv(sd, tv + ".conv2.0", kind)
            bn1_p, bn1_s = _bn(sd, tv + ".conv1.1")
            bn2_p, bn2_s = _bn(sd, tv + ".conv2.1")
            p = {"conv1": c1_p, "bn1": bn1_p, "conv2": c2_p, "bn2": bn2_p}
            s = {"conv1": c1_s, "bn1": bn1_s, "conv2": c2_s, "bn2": bn2_s}
            if tv + ".downsample.0.weight" in sd:
                ds_bn_p, ds_bn_s = _bn(sd, tv + ".downsample.1")
                p["downsample"] = {
                    "conv": {"w": _conv_w(sd[tv + ".downsample.0.weight"])},
                    "bn": ds_bn_p,
                }
                s["downsample"] = {"bn": ds_bn_s}
            params[name], state[name] = p, s
    return params, state


def port_c3d(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """c3d.pickle -> C3DBackbone pytrees (fc7/fc8 skipped: bypassed in the
    reference forward, network.py:168-172)."""
    params = {}
    for name in ("conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b",
                 "conv5a", "conv5b"):
        params[name] = {
            "w": _conv_w(sd[name + ".weight"]),
            "b": _f32(sd[name + ".bias"]),
        }
    params["fc6"] = {"w": _lin_w(sd["fc6.weight"]), "b": _f32(sd["fc6.bias"])}
    return params, {}


def port_head(sd: Dict[str, np.ndarray], head: str) -> Dict:
    """Port the reference head weights from a fork checkpoint.

    'mlp': network.py:517 `output2emb_proj` = MLP with layers.{0,1};
    'linear'/'c3d': `regressor` Linear."""
    if head == "mlp":
        return {
            "fc1": {"w": _lin_w(sd["output2emb_proj.layers.0.weight"]),
                    "b": _f32(sd["output2emb_proj.layers.0.bias"])},
            "fc2": {"w": _lin_w(sd["output2emb_proj.layers.1.weight"]),
                    "b": _f32(sd["output2emb_proj.layers.1.bias"])},
        }
    return {"regressor": {"w": _lin_w(sd["regressor.weight"]),
                          "b": _f32(sd["regressor.bias"])}}


def port_reference_checkpoint(path: str, network: str, head: str):
    """Full reference checkpoint -> (params, state) for ZeroShotModel.

    The reference nests the backbone under 'model.' (network.py:481); head
    weights sit at the top level."""
    return _port_reference_sd(load_torch_state_dict(path), network, head)


def _port_reference_sd(sd: Dict[str, np.ndarray], network: str, head: str):
    if network == "c3d":
        bb_sd = {k: v for k, v in sd.items()}
        bb_params, bb_state = port_c3d(bb_sd)
    else:
        bb_sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
        bb_params, bb_state = port_video_resnet(bb_sd, network)
    return (
        {"backbone": bb_params, "head": port_head(sd, head)},
        {"backbone": bb_state},
    )


def detect_source_kind(sd: Dict[str, np.ndarray]) -> str:
    """Classify a torch state_dict: 'reference' (full fork checkpoint, head
    weights at top level / backbone under 'model.'), 'c3d' (DavideA pickle,
    bare conv1..fc8), or 'torchvision' (bare video-resnet)."""
    keys = set(sd)
    if any(k.startswith("model.") for k in keys) or any(
        k.startswith(("output2emb_proj.", "regressor.")) for k in keys
    ):
        return "reference"
    if "conv5b.weight" in keys or ("conv1.weight" in keys and "fc6.weight" in keys):
        return "c3d"
    return "torchvision"


def port_any(sd: Dict[str, np.ndarray], network: str, head: str):
    """state_dict (any supported source) -> (params, state) pytrees.

    Backbone-only sources (torchvision .pth, c3d.pickle) yield
    {'backbone': ...} trees — the head stays at its random init exactly like
    the reference's pretrained=True constructors (resnet.py:284-362,
    network.py:129-130 load backbones only)."""
    kind = detect_source_kind(sd)
    if kind == "reference":
        return _port_reference_sd(sd, network, head)
    if kind == "c3d":
        p, s = port_c3d(sd)
        return {"backbone": p}, {"backbone": s}
    p, s = port_video_resnet(sd, network)
    return {"backbone": p}, {"backbone": s}


def port_file(path: str, network: str, head: str = "mlp"):
    """Torch checkpoint file -> (params, state) pytrees."""
    return port_any(load_torch_state_dict(path), network, head)


def save_ported_npz(out_path: str, params, state, source: str = "") -> None:
    """Write ported pytrees in the framework checkpoint layout
    (params::... / model_state::... flat keys) so train.checkpoint.warm_start
    consumes them directly."""
    import json
    import os

    from zeroshotvideoclassification_tpu.train.checkpoint import _flatten

    payload = {}
    for section, tree in (("params", params), ("model_state", state)):
        for k, v in _flatten(tree).items():
            payload[f"{section}::{k}"] = v
    payload["__step__"] = np.zeros((), np.int32)
    meta = {"epoch": -1, "accuracy": 0.0, "ported_from": source}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **payload)
