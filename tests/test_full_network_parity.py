"""Full-depth golden parity: every VideoResNet family + MLP head, end to end.

Pushes IDENTICAL weights through (a) this framework's jitted forward and
(b) an independent torch-functional re-statement of the reference
architecture (/root/reference/resnet.py:165-256 stems/blocks/forward,
/root/reference/network.py:595-600 head), at the real evaluation shape
16x112x112, asserting embedding agreement to ~1e-4 (f32).

Block-level oracles (tests/test_models.py) pin each primitive; this pins the
COMPOSITION at full 18-layer depth, bounding end-to-end drift. When released
checkpoints become available, porting them (tools/port_checkpoint.py) and
swapping the random init here turns these into released-weight golden tests
against recorded activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from zeroshotvideoclassification_tpu.config import Config
from zeroshotvideoclassification_tpu.models import get_network

torch.set_num_threads(1)
torch.set_grad_enabled(False)


def to_torch_x(x_ndhwc):
    return torch.from_numpy(np.asarray(x_ndhwc)).permute(0, 4, 1, 2, 3)


def to_torch_w(w_dhwio):
    return torch.from_numpy(np.asarray(w_dhwio)).permute(4, 3, 0, 1, 2)


def t_bn(h, p, s):
    """Eval-mode BatchNorm3d (running stats), torch semantics."""
    return TF.batch_norm(
        h, torch.tensor(np.asarray(s["mean"])),
        torch.tensor(np.asarray(s["var"])),
        torch.tensor(np.asarray(p["scale"])),
        torch.tensor(np.asarray(p["bias"])), training=False)


def t_conv(h, w, stride, padding):
    return TF.conv3d(h, to_torch_w(w), stride=stride, padding=padding)


def t_block_conv(h, kind, cp, cs, stride):
    """One conv-builder (resnet.py:18-76): Conv3DSimple / Conv3DNoTemporal /
    Conv2Plus1D (spatial conv -> mid BN -> relu -> temporal conv)."""
    if kind == "simple":
        return t_conv(h, cp["conv"]["w"], (stride,) * 3, (1, 1, 1))
    if kind == "no_temporal":
        return t_conv(h, cp["conv"]["w"], (1, stride, stride), (0, 1, 1))
    h = t_conv(h, cp["conv_s"]["w"], (1, stride, stride), (0, 1, 1))
    h = t_bn(h, cp["bn_m"], cs["bn_m"]).relu()
    return t_conv(h, cp["conv_t"]["w"], (stride, 1, 1), (1, 0, 0))


def torch_forward(arch, params, state, x_ndhwc, head_params):
    """Independent torch-functional statement of the full reference forward
    (resnet.py:243-256 + network.py:595-600), weights from our pytrees."""
    kinds = {
        "r3d_18": ("simple",) * 4,
        "mc3_18": ("simple",) + ("no_temporal",) * 3,
        "r2plus1d_18": ("2plus1d",) * 4,
    }[arch]
    p, s = params, state
    h = to_torch_x(x_ndhwc)
    if arch == "r2plus1d_18":  # R2Plus1dStem, resnet.py:176-187
        h = t_conv(h, p["stem"]["conv1"]["w"], (1, 2, 2), (0, 3, 3))
        h = t_bn(h, p["stem"]["bn1"], s["stem"]["bn1"]).relu()
        h = t_conv(h, p["stem"]["conv2"]["w"], (1, 1, 1), (1, 0, 0))
        h = t_bn(h, p["stem"]["bn2"], s["stem"]["bn2"]).relu()
    else:  # BasicStem, resnet.py:165-173
        h = t_conv(h, p["stem"]["conv1"]["w"], (1, 2, 2), (1, 3, 3))
        h = t_bn(h, p["stem"]["bn1"], s["stem"]["bn1"]).relu()
    for si, kind in enumerate(kinds):
        for bi in range(2):
            bp, bs = p[f"layer{si + 1}_{bi}"], s[f"layer{si + 1}_{bi}"]
            stride = 2 if (si > 0 and bi == 0) else 1
            out = t_block_conv(h, kind, bp["conv1"], bs["conv1"], stride)
            out = t_bn(out, bp["bn1"], bs["bn1"]).relu()
            out = t_block_conv(out, kind, bp["conv2"], bs["conv2"], 1)
            out = t_bn(out, bp["bn2"], bs["bn2"])
            if "downsample" in bp:
                ds_stride = ((1, stride, stride) if kind == "no_temporal"
                             else (stride,) * 3)
                res = t_conv(h, bp["downsample"]["conv"]["w"], ds_stride, 0)
                res = t_bn(res, bp["downsample"]["bn"], bs["downsample"]["bn"])
            else:
                res = h
            h = (out + res).relu()
    pooled = h.mean(dim=(2, 3, 4))  # AdaptiveAvgPool3d(1) + flatten
    # MLP head (network.py:595-600): Linear-ReLU-Linear -> F.normalize
    w1 = torch.from_numpy(np.asarray(head_params["fc1"]["w"]))
    b1 = torch.from_numpy(np.asarray(head_params["fc1"]["b"]))
    w2 = torch.from_numpy(np.asarray(head_params["fc2"]["w"]))
    b2 = torch.from_numpy(np.asarray(head_params["fc2"]["b"]))
    emb = (pooled @ w1 + b1).relu() @ w2 + b2
    return TF.normalize(emb, dim=-1).numpy()


@pytest.mark.parametrize("arch", ["r2plus1d_18", "r3d_18", "mc3_18"])
def test_full_network_embedding_parity(arch):
    model = get_network(Config(network=arch, head="mlp"))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(42))
    rng = np.random.default_rng(7)
    # real eval shape; uniform[-0.5, 0] matches the live normalization scheme
    x = rng.uniform(-0.5, 0, (1, 1, 16, 112, 112, 3)).astype(np.float32)

    got, _ = jax.jit(
        lambda p, s, xx: model.apply(p, s, xx, train=False,
                                     compute_dtype=jnp.float32)
    )(params, state, x)
    got = np.asarray(got)

    want = torch_forward(arch, params["backbone"], state["backbone"],
                         x[:, 0], params["head"])
    assert got.shape == want.shape == (1, 300)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # unit-norm sanity
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)
