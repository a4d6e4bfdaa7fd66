"""Weight-porting round-trip tests.

Builds a torchvision-style state_dict FROM our initialized params (inverse
layout transform), runs it through models.porting, and asserts bit-identity —
validating key naming, nesting, and every transpose without needing network
access to real checkpoints.
"""

import numpy as np
import jax

from zeroshotvideoclassification_tpu.models.porting import (
    port_c3d,
    port_head,
    port_video_resnet,
)
from zeroshotvideoclassification_tpu.models.c3d import C3DBackbone
from zeroshotvideoclassification_tpu.models.resnet3d import (
    mc3_18,
    r2plus1d_18,
    r3d_18,
)


def _to_torch_conv(w):  # DHWIO -> OIDHW
    return np.transpose(np.asarray(w), (4, 3, 0, 1, 2))


def _bn_to_sd(sd, prefix, p, s):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])
    sd[prefix + ".running_mean"] = np.asarray(s["mean"])
    sd[prefix + ".running_var"] = np.asarray(s["var"])


def _export_video_resnet(params, state, arch):
    """our pytrees -> torchvision state_dict naming."""
    sd = {}
    if arch == "r2plus1d_18":
        sd["stem.0.weight"] = _to_torch_conv(params["stem"]["conv1"]["w"])
        _bn_to_sd(sd, "stem.1", params["stem"]["bn1"], state["stem"]["bn1"])
        sd["stem.3.weight"] = _to_torch_conv(params["stem"]["conv2"]["w"])
        _bn_to_sd(sd, "stem.4", params["stem"]["bn2"], state["stem"]["bn2"])
    else:
        sd["stem.0.weight"] = _to_torch_conv(params["stem"]["conv1"]["w"])
        _bn_to_sd(sd, "stem.1", params["stem"]["bn1"], state["stem"]["bn1"])

    for si in range(4):
        for bi in range(2):
            ours, tv = f"layer{si + 1}_{bi}", f"layer{si + 1}.{bi}"
            bp, bst = params[ours], state[ours]
            for cn, bn in (("conv1", "bn1"), ("conv2", "bn2")):
                if "conv_s" in bp[cn]:  # Conv2Plus1D Sequential nesting
                    sd[f"{tv}.{cn}.0.0.weight"] = _to_torch_conv(bp[cn]["conv_s"]["w"])
                    _bn_to_sd(sd, f"{tv}.{cn}.0.1", bp[cn]["bn_m"],
                              bst[cn]["bn_m"])
                    sd[f"{tv}.{cn}.0.3.weight"] = _to_torch_conv(bp[cn]["conv_t"]["w"])
                else:
                    sd[f"{tv}.{cn}.0.weight"] = _to_torch_conv(bp[cn]["conv"]["w"])
                _bn_to_sd(sd, f"{tv}.{cn}.1", bp[bn], bst[bn])
            if "downsample" in bp:
                sd[f"{tv}.downsample.0.weight"] = _to_torch_conv(
                    bp["downsample"]["conv"]["w"])
                _bn_to_sd(sd, f"{tv}.downsample.1", bp["downsample"]["bn"],
                          bst["downsample"]["bn"])
    return sd


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(lb[path]), err_msg=str(path))


def test_port_roundtrip_all_resnets():
    for arch, ctor in (("r2plus1d_18", r2plus1d_18), ("r3d_18", r3d_18),
                       ("mc3_18", mc3_18)):
        model = ctor()
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
        sd = _export_video_resnet(params, state, arch)
        p2, s2 = port_video_resnet(sd, arch)
        _assert_trees_equal(params, p2)
        _assert_trees_equal(state, s2)


def test_port_c3d_roundtrip():
    model = C3DBackbone()
    params, _ = jax.jit(model.init)(jax.random.PRNGKey(0))
    sd = {}
    for name in ("conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b",
                 "conv5a", "conv5b"):
        sd[name + ".weight"] = _to_torch_conv(params[name]["w"])
        sd[name + ".bias"] = np.asarray(params[name]["b"])
    sd["fc6.weight"] = np.asarray(params["fc6"]["w"]).T
    sd["fc6.bias"] = np.asarray(params["fc6"]["b"])
    # extra keys (fc7/fc8 in real c3d.pickle) must be ignored
    sd["fc7.weight"] = np.zeros((4096, 4096), np.float32)
    p2, _ = port_c3d(sd)
    _assert_trees_equal(params, p2)


def test_port_head_mappings(rng):
    sd = {
        "output2emb_proj.layers.0.weight": rng.normal(size=(512, 512)).astype(np.float32),
        "output2emb_proj.layers.0.bias": rng.normal(size=(512,)).astype(np.float32),
        "output2emb_proj.layers.1.weight": rng.normal(size=(300, 512)).astype(np.float32),
        "output2emb_proj.layers.1.bias": rng.normal(size=(300,)).astype(np.float32),
        "regressor.weight": rng.normal(size=(300, 4096)).astype(np.float32),
        "regressor.bias": rng.normal(size=(300,)).astype(np.float32),
    }
    mlp = port_head(sd, "mlp")
    assert mlp["fc1"]["w"].shape == (512, 512)
    assert mlp["fc2"]["w"].shape == (512, 300)
    np.testing.assert_array_equal(
        mlp["fc2"]["w"], sd["output2emb_proj.layers.1.weight"].T)
    lin = port_head(sd, "c3d")
    assert lin["regressor"]["w"].shape == (4096, 300)


# ------------------------------------------- end-to-end pretrained wiring ---

def test_port_checkpoint_cli_and_warm_start(tmp_path):
    """Torch-format checkpoint on disk -> tools.port_checkpoint CLI -> npz ->
    warm_start restores backbone params AND BN running stats; the head keeps
    its fresh init (reference pretrained=True semantics, resnet.py:284-362)."""
    import torch

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.tools.port_checkpoint import (
        main as port_main,
    )
    from zeroshotvideoclassification_tpu.train import warm_start

    arch = "r3d_18"
    bb_params, bb_state = jax.jit(r3d_18().init)(jax.random.PRNGKey(0))
    src = str(tmp_path / "r3d_18-fake.pth")
    torch.save(_export_video_resnet(bb_params, bb_state, arch), src)

    out = str(tmp_path / "pretrained" / "r3d_18.npz")
    port_main(["--src", src, "--network", arch, "--out", out])

    model = get_network(Config(network=arch, head="mlp"))
    fp, fs = jax.jit(model.init)(jax.random.PRNGKey(5))
    wp, ws, n = warm_start(out, fp, fs, network=arch)
    assert n == len(jax.tree.leaves(bb_params)) + len(jax.tree.leaves(bb_state))
    _assert_trees_equal(wp["backbone"], bb_params)
    _assert_trees_equal(ws["backbone"], bb_state)
    _assert_trees_equal(wp["head"], fp["head"])  # head untouched

    # the torch file itself is also accepted directly (in-memory port)
    wp2, ws2, n2 = warm_start(src, fp, fs, network=arch)
    assert n2 == n
    _assert_trees_equal(wp2["backbone"], bb_params)


def test_detect_source_kind():
    from zeroshotvideoclassification_tpu.models.porting import (
        detect_source_kind,
    )

    assert detect_source_kind({"stem.0.weight": 0}) == "torchvision"
    assert detect_source_kind({"conv1.weight": 0, "fc6.weight": 0}) == "c3d"
    assert detect_source_kind({"model.stem.0.weight": 0,
                               "output2emb_proj.layers.0.weight": 0}) == "reference"


def test_c3d_pickle_davidea_layout_contract(tmp_path):
    """De-risk the ONE porting path never exercised against its true
    producer: a synthetic c3d.pickle with the EXACT DavideA/c3d-pytorch
    state_dict contract — torch.save'd torch tensors, every key and shape of
    the real asset incl. the fc7/fc8 classifier the reference bypasses
    (/root/reference/network.py:120-141: Conv3d(3,64)..Conv3d(512,512),
    fc6 8192->4096, fc7 4096->4096, fc8 4096->487) — must flow through
    warm_start end to end with the layout transposes verified by value."""
    import torch

    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_optimizer,
        warm_start,
    )

    torch.manual_seed(0)
    shapes = [("conv1", 3, 64), ("conv2", 64, 128), ("conv3a", 128, 256),
              ("conv3b", 256, 256), ("conv4a", 256, 512),
              ("conv4b", 512, 512), ("conv5a", 512, 512),
              ("conv5b", 512, 512)]
    sd = {}
    for name, ci, co in shapes:
        sd[name + ".weight"] = torch.randn(co, ci, 3, 3, 3) * 0.02
        sd[name + ".bias"] = torch.randn(co) * 0.02
    sd["fc6.weight"] = torch.randn(4096, 8192) * 0.02
    sd["fc6.bias"] = torch.randn(4096) * 0.02
    sd["fc7.weight"] = torch.randn(4096, 4096) * 0.02  # bypassed, must be
    sd["fc7.bias"] = torch.randn(4096) * 0.02          # tolerated
    sd["fc8.weight"] = torch.randn(487, 4096) * 0.02
    sd["fc8.bias"] = torch.randn(487) * 0.02
    path = str(tmp_path / "c3d.pickle")
    torch.save(sd, path)

    model = get_network(Config(network="c3d"))
    ts = create_train_state(model, make_optimizer(1e-3), jax.random.PRNGKey(7))
    params, mstate, n = warm_start(path, ts.params, ts.model_state,
                                   network="c3d", head="c3d")
    # 8 convs x (w, b) + fc6 (w, b) = 18 backbone tensors; head regressor
    # stays at its random init (the reference adds it AFTER the pickle load)
    assert n == 18, n
    # layout by value: DavideA [O, I, kD, kH, kW] -> our DHWIO
    got = np.asarray(params["backbone"]["conv2"]["w"])
    want = sd["conv2.weight"].numpy()
    assert got.shape == (3, 3, 3, 64, 128)
    np.testing.assert_array_equal(got[1, 2, 0, 10, 99],
                                  want[99, 10, 1, 2, 0])
    got_fc = np.asarray(params["backbone"]["fc6"]["w"])
    assert got_fc.shape == (8192, 4096)
    np.testing.assert_array_equal(got_fc, sd["fc6.weight"].numpy().T)
    # head untouched
    np.testing.assert_array_equal(
        np.asarray(params["head"]["regressor"]["w"]),
        np.asarray(ts.params["head"]["regressor"]["w"]))
