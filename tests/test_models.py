"""Model-layer tests: primitive parity vs torch functional ops, architecture
invariants, head behavior, and an end-to-end functional C3D/R(2+1)D oracle.

torch here is a pure numerical oracle (CPU); the framework itself never
imports it.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from zeroshotvideoclassification_tpu.models import (
    C3DBackbone,
    ZeroShotModel,
    get_network,
    mc3_18,
    r2plus1d_18,
    r3d_18,
)
from zeroshotvideoclassification_tpu.models import layers as L
from zeroshotvideoclassification_tpu.config import Config

F32 = jnp.float32


def to_torch_x(x_ndhwc):
    return torch.from_numpy(np.asarray(x_ndhwc)).permute(0, 4, 1, 2, 3)


def to_torch_w(w_dhwio):
    return torch.from_numpy(np.asarray(w_dhwio)).permute(4, 3, 0, 1, 2)


# ------------------------------------------------------------- primitives ---

def test_conv3d_matches_torch(rng):
    x = rng.normal(size=(2, 8, 14, 14, 5)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 5, 7)).astype(np.float32) * 0.1
    got = L.conv3d(jnp.asarray(x), {"w": jnp.asarray(w)}, (2, 2, 2), (1, 1, 1), F32)
    want = TF.conv3d(to_torch_x(x), to_torch_w(w), stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(), atol=2e-5)


def test_conv3d_asymmetric_kernel(rng):
    x = rng.normal(size=(1, 8, 10, 10, 4)).astype(np.float32)
    w = rng.normal(size=(1, 7, 7, 4, 6)).astype(np.float32) * 0.1
    got = L.conv3d(jnp.asarray(x), {"w": jnp.asarray(w)}, (1, 2, 2), (0, 3, 3), F32)
    want = TF.conv3d(to_torch_x(x), to_torch_w(w), stride=(1, 2, 2), padding=(0, 3, 3))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(), atol=2e-5)


def test_batchnorm_train_matches_torch(rng):
    c = 6
    x = rng.normal(size=(4, 3, 5, 5, c)).astype(np.float32) * 2 + 1
    p, s = L.batchnorm_init(c)
    y, s2 = L.batchnorm_apply(p, s, jnp.asarray(x), train=True, compute_dtype=F32)
    xt = to_torch_x(x)
    bn = torch.nn.BatchNorm3d(c)
    yt = bn(xt)
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().permute(0, 2, 3, 4, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["mean"]), bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["var"]), bn.running_var.numpy(), atol=1e-5)


def test_batchnorm_eval_matches_torch(rng):
    c = 4
    x = rng.normal(size=(2, 3, 4, 4, c)).astype(np.float32)
    p, s = L.batchnorm_init(c)
    p = {"scale": jnp.asarray(rng.normal(size=c).astype(np.float32)),
         "bias": jnp.asarray(rng.normal(size=c).astype(np.float32))}
    s = {"mean": jnp.asarray(rng.normal(size=c).astype(np.float32)),
         "var": jnp.asarray(rng.uniform(0.5, 2, size=c).astype(np.float32))}
    y, s2 = L.batchnorm_apply(p, s, jnp.asarray(x), train=False, compute_dtype=F32)
    yt = TF.batch_norm(to_torch_x(x), torch.tensor(np.asarray(s["mean"])),
                       torch.tensor(np.asarray(s["var"])),
                       torch.tensor(np.asarray(p["scale"])),
                       torch.tensor(np.asarray(p["bias"])), training=False)
    np.testing.assert_allclose(
        np.asarray(y), yt.permute(0, 2, 3, 4, 1).numpy(), atol=1e-5)
    assert s2 is s  # eval must not touch state


def test_maxpool_with_padding_matches_torch(rng):
    x = rng.normal(size=(2, 2, 7, 7, 3)).astype(np.float32)
    got = L.maxpool3d(jnp.asarray(x), (2, 2, 2), (2, 2, 2), (0, 1, 1))
    want = TF.max_pool3d(to_torch_x(x), 2, 2, padding=(0, 1, 1))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(), atol=1e-6)


# ------------------------------------------------------------ architecture --

def _jit_apply(model, **kw):
    return jax.jit(functools.partial(model.apply, **kw))


def _shapes(model, t=16, s=64, b=1):
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.zeros((b, t, s, s, 3), F32)
    pooled, featmap, _ = _jit_apply(model, train=False, compute_dtype=F32)(
        params, state, x)
    return pooled.shape, featmap.shape, params


def test_r2plus1d_shapes_and_midplanes():
    pooled, feat, params = _shapes(r2plus1d_18())
    assert pooled == (1, 512)
    assert feat == (1, 2, 4, 4, 512)  # T: 16/2/2/2; HW: 64/2^4
    # R(2+1)D parameter-matching: stem midplanes 45, layer1 midplanes 144
    assert params["stem"]["conv1"]["w"].shape == (1, 7, 7, 3, 45)
    assert params["layer1_0"]["conv1"]["conv_s"]["w"].shape == (1, 3, 3, 64, 144)
    assert params["layer1_0"]["conv1"]["conv_t"]["w"].shape == (3, 1, 1, 144, 64)
    # layer2 first block downsample exists, later blocks don't
    assert "downsample" in params["layer2_0"] and "downsample" not in params["layer2_1"]


def test_r3d_and_mc3_shapes():
    pooled, feat, _ = _shapes(r3d_18())
    assert pooled == (1, 512) and feat == (1, 2, 4, 4, 512)
    pooled, feat, params = _shapes(mc3_18())
    # NoTemporal stages never stride time: T' stays 16
    assert pooled == (1, 512) and feat == (1, 16, 4, 4, 512)
    assert params["layer2_0"]["conv1"]["conv"]["w"].shape == (1, 3, 3, 64, 128)
    # mc3 downsample must not stride time either
    assert params["layer2_0"]["downsample"]["conv"]["w"].shape == (1, 1, 1, 64, 128)


def test_c3d_shapes():
    model = C3DBackbone()
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 112, 112, 3), F32)
    feats, featmap, _ = _jit_apply(model, train=False, compute_dtype=F32)(
        params, state, x)
    assert feats.shape == (1, 4096)
    assert featmap.shape == (1, 1, 4, 4, 512)


# ------------------------------------------------- functional C3D oracle ----

def test_c3d_matches_torch_functional(rng):
    """End-to-end layout check: same weights through torch's NCDHW pipeline
    (incl. the channels-first flatten before fc6) must reproduce our NDHWC
    result exactly."""
    model = C3DBackbone()
    params, state = jax.jit(model.init)(jax.random.PRNGKey(1))
    x = rng.normal(size=(1, 16, 112, 112, 3)).astype(np.float32) * 0.2
    feats, _, _ = _jit_apply(model, train=False, compute_dtype=F32)(
        params, state, jnp.asarray(x))

    h = to_torch_x(x)
    specs = [("conv1", (1, 2, 2), (1, 2, 2), 0), ("conv2", 2, 2, 0),
             ("conv3a", None, None, None), ("conv3b", 2, 2, 0),
             ("conv4a", None, None, None), ("conv4b", 2, 2, 0),
             ("conv5a", None, None, None), ("conv5b", 2, 2, (0, 1, 1))]
    for name, pk, ps, pp in specs:
        w = to_torch_w(params[name]["w"])
        b = torch.from_numpy(np.asarray(params[name]["b"]))
        h = TF.relu(TF.conv3d(h, w, b, stride=1, padding=1))
        if pk is not None:
            h = TF.max_pool3d(h, pk, ps, padding=pp)
    h = h.reshape(-1, 8192)
    wf = torch.from_numpy(np.asarray(params["fc6"]["w"]).T)
    bf = torch.from_numpy(np.asarray(params["fc6"]["b"]))
    want = TF.relu(TF.linear(h, wf, bf))
    np.testing.assert_allclose(np.asarray(feats), want.numpy(), atol=3e-4, rtol=1e-4)


# ------------------------------------------------------------------ heads ---

def test_heads_output_unit_norm():
    for net, head in [("r2plus1d_18", "mlp"), ("r3d_18", "linear")]:
        cfg = Config(network=net, head=head)
        model = get_network(cfg)
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
        x = jnp.array(np.random.default_rng(0).normal(
            size=(2, 1, 8, 32, 32, 3)).astype(np.float32) * 0.1)
        emb, _ = _jit_apply(model, train=False, compute_dtype=F32)(params, state, x)
        assert emb.shape == (2, 300)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(emb, axis=-1)), 1.0, atol=1e-5)


def test_multi_clip_mean_pooling(rng):
    cfg = Config(network="r3d_18", head="linear")
    model = get_network(cfg)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    clip = rng.normal(size=(1, 1, 8, 32, 32, 3)).astype(np.float32) * 0.1
    x2 = np.concatenate([clip, clip], axis=1)  # two identical clips
    ap = _jit_apply(model, train=False, compute_dtype=F32)
    e1, _ = ap(params, state, jnp.asarray(clip))
    e2, _ = ap(params, state, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_fixconvs_stops_backbone_grads():
    cfg = Config(network="r3d_18", head="mlp", fixconvs=True)
    model = get_network(cfg)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.array(np.random.default_rng(1).normal(
        size=(1, 1, 8, 32, 32, 3)).astype(np.float32) * 0.1)
    z = jnp.ones((1, 300), F32) / np.sqrt(300)

    def loss_fn(p):
        emb, _ = model.apply(p, state, x, train=True, compute_dtype=F32)
        return jnp.mean((emb - z) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    bb_norm = sum(float(jnp.abs(g).sum())
                  for g in jax.tree.leaves(grads["backbone"]))
    head_norm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree.leaves(grads["head"]))
    assert bb_norm == 0.0 and head_norm > 0.0


def test_get_network_routing():
    assert get_network(Config(network="r2plus1d_18")).backbone.stem == "r2plus1d"
    assert get_network(Config(network="c3d")).head == "c3d"
    assert get_network(Config(network="resnet18")).head == "linear"
    assert get_network(Config(network="mc3_18")).backbone.conv_makers[1] == "no_temporal"
    try:
        get_network(Config(network="vgg"))
        assert False
    except ValueError:
        pass


def test_remat_warns_when_inapplicable(capsys):
    """--remat only rematerializes the VideoResNet families; on C3D the
    knob must say so instead of being silently dropped (a user chasing an
    HBM OOM needs the signal)."""
    m = get_network(Config(network="c3d", remat="full"))
    assert "has no effect" in capsys.readouterr().err
    assert m.head == "c3d"
    m2 = get_network(Config(network="r3d_18", remat="convs"))
    assert capsys.readouterr().err == ""
    assert m2.backbone.remat == "convs"


def test_bf16_forward_runs():
    model = get_network(Config(network="r2plus1d_18"))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 1, 8, 32, 32, 3), jnp.bfloat16)
    emb, _ = _jit_apply(model, train=True, compute_dtype=jnp.bfloat16)(
        params, state, x)
    assert emb.dtype == jnp.float32  # head/normalize keep fp32
    assert bool(jnp.all(jnp.isfinite(emb)))


def test_conv3d_temporal_kernel_matches_torch(rng):
    # (3,1,1) temporal conv with temporal stride — the 2D-folded fast path
    x = rng.normal(size=(2, 8, 6, 6, 9)).astype(np.float32)
    w = rng.normal(size=(3, 1, 1, 9, 5)).astype(np.float32) * 0.1
    got = L.conv3d(jnp.asarray(x), {"w": jnp.asarray(w)}, (2, 1, 1), (1, 0, 0), F32)
    want = TF.conv3d(to_torch_x(x), to_torch_w(w), stride=(2, 1, 1), padding=(1, 0, 0))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(), atol=2e-5)


def test_conv3d_1x1x1_downsample_matches_torch(rng):
    # 1x1x1 conv, stride (2,2,2), no padding — pure subsample + matmul path
    x = rng.normal(size=(2, 8, 6, 6, 9)).astype(np.float32)
    w = rng.normal(size=(1, 1, 1, 9, 5)).astype(np.float32) * 0.1
    got = L.conv3d(jnp.asarray(x), {"w": jnp.asarray(w)}, (2, 2, 2), (0, 0, 0), F32)
    want = TF.conv3d(to_torch_x(x), to_torch_w(w), stride=(2, 2, 2), padding=0)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(), atol=2e-5)


def test_r2plus1d_block_matches_torch_functional(rng):
    """One R(2+1)D BasicBlock with downsample (eval mode), our params pushed
    through a torch functional chain: conv(1,3,3)->BN->relu->conv(3,1,1) ->
    BN -> relu -> same again -> BN, + 1x1x1-downsampled residual, relu."""
    from zeroshotvideoclassification_tpu.models.resnet3d import (
        _block_apply, _block_init)

    params, state = jax.jit(
        lambda k: _block_init(k, "2plus1d", 64, 128, 2))(jax.random.PRNGKey(3))
    x = rng.normal(size=(1, 4, 14, 14, 64)).astype(np.float32) * 0.5
    got, _ = _block_apply("2plus1d", params, state, jnp.asarray(x), 2, False, F32)

    def t_bn(h, p, s):
        return TF.batch_norm(
            h, torch.tensor(np.asarray(s["mean"])),
            torch.tensor(np.asarray(s["var"])),
            torch.tensor(np.asarray(p["scale"])),
            torch.tensor(np.asarray(p["bias"])), training=False)

    def t_conv2plus1(h, cp, cs, stride):
        h = TF.conv3d(h, to_torch_w(cp["conv_s"]["w"]),
                      stride=(1, stride, stride), padding=(0, 1, 1))
        h = TF.relu(t_bn(h, cp["bn_m"], cs["bn_m"]))
        return TF.conv3d(h, to_torch_w(cp["conv_t"]["w"]),
                         stride=(stride, 1, 1), padding=(1, 0, 0))

    h = to_torch_x(x)
    out = t_conv2plus1(h, params["conv1"], state["conv1"], 2)
    out = TF.relu(t_bn(out, params["bn1"], state["bn1"]))
    out = t_conv2plus1(out, params["conv2"], state["conv2"], 1)
    out = t_bn(out, params["bn2"], state["bn2"])
    res = TF.conv3d(h, to_torch_w(params["downsample"]["conv"]["w"]), stride=2)
    res = t_bn(res, params["downsample"]["bn"], state["downsample"]["bn"])
    want = TF.relu(out + res).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_clip_pool_modes(rng):
    """'feature' (upstream clip-mean before head) vs 'embedding' (fork per-
    clip head): identical at n_clips=1 — the trained configuration — and
    divergent for n_clips>1 (SURVEY quirk discussion; VERDICT r1 item 9)."""
    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network

    for nc, should_match in ((1, True), (3, False)):
        x = rng.uniform(-0.5, 0, (2, nc, 4, 32, 32, 3)).astype(np.float32)
        if nc > 1:  # make clips clearly distinct so the orders separate
            x[:, 1] = -0.5
            x[:, 2] = 0.0
        embs = []
        for pool in ("feature", "embedding"):
            model = get_network(Config(network="r3d_18", head="mlp",
                                       clip_pool=pool))
            params, state = jax.jit(model.init)(jax.random.PRNGKey(3))
            emb, _ = _jit_apply(model, train=False,
                                compute_dtype=jnp.float32)(
                params, state, jnp.asarray(x))
            assert emb.shape == (2, 300)
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
            embs.append(np.asarray(emb))
        if should_match:
            np.testing.assert_allclose(embs[0], embs[1], atol=1e-5)
        else:
            assert np.abs(embs[0] - embs[1]).max() > 1e-3


def test_stem_s2d_matches_direct_conv(rng):
    """Space-to-depth stem conv == direct (kd,7,7)/stride-(1,2,2) conv: the
    weight rearrangement is an exact reassociation (f32 to float tolerance)."""
    for kd, pd in ((1, 0), (3, 1)):
        x = jnp.asarray(rng.normal(size=(2, 4, 16, 20, 3)).astype(np.float32))
        p = {"w": jnp.asarray(
            rng.normal(size=(kd, 7, 7, 3, 13)).astype(np.float32))}
        direct = jax.jit(lambda x, p: L.conv3d(
            x, p, (1, 2, 2), (pd, 3, 3), jnp.float32))(x, p)
        s2d = jax.jit(lambda x, p: L.stem_conv_s2d(
            x, p, 1, pd, jnp.float32))(x, p)
        assert direct.shape == s2d.shape
        np.testing.assert_allclose(np.asarray(direct), np.asarray(s2d),
                                   atol=2e-5, rtol=1e-5)


def test_stem_s2d_odd_input_falls_back():
    """Odd spatial sizes take the direct-conv path (shape guard)."""
    from zeroshotvideoclassification_tpu.models.resnet3d import r3d_18
    m = r3d_18()
    params, state = jax.jit(m.init)(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 4, 15, 17, 3), jnp.float32)
    pooled, fm, _ = jax.jit(functools.partial(
        m.apply, train=False, compute_dtype=jnp.float32))(params, state, x)
    assert pooled.shape == (1, 512)


def test_remat_grads_match(rng):
    """--remat (jax.checkpoint per block) must not change loss or gradients,
    only the backward memory/flops trade."""
    import optax

    x = jnp.asarray(rng.uniform(-0.5, 0, (2, 1, 4, 32, 32, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 300)).astype(np.float32))
    grads = []
    for remat in (False, True, "convs"):
        model = get_network(Config(network="r3d_18", head="mlp", remat=remat))
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))

        def loss(p):
            emb, _ = model.apply(p, state, x, train=True,
                                 compute_dtype=jnp.float32)
            return jnp.mean(jnp.square(emb - z))

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        grads.append((float(l), g))
    for l, g in grads[1:]:
        assert abs(grads[0][0] - l) < 1e-6
        for a, b in zip(jax.tree.leaves(grads[0][1]), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
