"""SPMD semantics on the virtual 8-device CPU mesh: DP equivalence, TP head
sharding, batch sharding helpers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from zeroshotvideoclassification_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from zeroshotvideoclassification_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

from tests.test_train_eval import StubBackbone, _batch, _tiny_model

F32 = jnp.float32


def test_mesh_shapes():
    mesh = make_mesh((-1,), ("data",))
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_dp_matches_single_device(rng):
    """Loss and gradients with the batch sharded over 8 devices must match the
    unsharded computation (global-batch semantics). Params after an *Adam*
    step are not compared: Adam's first step is ~lr*sign(g), so float
    reduction-order noise near zero-gradient coordinates flips signs — an
    optimizer property, not a sharding bug."""
    model = _tiny_model()
    x, z, labels, weight, class_embed = _batch(rng, b=16)
    params, mstate = model.init(jax.random.PRNGKey(0))

    from zeroshotvideoclassification_tpu.train.step import masked_mse

    def loss_fn(p, x, z, w):
        emb, _ = model.apply(p, mstate, x, train=True, compute_dtype=F32)
        return masked_mse(emb, z, w)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    l1, g1 = grad_fn(params, x, z, weight)

    mesh = make_mesh((-1,), ("data",))
    p2 = jax.device_put(params, replicated(mesh))
    xb, zb, lb, wb = shard_batch(mesh, (x, z, labels, weight))
    l2, g2 = grad_fn(p2, xb, zb, wb)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_head_sharding_specs():
    model = _tiny_model()
    params, _ = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh((4, 2), ("data", "model"))
    specs = param_shardings(params, mesh)
    assert specs["head"]["fc1"]["w"].spec == P(None, "model")
    assert specs["head"]["fc2"]["w"].spec == P("model", None)
    assert specs["backbone"]["proj"]["w"].spec == P()


def test_tp_sharded_step_matches_replicated(rng):
    model = _tiny_model()
    opt = make_optimizer(1e-2)
    x, z, labels, weight, class_embed = _batch(rng, b=16)

    ts_ref = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, compute_dtype=F32, donate=False)
    ts_ref, m_ref = step(ts_ref, x, z, labels, weight, class_embed,
                         jax.random.PRNGKey(5))

    mesh = make_mesh((4, 2), ("data", "model"))
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    pspecs = param_shardings(ts.params, mesh)
    params = jax.tree.map(jax.device_put, ts.params, pspecs)
    ts = dataclasses.replace(
        ts,
        params=params,
        model_state=jax.device_put(ts.model_state, replicated(mesh)),
        opt_state=jax.device_put(ts.opt_state, replicated(mesh)),
    )
    xb, zb, lb, wb = shard_batch(mesh, (x, z, labels, weight))
    ceb = jax.device_put(class_embed, replicated(mesh))
    ts, m = step(ts, xb, zb, lb, wb, ceb, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ts.params["head"]["fc1"]["w"]),
        np.asarray(ts_ref.params["head"]["fc1"]["w"]), atol=1e-5)


def test_batch_sharding_ndim():
    mesh = make_mesh((-1,), ("data",))
    s1 = batch_sharding(mesh, 1)
    s4 = batch_sharding(mesh, 4)
    assert s1.spec == P("data")
    assert s4.spec == P("data", None, None, None)
