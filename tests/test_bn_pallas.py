"""Fused Pallas BN epilogue vs the jnp reference (interpret mode on CPU):
forward values and every VJP output, with and without residual/ReLU, train
and eval factorizations, plus the model-level block equivalence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshotvideoclassification_tpu.models import layers as L
from zeroshotvideoclassification_tpu.ops import bn_pallas


@pytest.fixture
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def wrapped(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(bn_pallas.pl, "pallas_call", wrapped)


def _ref(x, scale, bias, mean, var, res, relu, eps):
    """Pure-jnp mirror of the kernel's f32 math."""
    a = scale * jax.lax.rsqrt(var + eps)
    b = bias - mean * a
    y = x.astype(jnp.float32) * a + b
    if res is not None:
        y = y + res.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@pytest.mark.parametrize("with_res", [False, True])
@pytest.mark.parametrize("relu", [True, False])
def test_bn_pallas_fwd_and_grads_match_reference(interpret_pallas, rng,
                                                 with_res, relu):
    shape = (2, 3, 4, 8, 6)  # [N, T, H, W, C]; rows = 24, lanes = 48
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    res = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
           if with_res else None)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=c).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.3, 3.0, c).astype(np.float32))
    w = jnp.asarray(rng.normal(size=shape).astype(np.float32))  # cotangent

    def loss_pallas(x, scale, bias, mean, var, res):
        y = bn_pallas.bn_apply_relu_pallas(x, scale, bias, mean, var, res,
                                           relu, 1e-5)
        return jnp.sum(y.astype(jnp.float32) * w)

    def loss_ref(x, scale, bias, mean, var, res):
        return jnp.sum(_ref(x, scale, bias, mean, var, res, relu,
                            1e-5).astype(jnp.float32) * w)

    yp = bn_pallas.bn_apply_relu_pallas(x, scale, bias, mean, var, res,
                                        relu, 1e-5)
    yr = _ref(x, scale, bias, mean, var, res, relu, 1e-5)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=2e-6)

    argnums = (0, 1, 2, 3, 4, 5) if with_res else (0, 1, 2, 3, 4)
    gp = jax.grad(loss_pallas, argnums=argnums)(x, scale, bias, mean, var, res)
    gr = jax.grad(loss_ref, argnums=argnums)(x, scale, bias, mean, var, res)
    names = ["dx", "d_scale", "d_bias", "d_mean", "d_var", "d_res"]
    for n, a, b in zip(names, gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4, err_msg=n)


def test_bn_pallas_bf16_forward(interpret_pallas, rng):
    shape = (2, 2, 2, 8, 16)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
        jnp.bfloat16)
    c = shape[-1]
    one = jnp.ones((c,), jnp.float32)
    zero = jnp.zeros((c,), jnp.float32)
    y = bn_pallas.bn_apply_relu_pallas(x, one, zero, zero, one, None,
                                       True, 1e-5)
    assert y.dtype == jnp.bfloat16
    ref = jnp.maximum(x.astype(jnp.float32) * jax.lax.rsqrt(1 + 1e-5), 0.0)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               atol=0.02)


def test_batchnorm_relu_block_equivalence(interpret_pallas, rng, monkeypatch):
    """Model-level: batchnorm_relu with the Pallas gate forced on must match
    the default path (train mode: the full stats + apply + residual + relu
    composition, gradients included) within f32 tolerance."""
    monkeypatch.setattr(L, "_use_pallas_bn", lambda x: True)
    shape = (2, 2, 4, 8, 8)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    res = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    params = {"scale": jnp.asarray(rng.uniform(0.5, 2, c).astype(np.float32)),
              "bias": jnp.asarray(rng.normal(size=c).astype(np.float32))}
    state = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    w = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def fused(x, params):
        y, ns = L.batchnorm_relu(params, state, x, train=True, residual=res,
                                 compute_dtype=jnp.float32)
        return jnp.sum(y * w), ns

    def plain(x, params):
        y, ns = L.batchnorm_apply(params, state, x, train=True,
                                  compute_dtype=jnp.float32)
        y = L.relu(y + res)
        return jnp.sum(y * w), ns

    (lf, nsf), gf = jax.value_and_grad(fused, argnums=(0, 1),
                                       has_aux=True)(x, params)
    (lp, nsp), gp = jax.value_and_grad(plain, argnums=(0, 1),
                                       has_aux=True)(x, params)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), gf, gp)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), nsf, nsp)


def test_eligibility_and_rows_block():
    br = bn_pallas._pick_rows_block(14336, 3584)
    assert br >= 8
    assert 14336 % br == 0  # block must tile the rows exactly
    assert br * 3584 * 4 <= (1 << 21)  # one f32 block fits the VMEM target
    x = jnp.zeros((16, 16, 56, 56, 64), jnp.bfloat16)
    assert bn_pallas.eligible(x)
    assert not bn_pallas.eligible(jnp.zeros((7,), jnp.float32))
