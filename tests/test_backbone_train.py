"""One real train step through every backbone family.

The train-step unit tests use a stub backbone and the CLI e2e uses r3d_18;
this closes the gap where a backward-path regression in r2plus1d/mc3/c3d
(dropout rng threading, fixconvs stop-gradient, BN state updates) would go
unseen. f32 on tiny shapes; C3D needs its fixed 112x112x16 geometry (fc6 is
8192 = 512*1*4*4, network.py:120 parity) so it runs at batch 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshotvideoclassification_tpu.config import Config
from zeroshotvideoclassification_tpu.models import get_network
from zeroshotvideoclassification_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _batch(rng, b, t, s, n_classes=4):
    x = rng.uniform(-0.5, 0.0, (b, 1, t, s, s, 3)).astype(np.float32)
    labels = rng.integers(0, n_classes, size=b).astype(np.int32)
    ce = rng.normal(size=(n_classes, 300)).astype(np.float32)
    ce /= np.linalg.norm(ce, axis=1, keepdims=True)
    return x, ce[labels], labels, np.ones(b, np.float32), ce


@pytest.mark.parametrize("network,b,t,s", [
    ("r2plus1d_18", 2, 4, 32),
    ("mc3_18", 2, 4, 32),
    ("c3d", 1, 16, 112),
])
def test_backbone_full_train_step(network, b, t, s, rng):
    cfg = Config(network=network, compute_dtype="float32")
    model = get_network(cfg)
    opt = make_optimizer(1e-3)
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, compute_dtype=jnp.float32, donate=False)
    x, z, labels, weight, ce = _batch(rng, b, t, s)
    ts2, metrics = step(ts, x, z, labels, weight, ce, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    # parameters actually moved
    moved = jax.tree.map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))), ts.params, ts2.params)
    assert max(jax.tree.leaves(moved)) > 0
    assert int(ts2.step) == 1


def test_fixconvs_freezes_backbone_only(rng):
    cfg = Config(network="r2plus1d_18", compute_dtype="float32", fixconvs=True)
    model = get_network(cfg)
    opt = make_optimizer(1e-3)
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, compute_dtype=jnp.float32, donate=False)
    x, z, labels, weight, ce = _batch(rng, 2, 4, 32)
    ts2, _ = step(ts, x, z, labels, weight, ce, jax.random.PRNGKey(1))

    def max_delta(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda p, q: float(jnp.max(jnp.abs(p - q))), a, b)) or [0.0])

    # backbone frozen (network.py:482-484 parity), head still learns
    assert max_delta(ts.params["backbone"], ts2.params["backbone"]) == 0.0
    assert max_delta(ts.params["head"], ts2.params["head"]) > 0.0
