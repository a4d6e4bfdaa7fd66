"""Pallas temporal-conv kernel: interpret-mode parity vs lax.conv.

The kernel is a recorded adjudication (measured 4x slower than XLA's conv
emitter on-chip — see ops/temporal_conv.py docstring) but stays correct and
tested so future chips/compilers can re-run the A/B cheaply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshotvideoclassification_tpu.ops.temporal_conv import temporal_conv3


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_forward_matches_lax_conv(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 4, 6, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 1, 1, 16, 8)).astype(np.float32) * 0.1)
    got = temporal_conv3(x, w, compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_lax_conv(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 1, 1, 8, 8)).astype(np.float32) * 0.1)

    def lp(x, w):
        return jnp.sum(jnp.square(
            temporal_conv3(x, w, jnp.float32, interpret=True)))

    def lr(x, w):
        return jnp.sum(jnp.square(_ref(x, w)))

    gp = jax.grad(lp, argnums=(0, 1))(x, w)
    gr = jax.grad(lr, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gp[1]).reshape(3, 1, 1, 8, 8), np.asarray(gr[1]),
        atol=1e-4, rtol=1e-4)


def test_pick_tile_fallback_stays_legal():
    """When no listed tile divides p, the fallback must still return a
    multiple-of-8 divisor under the VMEM budget (returning p itself could
    break Mosaic's sublane rule AND the budget), or fail loudly."""
    import pytest

    from zeroshotvideoclassification_tpu.ops.temporal_conv import _pick_tile

    pt = _pick_tile(8 * 353, t=4, ci=64)  # 353 is prime: no listed divisor
    assert pt % 8 == 0 and (8 * 353) % pt == 0
    assert (4 + 2) * pt * 64 * 2 <= (1 << 20)
    with pytest.raises(ValueError, match="no legal tile"):
        _pick_tile(53 * 53, t=4, ci=64)  # odd p: no multiple-of-8 divisor
