"""Driver-contract tests for __graft_entry__.py.

The round driver compile-checks entry() single-chip and executes
dryrun_multichip(n) on a virtual CPU mesh; regressions here silently break
the round gate, so pin both contracts.
"""

import jax
import numpy as np


def test_dryrun_multichip_runs_on_virtual_mesh(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    assert "dryrun_multichip OK" in capsys.readouterr().out


def test_entry_returns_jittable_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    params, state, x = args
    assert x.ndim == 6  # [B, nc, T, H, W, 3]
    # tiny-shape variant of the same program (the driver jits the real one)
    small = jax.numpy.asarray(
        np.random.default_rng(0)
        .uniform(-0.5, 0.0, (1, 1, 4, 32, 32, 3)).astype(np.float32))
    emb = jax.jit(fn)(params, state, small)
    emb = np.asarray(emb)
    assert emb.shape == (1, 300)
    assert np.all(np.isfinite(emb))
    # embedding head L2-normalizes (network.py:600 parity)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
