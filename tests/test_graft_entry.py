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


def test_dryrun_multichip_scales_to_pod_meshes():
    """dryrun at 16 (dp8 x tp2) and 32 (dp8 x tp4) virtual devices — the
    SURVEY §7 step-9 scale evidence. Subprocesses, because the device count
    must be set before the backend initializes (conftest already pinned this
    process to 8).

    The 32-device run executes 8-thread collective rendezvous on ONE
    physical core; under CI load XLA's 20s rendezvous watchdog can abort the
    process (SIGABRT) even though the program is correct — that capacity
    abort is retried once and then skipped (it has passed repeatedly on an
    idle host). Real failures (wrong mesh, compile errors, bad loss) exit
    with a python traceback (rc=1) and still fail the test."""
    import os
    import subprocess
    import sys

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for n, want_mesh in ((16, "{'data': 8, 'model': 2}"),
                        (32, "{'data': 8, 'model': 4}")):
        for attempt in (0, 1):
            out = subprocess.run(
                [sys.executable, os.path.join(repo, "__graft_entry__.py"),
                 str(n)],
                cwd=repo, capture_output=True, text=True, timeout=900)
            if out.returncode == 0 or out.returncode >= 1:
                break
        if out.returncode < 0 and "may be stuck" in (out.stdout + out.stderr):
            pytest.skip(f"{n}-device virtual mesh exceeded this host's "
                        f"collective-rendezvous capacity (signal "
                        f"{out.returncode}); not a framework failure")
        assert out.returncode == 0, out.stdout + out.stderr
        assert "dryrun_multichip OK" in out.stdout, out.stdout
        assert want_mesh in out.stdout, out.stdout


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
