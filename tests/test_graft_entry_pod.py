"""Pod-mesh scale evidence for __graft_entry__.dryrun_multichip.

Separate FILE from test_graft_entry.py: the 16- and 32-virtual-device
subprocess dryruns take ~1.5 + ~5.5 minutes on this 1-core host (32 threads
of collective rendezvous over one core), so together with the in-process
tests they straddle a 10-minute process budget (README "Running the tests").
"""


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

