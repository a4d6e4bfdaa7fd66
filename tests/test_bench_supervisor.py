"""bench.py's cross-process supervision: the round-3 driver capture failed
on a transient relay outage with a bare traceback; the supervisor must turn
worker failures into a bounded number of attempts and ALWAYS emit a
parseable JSON line (success value or diagnostic)."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")


def _cpu_env(**extra):
    """Child env pinned to the CPU backend: these tests assert the
    supervisor's process contract (attempts, JSON schema), not chip
    numbers, and a child that reaches a real accelerator through a site
    hook would couple suite wall-time to relay/chip availability
    (measured: minutes per jit program on a busy relay vs seconds on CPU).
    Scrubbing the hook's trigger var keeps the child deterministic."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the TPU site hook
    return env


def test_supervisor_exhaustion_emits_diagnostic_json():
    """A worker that fails deterministically burns exactly --attempts fresh
    processes, then prints a value=null diagnostic line and exits 1.

    A bogus --network raises in get_network BEFORE any backend init, so the
    un-smoked worker fails fast even with no usable accelerator; backoff is
    zeroed through the env knob."""
    proc = subprocess.run(
        [sys.executable, BENCH, "--network", "bogus_net", "--attempts", "2",
         "--attempt_timeout", "120"],
        capture_output=True, text=True, timeout=300, cwd=ROOT,
        env=_cpu_env(ZSVC_BENCH_BACKOFF_S="0"))
    assert proc.returncode == 1
    line = next(ln for ln in reversed(proc.stdout.splitlines())
                if ln.startswith('{"metric"'))
    out = json.loads(line)
    assert out["value"] is None and out["vs_baseline"] is None
    assert out["attempts"] == 2
    assert "rc=1" in out["error"]
    assert "bogus_net" in out["metric"]
    # both attempts visible in the supervisor's stderr narration
    assert proc.stderr.count("# attempt") == 2


def test_smoke_emits_success_json_inline():
    """--smoke (the CI sanity mode) runs inline on CPU and prints the same
    JSON schema the driver parses."""
    proc = subprocess.run(
        [sys.executable, BENCH, "--smoke"],
        capture_output=True, text=True, timeout=600, cwd=ROOT,
        env=_cpu_env())
    assert proc.returncode == 0, proc.stderr[-500:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] is not None and out["value"] > 0
    assert out["metric"].startswith("train_clips_per_sec_per_chip")
    assert out["unit"] == "clips/s/chip"
