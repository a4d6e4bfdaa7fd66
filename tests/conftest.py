"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding semantics are validated
on XLA's host-platform virtual devices exactly as the driver's
dryrun_multichip does.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon site hook (PYTHONPATH=/root/.axon_site) pre-imports jax with the
# real TPU platform, so environment variables are too late here — force the
# virtual CPU mesh through the config API instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: full-model CPU compiles take ~15s each on
# this 1-core host; cached re-runs are instant.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---- suite tiering (VERDICT r4 #7) -----------------------------------------
# The full suite exceeds a 10-minute process budget on a 1-core host, so
# tests are tiered centrally by module/name (markers registered in
# pyproject.toml):
#   fast         — `pytest -m fast` is the bounded CI/judge target
#   slow         — full-model compiles / multi-minute wall time; run these
#                  FILES individually (see README "Running the tests")
#   distributed  — spawns real OS processes under jax.distributed (subset
#                  of slow)
# Explicit @pytest.mark.* on a test overrides nothing — markers only add.
_SLOW_MODULES = {
    "test_cli",             # 4 driver runs, several distinct full programs
    "test_cli_resume",      # 5 more driver runs (preemption recovery)
    "test_backbone_train",  # one full train step per backbone family
    "test_graft_entry",     # full-model compile of the driver contract
    "test_graft_entry_pod",  # 16/32-device subprocess dryruns (~7 min)
    "test_full_network_parity",  # full-depth torch oracles
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rpartition(".")[2]
        distributed = (mod == "test_parallel"
                       and "process" in item.name)
        if distributed:
            item.add_marker(pytest.mark.distributed)
        if mod in _SLOW_MODULES or distributed:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
