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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
