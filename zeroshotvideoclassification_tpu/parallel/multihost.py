"""Multi-host (DCN) readiness: process init + global batch assembly.

The reference has no multi-node story at all (SURVEY §2.2: no
torch.distributed anywhere). Here multi-host comes almost free from SPMD: the
same jitted train step runs on every host; each host feeds its local shard of
the global batch and XLA reduces gradients over ICI within a slice and DCN
across slices.

Untestable on this single-chip harness; validated structurally via the
virtual CPU mesh (process_count == 1 degenerates to plain shard_batch).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(coordinator_address=None, num_processes=None,
                     process_id=None) -> None:
    """jax.distributed.initialize with auto-detection (TPU VM metadata);
    no-op when already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment


def process_shard(n: int) -> Tuple[int, int]:
    """(start, stop) of this process's contiguous slice of an n-sample list."""
    pi, pc = jax.process_index(), jax.process_count()
    per = (n + pc - 1) // pc
    return min(pi * per, n), min((pi + 1) * per, n)


def global_batch(mesh: Mesh, tree):
    """Assemble a globally-sharded batch from per-process local arrays.

    Single-process: plain device_put with the batch axis sharded on 'data'.
    Multi-process: jax.make_array_from_process_local_data stitches each
    host's local shard into the global array without gathering.
    """
    def put(x):
        sharding = NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)
