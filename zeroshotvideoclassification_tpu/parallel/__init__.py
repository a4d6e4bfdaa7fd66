"""Parallelism layer: device mesh construction + sharding policy.

The reference's only compute parallelism is single-host nn.DataParallel
(/root/reference/main.py:126). Here parallelism is SPMD over a
jax.sharding.Mesh:
  * 'data' axis — batch sharding (DP); gradient/BN-stat reductions become XLA
    collectives over ICI automatically under jit.
  * 'model' axis — optional tensor parallelism for the embedding head.
  * clip axis of multi-clip eval folds into 'data' (embarrassingly parallel —
    the reference's only 'sequence' dimension; see SURVEY.md §2.2).
"""

from zeroshotvideoclassification_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_batch,
    state_shardings,
)
from zeroshotvideoclassification_tpu.parallel.multihost import (
    agree_from_process_zero,
    maybe_initialize,
    sync_processes,
    process_shard,
    global_batch,
    shard_table,
    fetch_global,
)
