"""Real two-process jax.distributed worker (CPU + gloo collectives).

Launched by tests/test_parallel.py::test_two_process_distributed — one OS
process per process_id, each with 2 virtual CPU devices, forming a
4-device global mesh across two genuinely separate processes. This is the
strongest multi-host validation possible without a real TPU slice: the
gradient reduction below crosses a process boundary through the same
jax.distributed + collectives machinery a DCN job uses.
"""

import json
import sys

import numpy as np


def main(coord: str, pid: int, out_path: str) -> None:
    import jax

    # the axon site hook pre-imports jax bound to the real TPU platform and
    # environment variables are too late — force the virtual CPU devices
    # through the config API exactly as tests/conftest.py does, BEFORE the
    # backend initializes
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zeroshotvideoclassification_tpu.data.datasets import VideoTable
    from zeroshotvideoclassification_tpu.parallel.multihost import (
        fetch_global, global_batch, maybe_initialize, process_shard,
        shard_table)

    # the driver's own startup entry (cli/main.py calls this unconditionally)
    maybe_initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)

    res = {
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_devices": len(jax.local_devices()),
    }

    mesh = jax.make_mesh((jax.device_count(),), ("data",))

    # --- global batch assembly + a cross-process gradient reduction ---------
    full = np.arange(24, dtype=np.float32).reshape(8, 3)
    start, stop = process_shard(8)
    res["shard"] = [start, stop]
    batch = global_batch(mesh, {"x": full[start:stop]})
    w = jax.device_put(np.ones(3, np.float32), NamedSharding(mesh, P()))

    def loss_fn(w, x):
        return jnp.mean(jnp.square(x @ w))

    loss, g = jax.jit(jax.value_and_grad(loss_fn))(w, batch["x"])
    res["loss"] = float(loss)
    res["grad"] = np.asarray(g).tolist()
    res["x_roundtrip"] = fetch_global(batch["x"]).tolist()

    # --- lockstep table sharding across REAL processes -----------------------
    table = VideoTable(
        name="t",
        fnames=np.asarray([f"v{i}" for i in range(7)], object),
        label_idx=np.arange(7, dtype=np.int32),
        classes=[str(i) for i in range(7)],
        class_embed=np.eye(7, 300, dtype=np.float32),
        loader="synthetic",
        is_validation=False,
    )
    local = shard_table(table)
    res["table_fnames"] = list(local.fnames)
    res["table_labels"] = local.label_idx.tolist()

    with open(out_path, "w") as fp:
        json.dump(res, fp)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
