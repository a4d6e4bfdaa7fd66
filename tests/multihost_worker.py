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

    # --- process agreement: both processes must adopt process 0's value ------
    from zeroshotvideoclassification_tpu.parallel.multihost import (
        agree_from_process_zero,
    )

    res["agreed"] = agree_from_process_zero(
        f"/ckpt/from_p{pid}.npz" if pid == 0 else None)
    res["agreed_none"] = agree_from_process_zero(None)

    with open(out_path, "w") as fp:
        json.dump(res, fp)


def run_cli(coord: str, pid: int, out_path: str) -> None:
    """Mode 'cli': the FULL driver (cli.main.main — train + zero-shot eval +
    checkpoint) as one process of a two-process jax.distributed job. Each
    process decodes only its lockstep table shard and assembles global
    batches; seeds make the global computation identical on both, so the
    parent asserts both processes report the same metrics."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from zeroshotvideoclassification_tpu.parallel.multihost import (
        maybe_initialize,
    )

    maybe_initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)

    from zeroshotvideoclassification_tpu.cli.main import main as cli_main

    out_dir = os.path.dirname(out_path)
    summary = cli_main([
        "--dataset", "synthetic", "--class_total", "4", "--train_samples",
        "32", "--bs", "8", "--n_epochs", "1", "--clip_len", "2", "--size",
        "32", "--network", "r3d_18", "--compute_dtype", "float32", "--seed",
        "1", "--nopretrained",
        "--save_path", os.path.join(out_dir, f"run_p{pid}"),
    ])
    # single-writer hygiene: each process runs with its OWN save_path here, so
    # artifact counts reveal who wrote what — process 0 must have CSV/JSONL/
    # checkpoints, every other process must have written NONE of them
    import glob

    root = os.path.join(out_dir, f"run_p{pid}")
    res = {"process_count": jax.process_count(),
           "device_count": jax.device_count(),
           "n_csv": len(glob.glob(os.path.join(root, "**", "*.csv"),
                                  recursive=True)),
           "n_jsonl": len(glob.glob(os.path.join(root, "**", "*.jsonl"),
                                    recursive=True)),
           "n_ckpt": len(glob.glob(os.path.join(root, "**", "*.npz"),
                                   recursive=True)),
           "csv_rows": sum(
               len(open(f).readlines()) for f in
               glob.glob(os.path.join(root, "**", "*.csv"), recursive=True)),
           **{k: float(v) for k, v in summary.items()}}
    with open(out_path, "w") as fp:
        json.dump(res, fp)


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "cli":
        run_cli(sys.argv[1], int(sys.argv[2]), sys.argv[3])
    else:
        main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
