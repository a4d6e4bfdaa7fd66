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


def run_cli(coord: str, pid: int, out_path: str, nprocs: int = 2) -> None:
    """Mode 'cli': the FULL driver (cli.main.main — train + zero-shot eval +
    checkpoint) as one process of an nprocs-process jax.distributed job. Each
    process decodes only its lockstep table shard and assembles global
    batches; seeds make the global computation identical everywhere, so the
    parent asserts every process reports the same metrics. (nprocs > 2 with
    the full r3d driver exceeds this 1-core host's communicator connect
    windows — the 4-process evidence runs the eval machinery in 'eval4'.)"""
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

    maybe_initialize(coordinator_address=coord, num_processes=nprocs,
                     process_id=pid)

    from zeroshotvideoclassification_tpu.cli.main import main as cli_main

    out_dir = os.path.dirname(out_path)
    data_args = (["--class_total", "10", "--train_samples", "10", "--bs", "2"]
                 if nprocs == 4 else
                 ["--class_total", "4", "--train_samples", "32", "--bs", "8"])
    summary = cli_main([
        "--dataset", "synthetic", *data_args,
        "--n_epochs", "1", "--clip_len", "2", "--size",
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


def run_eval4(coord: str, pid: int, out_path: str, nprocs: int = 4) -> None:
    """Mode 'eval4': the REAL zero-shot eval machinery across nprocs
    processes over an UNEVEN table — shard_table lockstep padding (15 rows
    -> 4+4+4+3, last shard zero-weight padded), HostPipeline decode,
    device_batch_global assembly, extract_embeddings' packed single-gather,
    compute_accuracy + the 10-split protocol. A tiny stub backbone keeps
    per-step execution far inside the communicator connect window (the full
    r3d driver at 4-way contention on this 1-core host exceeds it; the
    full-driver multi-process evidence is the 2-process 'cli' mode)."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import jax.numpy as jnp

    from zeroshotvideoclassification_tpu.parallel.multihost import (
        maybe_initialize,
    )

    maybe_initialize(coordinator_address=coord, num_processes=nprocs,
                     process_id=pid)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tests.test_train_eval import StubBackbone

    from zeroshotvideoclassification_tpu.cli.main import eval_batch_size
    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.data.datasets import build_datasets
    from zeroshotvideoclassification_tpu.data.pipeline import (
        HostPipeline,
        device_batch_global,
    )
    from zeroshotvideoclassification_tpu.eval import compute_accuracy
    from zeroshotvideoclassification_tpu.eval.zeroshot import (
        extract_embeddings,
        split_protocol,
    )
    from zeroshotvideoclassification_tpu.models.heads import ZeroShotModel
    from zeroshotvideoclassification_tpu.parallel import make_mesh, shard_table
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    # class_total=10 -> 5 test classes x 3 samples = 15 rows: UNEVEN over 4
    cfg = Config(dataset="synthetic", class_total=10, clip_len=2, size=32,
                 bs=2, n_clips=1)
    table = build_datasets(cfg, None)["testing"][0]
    assert len(table) % nprocs != 0, len(table)  # must exercise ragged split

    mesh = make_mesh((-1,), ("data",))
    model = ZeroShotModel(backbone=StubBackbone(), head="mlp")
    ts = create_train_state(model, make_optimizer(1e-3),
                            jax.random.PRNGKey(0))
    eval_step = make_eval_step(model, compute_dtype=jnp.float32)

    n_data = mesh.shape["data"]
    ebs = eval_batch_size(cfg.bs * n_data, table.n_clips, n_data, nprocs,
                          len(table), cfg.eval_clip_budget)
    local = shard_table(table)
    pipe = HostPipeline(local, cfg, ebs // nprocs, seed=0)
    batches = (device_batch_global(mesh, h, table.n_clips, cfg.clip_len)
               for h in pipe)
    pred, true_e, true_l = extract_embeddings(
        eval_step, ts.params, ts.model_state, batches, sync_tag="eval4")
    acc, acc5 = compute_accuracy(pred, table.class_embed, true_e)
    sp = split_protocol(pred, table.class_embed, true_l, true_e)
    res = {
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "table_rows": len(table),
        "local_rows": len(local),
        "n_samples": int(len(pred)),
        "accuracy": float(acc),
        "accuracy_top5": float(acc5),
        "split_mean": float(sp["accuracy_split_mean"]),
        "split_std": float(sp["accuracy_split_std"]),
    }
    with open(out_path, "w") as fp:
        json.dump(res, fp)


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "cli":
        nprocs = int(sys.argv[5]) if len(sys.argv) > 5 else 2
        run_cli(sys.argv[1], int(sys.argv[2]), sys.argv[3], nprocs)
    elif len(sys.argv) > 4 and sys.argv[4] == "eval4":
        nprocs = int(sys.argv[5]) if len(sys.argv) > 5 else 4
        run_eval4(sys.argv[1], int(sys.argv[2]), sys.argv[3], nprocs)
    else:
        main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
