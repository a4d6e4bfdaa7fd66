"""Training/evaluation driver with reference CLI parity.

The epoch loop mirrors /root/reference/main.py:330-380: train one epoch
(sample-capped), evaluate each test set (full + 10-split protocol), keep the
best-by-mean-accuracy checkpoint, step the LR schedule, loop. TPU-native
differences: one jitted SPMD train step (batch sharded over the mesh 'data'
axis), on-device input transform, on-device retrieval metrics, full
train-state checkpoints.

Run example (no datasets needed):
  python -m zeroshotvideoclassification_tpu.cli.main \
      --dataset synthetic --class_total 8 --train_samples 64 \
      --n_epochs 2 --bs 8 --network r2plus1d_18
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from zeroshotvideoclassification_tpu.config import Config, config_from_args
from zeroshotvideoclassification_tpu.data.datasets import VideoTable, build_datasets
from zeroshotvideoclassification_tpu.data.pipeline import (
    HostPipeline,
    device_batch,
    device_batch_global,
)
from zeroshotvideoclassification_tpu.eval.zeroshot import (
    compute_accuracy,
    split_protocol,
)
from zeroshotvideoclassification_tpu.models import get_network
from zeroshotvideoclassification_tpu.parallel import (
    make_mesh,
    maybe_initialize,
    replicated,
    shard_table,
)
from zeroshotvideoclassification_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    multistep_lr,
    warm_start,
)
from zeroshotvideoclassification_tpu.train.optimizer import set_lr
from zeroshotvideoclassification_tpu.utils.logging import (
    MetricsLogger,
    Timer,
    colored,
)


def _dtype(config: Config):
    from zeroshotvideoclassification_tpu.config import compute_jnp_dtype

    return compute_jnp_dtype(config.compute_dtype)


def _transform_dtype(config: Config):
    """Fused-transform output dtype; 'auto' follows compute_dtype (bf16 out
    is bit-identical under bf16 compute — see Config.transform_dtype)."""
    from zeroshotvideoclassification_tpu.data.pipeline import (
        transform_out_dtype,
    )

    return transform_out_dtype(config)


def _find_latest_checkpoint(base: str):
    """Newest full-state checkpoint for --resume auto: last.npz (periodic)
    or checkpoint.npz (best-by-accuracy) under the base savename or any of
    its _N dedup dirs; None if the run never checkpointed. Ranked by the
    checkpoint's STORED epoch (read_meta), not filesystem mtime — mtime skews
    across hosts of a multi-host job, the stored epoch doesn't; last.npz wins
    epoch ties (it also carries optimizer state from the later save)."""
    import glob as _glob

    from zeroshotvideoclassification_tpu.train import read_meta

    candidates = []
    for d in [base] + sorted(_glob.glob(base + "_*")):
        for pref, name in enumerate(("checkpoint.npz", "last.npz")):
            p = os.path.join(d, name)
            if os.path.exists(p):
                try:
                    epoch = int(read_meta(p).get("epoch", -1))
                except Exception:
                    continue  # mid-write / corrupt file: not a candidate
                candidates.append((epoch, pref, p))
    return max(candidates)[2] if candidates else None


def eval_batch_size(global_bs: int, n_clips: int, n_data: int,
                    process_count: int, table_len: int,
                    clip_budget: int) -> int:
    """Videos per global eval dispatch.

    Starts from the reference's per-video batch scaled down by clips/video
    (dataset.py:75,131) — a GPU-memory-motivated scale-down — then floors the
    CLIP count per device at ``clip_budget``: the bf16 forward amortizes
    strongly with batch on TPU (measured 969 -> 1431 clips/s/chip from bs16
    to bs128, ROADMAP "serving batch scaling") and eval numerics are
    per-sample (running-stat BN), so a bigger batch only changes the
    zero-weight tail padding. Rounded up to a multiple of
    lcm(n_data, process_count) so batches both shard evenly over the 'data'
    mesh axis and split evenly across processes, then capped at the table
    size (same rounding) so tiny test sets don't dispatch mostly padding.

    clip_budget == 0 restores the reference batch sizing EXACTLY (no clip
    floor and no tiny-table cap — only the shard-divisibility rounding the
    static SPMD dispatch requires; padding rows are zero-weight either way).
    """
    n_clips = max(n_clips, 1)
    bs = max(global_bs // n_clips, 1)
    mult = n_data * process_count // np.gcd(n_data, process_count)
    if clip_budget == 0:
        return ((bs + mult - 1) // mult) * mult
    want_clips = clip_budget * n_data
    bs = max(bs, (want_clips + n_clips - 1) // n_clips)
    bs = ((bs + mult - 1) // mult) * mult
    return min(bs, ((table_len + mult - 1) // mult) * mult)


class Experiment:
    """Bundles model, state, steps, mesh, logging for one run."""

    def __init__(self, config: Config, datasets: Dict[str, List[VideoTable]]):
        self.config = config
        self.datasets = datasets
        self.mesh = make_mesh(config.mesh_shape, config.mesh_axes)
        n_data = self.mesh.shape.get("data", 1)
        self.global_bs = config.bs * n_data  # reference: bs * n_gpus (main.py:61-63)
        # multi-host: each process decodes/feeds only its slice of the global
        # batch (jax.make_array_from_process_local_data stitches them)
        pc = jax.process_count()
        if self.global_bs % pc:
            raise ValueError(
                f"global batch {self.global_bs} not divisible by "
                f"process_count {pc}; adjust --bs")
        self.local_bs = self.global_bs // pc
        train_tables = datasets.get("training") or []
        if (train_tables and train_tables[0].loader == "image"
                and config.class_total != 0):
            self._image_train_batch()  # fail at construction, not epoch 1
        self.model = get_network(config)
        self.optimizer = make_optimizer(config.lr)
        self.lr_at = multistep_lr(config.lr, config.n_epochs)
        self.dtype = _dtype(config)
        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.state = create_train_state(
            self.model, self.optimizer, jax.random.PRNGKey(config.seed))
        self.start_epoch = 0
        base = config.savename(n_data)
        if config.resume == "auto":
            # preemption recovery: pick up the newest full-state checkpoint
            # under this run's savename (incl. _N dedup dirs); fresh run if
            # none exists yet. Multi-host: process 0's choice is broadcast so
            # all hosts resume the SAME checkpoint (independent resolution
            # could diverge on per-host disks and hang the collectives)
            from zeroshotvideoclassification_tpu.parallel import (
                agree_from_process_zero,
            )

            found = agree_from_process_zero(_find_latest_checkpoint(base))
            config = dataclasses.replace(config, resume=found)
            self.config = config
            print(f"RESUME auto: {found or 'no checkpoint found, fresh run'}")
        if config.resume:
            from zeroshotvideoclassification_tpu.train import load_checkpoint

            self.state, meta = load_checkpoint(config.resume, self.state)
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.best_acc_init = float(meta.get("accuracy", 0.0))
            print(f"RESUMED: {config.resume} at epoch {self.start_epoch}")
        if config.evaluate:
            # --evaluate auto-points at the run's best checkpoint and logs to
            # an evaluation/ subdir (reference main.py:102-104, fixed path
            # construction — quirk #14)
            from zeroshotvideoclassification_tpu.train import load_checkpoint

            ckpt = (config.weights if config.weights
                    and config.weights != "none"
                    else os.path.join(base, "checkpoint.npz"))
            if os.path.exists(ckpt):
                # eval only needs weights + BN stats; tolerate optimizer-state
                # layout drift across framework versions
                self.state, meta = load_checkpoint(
                    ckpt, self.state,
                    strict_sections=("params", "model_state"))
                print(f"LOADED CHECKPOINT: {ckpt} "
                      f"(epoch {meta.get('epoch')}, acc {meta.get('accuracy')})")
            else:
                print(f"WARNING: no checkpoint at {ckpt}; evaluating fresh init")
            self.savename = os.path.join(base, "evaluation")
        elif config.resume:
            self.savename = os.path.dirname(config.resume) or base
        else:
            if config.weights and config.weights != "none":
                params, mstate, n = warm_start(
                    config.weights, self.state.params, self.state.model_state,
                    network=config.network, head=config.head)
                self.state = dataclasses.replace(
                    self.state, params=params, model_state=mstate)
                print(f"LOADED MODEL: {config.weights} ({n} tensors)")
            elif not config.nopretrained:
                self._warm_start_pretrained()
            # de-dup the experiment dir with a _N suffix (main.py:94-97)
            self.savename, count = base, 1
            while os.path.exists(self.savename):
                self.savename = base + f"_{count}"
                count += 1
        # tensor-parallel placement: with a 'model' mesh axis (--tp N) the
        # head fc1/fc2 weights AND their Adam moments are committed to their
        # column/row shards here (state_shardings path rule); pure-DP meshes
        # degenerate to fully replicated. jit then propagates these committed
        # input shardings (GSPMD) — no in_shardings needed on the step.
        from zeroshotvideoclassification_tpu.parallel import (
            state_shardings,
            sync_processes,
        )

        # this device_put is the job's FIRST device collective (it opens the
        # communicator for the mesh clique); align hosts first so startup
        # skew (imports, init jit, dataset builds) cannot eat the
        # communicator's connect window
        sync_processes("init_placement")
        self.state = jax.device_put(
            self.state, state_shardings(self.state, self.mesh))
        self.train_step = make_train_step(
            self.model, self.optimizer, compute_dtype=self.dtype)
        self.scan_train_step = None
        if config.steps_per_call > 1:
            from zeroshotvideoclassification_tpu.train import (
                make_scan_train_step,
            )

            self.scan_train_step = make_scan_train_step(
                self.model, self.optimizer, compute_dtype=self.dtype)
        self.eval_step = make_eval_step(self.model, compute_dtype=self.dtype)
        os.makedirs(self.savename, exist_ok=True)
        # single-writer hygiene: metrics/CSV/TB artifacts are written by
        # process 0 only (every process computes them redundantly)
        self.log = MetricsLogger(self.savename,
                                 write=jax.process_index() == 0)
        self._ckpt = None  # lazy AsyncCheckpointer (process 0 only)
        self.best_acc = getattr(self, "best_acc_init", 0.0)

    def _ckpt_writer(self):
        """Lazy per-run AsyncCheckpointer: writes run on a single ordered
        thread so the next epoch's steps overlap checkpoint disk IO."""
        if self._ckpt is None:
            from zeroshotvideoclassification_tpu.train.async_ckpt import (
                AsyncCheckpointer,
            )

            self._ckpt = AsyncCheckpointer()
        return self._ckpt

    # -------------------------------------------------------- pretrained ----
    def _warm_start_pretrained(self) -> None:
        """--nopretrained made real (reference quirk #3: its flag could never
        be True, so backbones were silently always random). When NOT set, the
        trainer auto-loads a ported pretrained backbone — the analog of the
        reference's pretrained=True torchvision constructors
        (/root/reference/resnet.py:284-362) and C3D's ./assets/c3d.pickle load
        (/root/reference/network.py:129-130)."""
        cfg = self.config
        candidates = [
            os.path.join(cfg.pretrained_dir, f"{cfg.network}.npz"),
            os.path.join(cfg.pretrained_dir, f"{cfg.network}.pth"),
            os.path.join(cfg.pretrained_dir, f"{cfg.network}.pth.tar"),
        ]
        if "c3d" in cfg.network:
            candidates.append("./assets/c3d.pickle")  # reference's exact path
        for path in candidates:
            if os.path.exists(path):
                params, mstate, n = warm_start(
                    path, self.state.params, self.state.model_state,
                    network=cfg.network, head=cfg.head)
                self.state = dataclasses.replace(
                    self.state, params=params, model_state=mstate)
                print(f"PRETRAINED: loaded {n} tensors from {path}")
                return
        print(f"WARNING: no pretrained asset for {cfg.network!r} under "
              f"{cfg.pretrained_dir!r} — training from random init "
              f"(tools/port_checkpoint.py ports torchvision/.pickle weights; "
              f"pass --nopretrained to silence this)")

    # ------------------------------------------------------------- train ----
    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.config
        table = self.datasets["training"][0]
        global_bs, local_bs = self.global_bs, self.local_bs
        if table.loader == "image" and cfg.class_total != 0:
            global_bs, local_bs = self._image_train_batch()
        # each process pipelines only its lockstep-padded table shard
        # (identity when single-process)
        pipe = HostPipeline(shard_table(table), cfg, local_bs,
                            seed=cfg.seed + epoch)
        class_embed = jax.device_put(table.class_embed, replicated(self.mesh))
        new_opt = set_lr(self.state.opt_state, self.lr_at(epoch))
        self.state = dataclasses.replace(self.state, opt_state=new_opt)

        batch_t, model_t = Timer(), Timer()
        losses, accs = [], []
        rng = jax.random.PRNGKey((cfg.seed << 16) + epoch)
        it = iter(pipe)
        if cfg.progressbar:
            try:
                from tqdm import tqdm

                it = iter(tqdm(pipe, total=len(pipe),
                               desc=f"Epoch {epoch} Training..."))
            except ImportError:
                pass
        i = 0
        spc = max(cfg.steps_per_call, 1)
        pending = []  # device batches awaiting a fused scan dispatch
        last_logged = 0

        def single_step(batch):
            nonlocal rng
            rng, step_rng = jax.random.split(rng)
            self.state, metrics = self.train_step(
                self.state, batch["x"], batch["z"], batch["label"],
                batch["weight"], class_embed, step_rng)
            losses.append(metrics["loss"])
            accs.append(metrics["train_accuracy"])

        def flush_pending():
            nonlocal rng
            if not pending:
                return
            if len(pending) < spc or self.scan_train_step is None:
                # partial tail group: drain through the already-compiled
                # single-step path (a scan of a different length would force
                # a whole extra XLA compile)
                for b in pending:
                    single_step(b)
            else:
                stacked = {
                    k: jnp.stack([b[k] for b in pending])
                    for k in ("x", "z", "label", "weight")
                }
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = self.scan_train_step(
                    self.state, stacked["x"], stacked["z"], stacked["label"],
                    stacked["weight"], class_embed, step_rng)
                losses.extend(list(metrics["loss"]))
                accs.extend(list(metrics["train_accuracy"]))
            pending.clear()

        def maybe_log():
            # count-based, so fused multi-step dispatch keeps the same
            # log cadence as single-step
            nonlocal last_logged
            if len(losses) - last_logged >= cfg.log_every:
                step = int(jax.device_get(self.state.step))
                self.log.scalar("Train/Loss", float(losses[-1]), step)
                # tag parity with main_02.py:338 (there embed_loss == loss;
                # the GAN/caption losses it distinguished are dead code)
                self.log.scalar("Train/EmbeddingLoss", float(losses[-1]), step)
                self.log.scalar("Train/RegressorAccuracy", float(accs[-1]), step)
                last_logged = len(losses)

        sample_saved = not cfg.save_samples
        first_dispatch = True
        while True:
            with batch_t:
                host = next(it, None)
            if host is None:
                break
            if first_dispatch:
                # align hosts before this epoch's FIRST step dispatch: its
                # execution lazily opens fresh device communicators
                # (per-executable), and host-side decode-time variance could
                # otherwise exceed their connect window (no-op single-host)
                from zeroshotvideoclassification_tpu.parallel import (
                    sync_processes,
                )

                sync_processes(f"train_dispatch_{epoch}")
                first_dispatch = False
            with model_t:
                if not sample_saved and jax.process_index() == 0:
                    # debug GIF of the first clip, as the reference intended
                    # (main.py:159-163, commented there); rendered from the
                    # LOCAL host batch (global arrays may not be addressable
                    # on this process under multi-host)
                    try:
                        from zeroshotvideoclassification_tpu.utils.gif import (
                            batch2gif,
                        )

                        local = device_batch(host, table.n_clips,
                                             cfg.clip_len)
                        sdir = os.path.join(self.savename, "samples")
                        os.makedirs(sdir, exist_ok=True)
                        batch2gif(
                            np.asarray(local["x"][0, 0]),
                            int(host.label[0]),
                            os.path.join(
                                sdir, f"samples_train_epoch{epoch}_"),
                            classes=(table.classes if host.label[0] >= 0
                                     else None),
                            # SUN image batches normalize with Kinetics
                            # mean/std, not the video chain — inverting
                            # with the wrong mode dumps clipped garbage
                            mode=("meanstd" if host.image_mode
                                  else "active"))
                    except Exception as e:  # noqa: BLE001
                        # a debug dump must not kill the training run —
                        # not for a missing imageio extra, and not for a
                        # full disk / missing GIF backend / bad frame either
                        print(f"WARNING: --save_samples skipped "
                              f"({type(e).__name__}: {e})", file=sys.stderr)
                    sample_saved = True
                sharded = device_batch_global(
                    self.mesh, host, table.n_clips, cfg.clip_len,
                    out_dtype=_transform_dtype(cfg))
                if spc > 1 and self.scan_train_step is not None:
                    pending.append(sharded)
                    if len(pending) == spc:
                        flush_pending()
                else:
                    single_step(sharded)
            maybe_log()
            i += 1
            if i * global_bs > cfg.epoch_sample_cap:  # main.py:208
                break
        with model_t:
            flush_pending()
        maybe_log()
        loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        acc = float(np.mean([float(a) for a in accs])) if accs else 0.0
        clips = i * global_bs * table.n_clips
        total_t = batch_t.total + model_t.total
        print(colored(f"Train Accuracy: regressor {acc:2.1f}%", "red"))
        print(
            "TOTAL time for: load the batch %.2f sec, run the model %.2f sec, "
            "train %.2f min | %.1f clips/sec"
            % (batch_t.total, model_t.total, total_t / 60,
               clips / max(total_t, 1e-9)))
        return {"loss": loss, "train_accuracy": acc,
                "clips_per_sec": clips / max(total_t, 1e-9)}

    def _image_train_batch(self):
        """(global_bs, local_bs) of the halved SUN image-train batch.

        The reference halves the image-train batch (dataset.py:26:
        `opt.bs // 2 if ... 'image' in opt.dataset ...`) — each SUN sample
        inflates to n_clips*clip_len synthetic frames, so memory per sample
        doubles vs a video clip; halved here at per-device granularity
        (shardability), same intent. Validated once at __init__: the halved
        batch must also shard evenly across processes, else local_bs
        silently truncates to 0 or uneven per-process shards break
        global-array stitching."""
        global_bs = max(self.config.bs // 2, 1) * self.mesh.shape.get(
            "data", 1)
        pc = jax.process_count()
        if global_bs % pc:
            raise ValueError(
                f"halved image-train global batch {global_bs} not "
                f"divisible by process_count {pc}; adjust --bs")
        return global_bs, global_bs // pc

    # -------------------------------------------------------------- eval ----
    def evaluate(self, table: VideoTable, epoch: int) -> Dict[str, float]:
        cfg = self.config
        n_data = self.mesh.shape.get("data", 1)
        pc = jax.process_count()
        eval_bs = eval_batch_size(self.global_bs, table.n_clips, n_data, pc,
                                  len(table), cfg.eval_clip_budget)
        pipe = HostPipeline(shard_table(table), cfg, eval_bs // pc,
                            seed=cfg.seed)
        from zeroshotvideoclassification_tpu.eval import extract_embeddings

        source = pipe
        if cfg.progressbar:
            try:
                from tqdm import tqdm

                source = tqdm(pipe, total=len(pipe),
                              desc="Extracting features...")
            except ImportError:
                pass
        batches = (device_batch_global(self.mesh, h, table.n_clips,
                                       cfg.clip_len,
                                       out_dtype=_transform_dtype(cfg))
                   for h in source)
        pred, true_e, true_l = extract_embeddings(
            self.eval_step, self.state.params, self.state.model_state, batches,
            sync_tag=f"eval_dispatch_{table.name}_{epoch}")
        acc, acc5 = compute_accuracy(pred, table.class_embed, true_e)
        self.log.scalar(f"{table.name}/Accuracy", acc, epoch)
        self.log.scalar(f"{table.name}/Accuracy_Top5", acc5, epoch)
        self.log.csv_append(f"{table.name}_accuracy.csv",
                            "%d, %.1f,%.1f" % (epoch, acc, acc5))
        res = f"{table.name.upper()} Epoch {epoch}: Test accuracy: {acc:2.1f}%."
        out = {"accuracy": acc, "accuracy_top5": acc5}
        # Declared parity deviation: the reference runs the 10-seeded
        # half-class split protocol unconditionally (/root/reference/
        # main.py:278). With <4 classes a "half split" is 1 class (top-1
        # accuracy is trivially 100%) and top-5 is meaningless, so tiny
        # smoke/fixture runs skip it; any real dataset (51+ classes) takes
        # the reference path.
        if cfg.split == -1 and len(table.classes) >= 4:
            sp = split_protocol(pred, table.class_embed, true_l, true_e)
            out.update(sp)
            self.log.scalar(f"{table.name}/AccSplit_Mean",
                            sp["accuracy_split_mean"], epoch)
            self.log.scalar(f"{table.name}/AccSplit_Std",
                            sp["accuracy_split_std"], epoch)
            self.log.scalar(f"{table.name}/AccSplit_Mean_Top5",
                            sp["accuracy_split_top5_mean"], epoch)
            self.log.csv_append(
                f"{table.name}_accuracy_splits.csv",
                "%d, %.1f,%.1f,%.1f,%.1f" % (
                    epoch, sp["accuracy_split_mean"], sp["accuracy_split_std"],
                    sp["accuracy_split_top5_mean"], sp["accuracy_split_top5_std"]))
            res += " -- Split accuracy %2.1f%% (+-%.1f) on %d classes" % (
                sp["accuracy_split_mean"], sp["accuracy_split_std"],
                sp["n_split_classes"])
        print(colored(res, "green"))
        return out

    # --------------------------------------------------------------- loop ---
    def run(self) -> Dict[str, float]:
        cfg = self.config
        trainsamples = (len(self.datasets["training"][0])
                        if self.datasets["training"] else 0)
        if (not cfg.evaluate and self.datasets["training"]
                and jax.process_index() == 0):
            # run-config stamp file (reference main.py:333-335); process 0
            # writes it once
            n_classes = len(self.datasets["training"][0].classes)
            stamp = os.path.join(
                self.savename, f"train_samples_{n_classes}_{trainsamples}.txt")
            with open(stamp, "w") as f:
                f.write(f"{n_classes}, {trainsamples}\n")
        epoch_times = []
        summary = {}
        for epoch in range(self.start_epoch, cfg.n_epochs):
            print(f"\n{cfg.network.upper()} {cfg.dataset.upper()} "
                  f"LR {self.lr_at(epoch)} BS {self.global_bs} "
                  f"CLIP_LEN {cfg.clip_len} N_CLIPS {cfg.n_clips} "
                  f"OVERLAP {cfg.class_overlap} SAMPLES {trainsamples}")
            t0 = time.time()
            if not cfg.evaluate and self.datasets["training"]:
                if cfg.profile_dir and epoch == self.start_epoch:
                    from zeroshotvideoclassification_tpu.utils.profiler import (
                        device_trace,
                    )

                    with device_trace(cfg.profile_dir):
                        summary.update(self.train_one_epoch(epoch))
                else:
                    summary.update(self.train_one_epoch(epoch))
            accuracies = []
            for table in self.datasets["testing"]:
                r = self.evaluate(table, epoch)
                accuracies.append(r["accuracy"])
                summary[f"{table.name}_accuracy"] = r["accuracy"]
            mean_acc = float(np.mean(accuracies)) if accuracies else 0.0
            improved = mean_acc > self.best_acc
            # --evaluate is read-only: without the gate an eval-only run
            # would fetch the full train state cross-host and write a
            # checkpoint.npz under /evaluation as a side effect (the
            # accuracy is still tracked/reported, just never written)
            save_best = improved and not cfg.evaluate
            save_last = (cfg.checkpoint_every and not cfg.evaluate
                         and (epoch + 1) % cfg.checkpoint_every == 0)
            if save_best or save_last:
                # materialize on ALL processes (fetch_global is a collective
                # when tensor-parallel shards span hosts), then write ONCE on
                # process 0 — redundant per-process writes on a shared
                # filesystem are atomic-but-racing wasted IO. The write
                # itself runs on the async checkpointer thread so the next
                # epoch's steps overlap the disk IO; atomicity (tmp +
                # os.replace) keeps concurrent readers safe.
                from zeroshotvideoclassification_tpu.parallel import (
                    fetch_global,
                )

                state_host = jax.tree.map(fetch_global, self.state)
            if save_best and jax.process_index() == 0:
                self._ckpt_writer().submit(
                    os.path.join(self.savename, "checkpoint.npz"),
                    state_host, epoch, mean_acc, cfg.to_json())
            if improved:
                self.best_acc = mean_acc
            if save_last and jax.process_index() == 0:
                # periodic full-state checkpoint for preemption recovery
                # (--resume auto); the reference's best-only policy loses
                # everything between accuracy improvements
                self._ckpt_writer().submit(
                    os.path.join(self.savename, "last.npz"),
                    state_host, epoch, self.best_acc, cfg.to_json())
            epoch_times.append(time.time() - t0)
            print("----- Epoch %d done in %.2f min. Best accuracy %.1f"
                  % (epoch, epoch_times[-1] / 60, self.best_acc))
            if cfg.evaluate:
                break
        summary["best_accuracy"] = self.best_acc
        if self._ckpt is not None:
            # drain pending writes before returning: callers (and --resume
            # auto of a follow-up job) read these files right after
            self._ckpt.close()
            self._ckpt = None
        self.log.close()
        return summary


def main(argv=None):
    # persistent compile cache BEFORE any backend use: restarted jobs
    # (--resume auto follow-ups, eval-only reruns) skip recompiles
    from zeroshotvideoclassification_tpu.utils.xla_tuning import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    # multi-host (DCN) process init first: jax.devices()/process_count must
    # reflect the full job before mesh construction (SURVEY §2.3)
    maybe_initialize()
    config = config_from_args(argv)
    wv_model = None
    if "synthetic" not in config.dataset:
        from zeroshotvideoclassification_tpu.text import load_word2vec

        wv_model = load_word2vec(config.word2vec_path, config.word2vec_cache)
    datasets = build_datasets(config, wv_model)
    exp = Experiment(config, datasets)
    return exp.run()


if __name__ == "__main__":
    main()
