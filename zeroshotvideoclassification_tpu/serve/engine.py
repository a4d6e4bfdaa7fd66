"""Inference engine: checkpoint + class names -> batched zero-shot scoring.

The device half of the serving front-end. One engine owns the model, the
scoring state and a small LADDER of compiled eval shapes
([bucket, n_clips, T, S, S, 3] for bucket in 8..max_batch, zero-weight
padded — the training pipeline's broken-sample convention): each dispatch
pads to the smallest bucket that fits, so a lone request costs a bs-8
forward (~16x fewer FLOPs than padding straight to the bs-128 amortization
knee) while saturated micro-batches still ride the knee shape. jit compiles
each bucket once on first use (persistent XLA cache across restarts; see
warmup()). Dispatches are SPMD over every local device — batches shard on a
'data' mesh axis, params replicate, bucket shapes tile the axis — so one
serving process drives a whole TPU slice the same way the driver's eval
path does. The host/device halves are split (pack_paths vs
dispatch_packed/classify_packed) so the batcher's two-stage pipeline can
decode the next batch (GIL-free native JPEG/libav decoders) while the
device runs the current one.

The reference has no serving story at all — its user journey ends at
dataset-level evaluation (/root/reference/main.py:224-325); cli/infer.py
packages one-shot classification, and this engine is the always-on version
with request coalescing (the forward amortizes 969 -> 1431 clips/s/chip
from bs16 to bs128; ROADMAP "serving batch scaling").
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np


class InferenceEngine:
    def __init__(
        self,
        class_names: Sequence[str],
        class_embed: np.ndarray,
        network: str = "r2plus1d_18",
        head: str = "mlp",
        weights: Optional[str] = None,
        n_clips: int = 4,
        clip_len: int = 16,
        size: int = 112,
        max_batch: int = 128,
        compute_dtype: str = "bfloat16",
        top_k: int = 5,
        decode_scale: int = 1,
    ):
        # max_batch defaults to the measured amortization knee: the serving
        # forward runs 916 -> 1653 clips/s/chip from bs16 to bs128 on v5e
        # (ROADMAP "serving batch curve under the 64 MiB flag"); below the
        # knee each dispatch pays un-amortized per-step overhead.
        import jax

        from zeroshotvideoclassification_tpu.cli.infer import (
            build_scoring_state,
        )
        from zeroshotvideoclassification_tpu.config import Config
        from zeroshotvideoclassification_tpu.parallel import (
            make_mesh,
            replicated,
        )

        import jax.numpy as jnp

        self.class_names = list(class_names)
        self.class_embed = np.asarray(class_embed, np.float32)
        # device-resident copy for the ranking matmul — passing the numpy
        # array to the jitted cosine_distances would re-upload [C, 300]
        # floats on every request
        self._class_embed_dev = jnp.asarray(self.class_embed)
        self.top_k = min(top_k, len(self.class_names))
        self.max_batch = max_batch
        # SPMD over every local device, exactly like the driver's eval path:
        # batches shard on 'data', params replicate, XLA partitions the
        # forward. A 1-chip mesh degenerates to the single-device program.
        self.mesh = make_mesh((-1,), ("data",))
        self.n_shards = self.mesh.shape["data"]

        def _fit(b):  # bucket shapes must tile the data axis
            return -(-b // self.n_shards) * self.n_shards

        # dispatch-shape ladder: smallest bucket >= n wins. Covers the
        # latency/throughput corner pair — single-clip requests avoid the
        # knee shape's padding FLOPs, saturated batches still amortize.
        self.batch_buckets = sorted(
            {_fit(b) for b in (8, 16, 32, 64) if b < max_batch}
            | {_fit(max_batch)})
        self.bucket_dispatches = {b: 0 for b in self.batch_buckets}
        self.config = Config(network=network, head=head, bs=max_batch,
                             clip_len=clip_len, size=size, n_clips=n_clips,
                             compute_dtype=compute_dtype,
                             decode_scale=decode_scale)
        self.model, state, self.eval_step = build_scoring_state(
            network, head, weights, self.config)
        # Serving never touches the optimizer: keep ONLY (params,
        # model_state) on device — a full TrainState would pin Adam's m/v
        # moments (~2x the param bytes) per device for the server's life.
        # ONE attribute holds (weights_path, params, model_state) so a
        # concurrent reload() swap is atomic: a dispatch that read the
        # tuple finishes wholly on the old checkpoint, never a mix.
        self._scoring = (weights, *jax.device_put(
            (state.params, state.model_state), replicated(self.mesh)))
        # one persistent decode pool for the engine's life: pack_paths
        # builds a single-batch HostPipeline per request, which would
        # otherwise spawn + join ~cpu_count decoder threads every
        # micro-batch on a production host
        import concurrent.futures as cf
        import os

        self._decode_pool = cf.ThreadPoolExecutor(
            max_workers=self.config.decode_workers or (os.cpu_count() or 1))
        # counters have multiple writer threads (an engine may back several
        # services / concurrent embed_paths callers): unsynchronized += on
        # them loses increments and corrupts what /stats exists to report
        import threading

        self._stats_lock = threading.Lock()
        self._warmup_active = False
        self.n_dispatches = 0
        self.device_seconds = 0.0

    @property
    def weights_path(self):
        return self._scoring[0]

    def close(self):
        """Shut down the persistent decode pool (its workers are non-daemon
        threads, so an engine that is created and dropped repeatedly — test
        suites, notebooks — would otherwise leak ~cpu_count threads per
        instance until interpreter exit). Idempotent; the engine must not
        be used afterwards."""
        self._decode_pool.shutdown(wait=True, cancel_futures=True)

    # ------------------------------------------------------------- embed ----
    def pack_paths(self, paths: Sequence[str]):
        """HOST half: decode + pack ONE padded host batch (no device work).

        One table with the per-path 'auto' decoder -> ONE padded batch at
        the smallest ladder shape that fits, regardless of how many loader
        kinds the request mixes (a frame-dir + .mp4 + .npy request used to
        cost three max_batch-padded forwards). Runs on the batcher's
        stage-1 worker so the next batch decodes while the device runs
        this one (serve/batcher.py pipelining)."""
        from zeroshotvideoclassification_tpu.data.datasets import VideoTable
        from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline

        n = len(paths)
        if n == 0:  # HostPipeline yields no batches for an empty table
            return {"paths": [], "n": 0, "bucket": None, "hb": None}
        if n > self.max_batch:
            raise ValueError(f"{n} paths > max_batch {self.max_batch}")
        bucket = next(b for b in self.batch_buckets if n <= b)
        table = VideoTable(
            name="serve", fnames=np.asarray(list(paths), object),
            label_idx=np.zeros(n, np.int32),
            classes=self.class_names, class_embed=self.class_embed,
            loader="auto", is_validation=True,
            n_clips=self.config.n_clips)
        # ONE padded batch at the bucket's static shape (prefetch off:
        # a single batch has nothing to overlap)
        cfg = self.config.replace(prefetch_depth=0)
        hb = next(iter(HostPipeline(table, cfg, bucket, seed=0,
                                    pool=self._decode_pool)))
        return {"paths": list(paths), "n": n, "bucket": bucket, "hb": hb}

    def dispatch_packed(self, packed):
        """DEVICE half: sharded transform + forward -> (emb [n,300], ok [n])."""
        import jax

        from zeroshotvideoclassification_tpu.data.pipeline import (
            device_batch_global,
            transform_out_dtype,
        )

        n = packed["n"]
        if n == 0:
            return (np.zeros((0, self.class_embed.shape[1]), np.float32),
                    np.zeros((0,), bool))
        batch = device_batch_global(
            self.mesh, packed["hb"], self.config.n_clips,
            self.config.clip_len, out_dtype=transform_out_dtype(self.config))
        # single read of the live-scoring tuple (see __init__/reload): the
        # params and BN stats of one dispatch always come from the SAME
        # checkpoint even if reload() swaps mid-flight
        _, params, model_state = self._scoring
        t0 = time.perf_counter()
        out = self.eval_step(params, model_state, batch["x"])
        out = np.asarray(jax.device_get(out))
        if not self._warmup_active:  # warmup dispatches stay out of /stats
            with self._stats_lock:
                self.device_seconds += time.perf_counter() - t0
                self.n_dispatches += 1
                self.bucket_dispatches[packed["bucket"]] += 1
        # decode success is a HOST fact (weight-0 convention is set at pack
        # time and passes through the device untouched) — reading it from
        # the host batch saves a device fetch per dispatch
        w = np.asarray(packed["hb"].weight)
        return out[:n].astype(np.float32), w[:n] > 0

    def embed_paths(self, paths: Sequence[str]):
        """paths (<= max_batch, loader kinds freely mixed) ->
        (emb [n, 300], ok [n]); pack_paths + dispatch_packed in one call."""
        return self.dispatch_packed(self.pack_paths(paths))

    # ------------------------------------------------------------ reload ----
    def reload(self, weights: str) -> dict:
        """Hot-swap the scoring state from a checkpoint without restarting.

        STRICT full-framework-checkpoint loads only (every params +
        model_state tensor present with matching shape, else ValueError):
        a live hot-swap endpoint must never end up serving a partially or
        fully random-init model, so the startup path's partial warm-start
        fallback (build_scoring_state) is deliberately NOT offered here —
        port foreign weights offline (tools/port_checkpoint.py), then
        reload the resulting checkpoint.

        The compiled ladder keys on shapes, not values, so the swap costs
        one checkpoint load + device_put: no recompile, no downtime. The
        single-tuple assignment is atomic under the GIL — an in-flight
        dispatch finishes wholly on the old checkpoint; the next one sees
        the new one (see dispatch_packed)."""
        import jax

        from zeroshotvideoclassification_tpu.parallel import replicated
        from zeroshotvideoclassification_tpu.train import (
            create_train_state,
            load_checkpoint,
            make_optimizer,
        )

        if not weights or weights == "none":
            raise ValueError(
                "reload needs a checkpoint path (refusing to swap the "
                "serving model to random-init weights)")
        # abstract template for the strict load's structure: eval_shape
        # traces create_train_state without running it, so a reload never
        # pays the model.init forward (an XLA compile on first use) or its
        # transient device allocations — the checkpoint supplies every
        # (params, model_state) value; the untouched opt_state leaves stay
        # abstract and are discarded
        template = jax.eval_shape(
            lambda rng: create_train_state(
                self.model, make_optimizer(self.config.lr), rng),
            jax.random.PRNGKey(0))
        state, meta = load_checkpoint(
            weights, template, strict_sections=("params", "model_state"),
            load_sections=("params", "model_state"))
        scoring = jax.device_put((state.params, state.model_state),
                                 replicated(self.mesh))
        self._scoring = (weights, *scoring)
        return {"reloaded": weights,
                "epoch": meta.get("epoch"),
                "accuracy": meta.get("accuracy")}

    # ------------------------------------------------------------ warmup ----
    def warmup(self):
        """Compile the whole dispatch ladder up front.

        Without this, each bucket XLA-compiles on its first live request —
        a cold deployment's first saturated burst stalls every coalesced
        request behind a full compile. Nonexistent paths ride the decode-
        failure (weight-0 padding) convention, so each bucket shape runs
        the real pack -> transform -> forward program with no assets.
        Warmup dispatches are excluded from the stats counters via a flag
        consulted at count time (a snapshot/restore would lose the counts
        of live requests racing a warm-up, and would leak partial warmup
        counts if a bucket's compile raised)."""
        self._warmup_active = True
        try:
            for b in self.batch_buckets:
                # a bucket can exceed max_batch (the ladder rounds up to
                # tile the mesh); cap the fill — smallest-fit still selects
                # bucket b. classify (not embed_paths) so the bucket-padded
                # ranking matmul compiles here too, not on the first live
                # request.
                self.classify(["/nonexistent/__warmup__.npy"]
                              * min(b, self.max_batch))
        finally:
            self._warmup_active = False

    # ----------------------------------------------------------- classify ---
    def classify_packed(self, packed) -> List[dict]:
        """DEVICE half of classify (stage 2 in the pipelined batcher)."""
        emb, ok = self.dispatch_packed(packed)
        return self._rank(packed["paths"], emb, ok)

    def classify(self, paths: Sequence[str]) -> List[dict]:
        """-> one result dict per path (cli/infer.py response schema)."""
        emb, ok = self.embed_paths(paths)
        return self._rank(paths, emb, ok)

    def _rank(self, paths, emb, ok) -> List[dict]:
        import jax
        import jax.numpy as jnp

        from zeroshotvideoclassification_tpu.ops.cdist import (
            cosine_distances,
        )

        n = emb.shape[0]
        if n == 0:
            return []
        # pad the ranking matmul to the dispatch ladder too: cosine_distances
        # is jitted, so an un-padded [n, D] input would compile once per
        # DISTINCT request size (up to max_batch tiny programs, each paying
        # the first-compile price on a fresh deployment). Rows are
        # independent; the zero padding is sliced off before ranking.
        pad_to = next((b for b in self.batch_buckets if n <= b),
                      self.batch_buckets[-1])
        emb_in = emb
        if pad_to > n:
            emb_in = np.zeros((pad_to, emb.shape[1]), emb.dtype)
            emb_in[:n] = emb
        dist = np.asarray(jax.device_get(cosine_distances(
            jnp.asarray(emb_in), self._class_embed_dev)))[:n]
        rank = np.argsort(dist, axis=1)
        results = []
        for i, path in enumerate(paths):
            if not ok[i]:
                results.append({"video": path, "error": "decode failed"})
                continue
            results.append({
                "video": path,
                "top_class": self.class_names[int(rank[i, 0])],
                "topk": [
                    {"class": self.class_names[int(c)],
                     "similarity": round(float(1.0 - dist[i, c]), 6)}
                    for c in rank[i, : self.top_k]
                ],
            })
        return results

    def stats(self) -> dict:
        with self._stats_lock:  # one consistent snapshot across counters
            return {
                "dispatches": self.n_dispatches,
                "device_seconds": round(self.device_seconds, 3),
                "max_batch": self.max_batch,
                "data_shards": self.n_shards,
                "batch_buckets": {str(b): c
                                  for b, c in self.bucket_dispatches.items()},
                "classes": len(self.class_names),
                "weights": self.weights_path,
            }
