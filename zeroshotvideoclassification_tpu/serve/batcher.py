"""Micro-batching request queue for the serving front-end.

The serving forward amortizes strongly with batch on TPU (measured
969 -> 1431 clips/s/chip from bs16 to bs128, ROADMAP "serving batch
scaling") and is compute-walled at large batch (PERF_ROOFLINE_EVAL.json) —
so a production endpoint must coalesce concurrent requests into one device
dispatch instead of dispatching per request. This module is the generic
half: callers submit items and block on a Future; a single worker thread
drains the queue into batches of at most `max_batch`, waiting at most
`max_wait_s` after the first item of a batch arrives (classic
max-batch/max-delay policy), and hands each batch to `process_batch`.

Device dispatch stays single-threaded by construction (one worker), which
both matches XLA's dispatch model and keeps compiled-shape reuse trivial:
`process_batch` pads to its static shape internally.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Deque, List, Sequence


class MicroBatcher:
    def __init__(
        self,
        process_batch: Callable[[Sequence], List],
        max_batch: int = 16,
        max_wait_s: float = 0.01,
    ):
        """`process_batch(items) -> results` (same length/order) runs on the
        worker thread; exceptions there fail every future of that batch."""
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.process_batch = process_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.n_requests = 0
        self.n_batches = 0
        # bounded: an always-on server would otherwise leak one int per batch
        self.batch_sizes: Deque[int] = collections.deque(maxlen=1000)
        self.batch_latency_s: Deque[float] = collections.deque(maxlen=1000)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, item) -> Future:
        if self._stop.is_set():
            raise RuntimeError("batcher is shut down")
        fut: Future = Future()
        self._q.put((item, fut, time.monotonic()))
        if self._stop.is_set():
            # shutdown() raced our put: its drain may already have finished,
            # and the worker exits once _stop is set — nothing will ever
            # collect this item, so drain-and-fail here (same semantics as
            # the shutdown drain; whichever side runs last sees the item)
            self._drain_pending()
        return fut

    def __call__(self, item):
        """Blocking convenience: submit + wait."""
        return self.submit(item).result()

    def _collect(self):
        """Block for the first item, then drain up to max_batch within the
        wait window."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # window closed: take only what is already queued
                try:
                    batch.append(self._q.get_nowait())
                    continue
                except queue.Empty:
                    break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            items = [it for it, _, _ in batch]
            futures = [f for _, f, _ in batch]
            submitted = [t for _, _, t in batch]
            self.n_requests += len(batch)
            self.n_batches += 1
            self.batch_sizes.append(len(batch))
            try:
                results = self.process_batch(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"process_batch returned {len(results)} results "
                        f"for {len(items)} items")
            except BaseException as e:
                for f in futures:
                    if not f.done():
                        f.set_exception(e)
                continue
            done = time.monotonic()
            for f, r, t in zip(futures, results, submitted):
                self.batch_latency_s.append(done - t)
                f.set_result(r)

    def _drain_pending(self):
        """Fail every future still sitting in the queue (post-stop only)."""
        while True:
            try:
                _, fut, _ = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("batcher shut down"))

    def shutdown(self, timeout: float = 5.0):
        """Stop the worker and fail any still-pending futures: items queued
        but never collected would otherwise block their request threads for
        the caller's full result timeout."""
        self._stop.set()
        self._worker.join(timeout=timeout)
        self._drain_pending()

    @staticmethod
    def _percentile(sorted_vals: List[float], q: float) -> float:
        if not sorted_vals:
            return 0.0
        i = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
        return sorted_vals[i]

    def stats(self) -> dict:
        sizes = list(self.batch_sizes)
        lat = sorted(self.batch_latency_s)
        return {
            "requests": self.n_requests,
            "batches": self.n_batches,
            "mean_batch": (sum(sizes) / len(sizes)) if sizes else 0.0,
            "max_batch_seen": max(sizes) if sizes else 0,
            # submit -> result, over the last <=1000 completed requests
            "latency_p50_ms": round(self._percentile(lat, 0.50) * 1e3, 3),
            "latency_p95_ms": round(self._percentile(lat, 0.95) * 1e3, 3),
            "latency_max_ms": round(lat[-1] * 1e3, 3) if lat else 0.0,
        }
