"""Tuned XLA:TPU compile options, shipped as framework defaults.

The committed roofline (PERF_ROOFLINE.json) localized the train step's
residual headroom INSIDE XLA's emitter (conv-backward fusions at 220-297
GB/s vs the 391 GB/s best-observed HBM rate; five losing hand-kernel
formulations on record in ROADMAP.md). The remaining program-level lever is
the compiler's own knobs: `jax.jit` accepts per-computation
`compiler_options`, so the framework can ship tuned flags with zero
model-code changes — the TPU analog of the reference pinning its cuDNN/torch
build in install.sh (/root/reference/install.sh:18,23-24).

Values are A/B-measured on hardware by scripts/ab_xla_flags.py (in-graph
K-step loops — the only honest timing on a relayed chip; results in
ROADMAP.md "Round-3: XLA compile-option sweep"). Winner: shrinking the
scoped-VMEM budget from the default to 32 MiB, which makes the fusion
emitter tile the big conv-backward fusions into smaller VMEM-resident
chunks — measured 62.5 -> 60.6 ms on the bs16 r2plus1d_18 train step
(+3.1% throughput); larger budgets (80-96 MiB) measured NEUTRAL-to-WORSE,
and the latency-hiding scheduler / LICM-cap flags measured neutral.

ZSVC_XLA_TUNING=0 disables; ZSVC_XLA_FLAGS='{"flag": "val", ...}' (JSON)
replaces the tuned set entirely. Off-TPU backends always get None (CPU/GPU
reject TPU flags).
"""

from __future__ import annotations

import json
import os
from typing import Optional

TUNED_TPU_TRAIN_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
}


def tpu_compiler_options() -> Optional[dict]:
    """The tuned compile-option dict for TPU-backed jits, or None.

    Safe to pass directly as `jax.jit(..., compiler_options=...)`: None is
    the no-op. Import of jax is deferred so pure-host tooling can import
    this module without initializing a backend.
    """
    if os.environ.get("ZSVC_XLA_TUNING", "1") == "0":
        return None
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    override = os.environ.get("ZSVC_XLA_FLAGS")
    if override:
        return dict(json.loads(override))
    return dict(TUNED_TPU_TRAIN_OPTIONS)
