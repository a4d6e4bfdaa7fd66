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
ROADMAP.md "Round-3: XLA compile-option sweep"). Both winners move the
scoped-VMEM budget, in opposite directions per program:

  * train step: 32 MiB — smaller fusion scratch makes the emitter tile the
    big bandwidth-bound conv-backward fusions into chunks whose HBM access
    pattern streams better; 62.5 -> 60.6 ms at bs16 (+3.1%). 80-96 MiB
    measured neutral-to-worse; LHS / LICM-cap flags neutral; conv
    input/output fusion toggles 1.08-1.77x WORSE.
  * serving forward: 64 MiB — the forward has no backward working set, so
    a LARGER budget lets the emitter keep deeper producer chains resident;
    91.1 -> 77.3 ms at bs128 (+17.9%, 1404 -> 1656 clips/s/chip). 80 MiB
    ties, 96 MiB regresses, 32 MiB gives up a third of the win.

ZSVC_XLA_TUNING=0 disables. ZSVC_XLA_FLAGS (JSON) replaces the tuned sets:
a flat dict ('{"flag": "val"}') applies to BOTH programs; a keyed dict
('{"train": {...}, "eval": {...}}') overrides per program (a missing key
keeps that program's shipped set). Off-TPU backends always get None
(CPU/GPU reject TPU flags).
"""

from __future__ import annotations

import json
import os
from typing import Optional

TUNED_TPU_TRAIN_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "32768",
}


def enable_persistent_cache(path: str = ".jax_cache") -> None:
    """Best-effort persistent XLA compilation cache for the CLI surfaces.

    Restarted jobs (--resume auto follow-ups, repeated serving launches,
    eval-only reruns) then skip recompilation of identical programs —
    minutes per shape on remote/tunneled TPU hosts. ZSVC_XLA_CACHE
    overrides the directory; '0' disables. No-op if the backend is already
    initialized past the point where the config can change (the cache then
    simply stays off for this process)."""
    env = os.environ.get("ZSVC_XLA_CACHE")
    if env == "0":
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", env or path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

TUNED_TPU_EVAL_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
}


def tpu_compiler_options(program: str = "train") -> Optional[dict]:
    """The tuned compile-option dict for TPU-backed jits, or None.

    `program` selects the tuned set: "train" (gradient step) or "eval"
    (inference forward). Safe to pass directly as
    `jax.jit(..., compiler_options=...)`: None is the no-op. Import of jax
    is deferred so pure-host tooling can import this module without
    initializing a backend.
    """
    if program not in ("train", "eval"):
        raise ValueError(f"unknown program {program!r}")
    if os.environ.get("ZSVC_XLA_TUNING", "1") == "0":
        return None
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    tuned = dict(TUNED_TPU_TRAIN_OPTIONS if program == "train"
                 else TUNED_TPU_EVAL_OPTIONS)
    override = os.environ.get("ZSVC_XLA_FLAGS")
    if override:
        parsed = json.loads(override)
        if any(isinstance(v, dict) for v in parsed.values()):
            # per-program form: {"train": {...}, "eval": {...}} — a missing
            # key keeps that program's shipped set
            sel = parsed.get(program)
            return dict(sel) if sel is not None else tuned
        return dict(parsed)
    return tuned
