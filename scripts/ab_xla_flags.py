"""A/B sweep of XLA:TPU compile options on the full train step.

The committed roofline (PERF_ROOFLINE.json) shows the residual single-chip
headroom lives INSIDE XLA's emitter: the big conv-backward fusions run at
220-297 GB/s vs the 391 GB/s best-observed HBM rate, and the C=3 stem pair is
layout-capped (five losing hand-kernel formulations on record, ROADMAP). The
remaining program-level lever is the compiler's own knobs: `jax.jit` accepts
per-computation `compiler_options`, so a framework can ship tuned XLA flags
with zero model-code changes.

This script times the SAME K-step in-graph loop as bench.py (the only honest
timing on the axon relay) under each candidate option set and prints a
ranked table vs the no-flags baseline. Candidates are public XLA:TPU flags
seen in open JAX/T5X/MaxText configs; anything the compiler rejects is
reported as REJECTED and skipped.

Usage:
  python scripts/ab_xla_flags.py [--bs 16] [--steps 20]        # train step
  python scripts/ab_xla_flags.py --mode eval --bs 128          # serving fwd
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = [
    # label, {flag: value}
    ("baseline", {}),
    # scoped vmem: larger scratch lets the fusion emitter keep deeper
    # producer chains resident (default ~16M on v5e; MaxText ships 98304)
    ("vmem_16m", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
    ("vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("vmem32_lhs", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                    "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # round-3 second axis: emitter/fusion toggles stacked on the 32M winner,
    # aimed at the conv-backward reduce fusions still at af 0.70-0.89
    ("vmem32_norwb", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                      "xla_tpu_rwb_fusion": "false"}),
    ("vmem32_licm", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                     "xla_tpu_licm_size_inflation_ratio": "1"}),
    ("vmem32_noconvin", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                         "xla_jf_conv_input_fusion": "false"}),
    ("vmem32_noconvout", {"xla_tpu_scoped_vmem_limit_kib": "32768",
                          "xla_jf_conv_output_fusion": "false"}),
    ("vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_80m", {"xla_tpu_scoped_vmem_limit_kib": "81920"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem64_lhs", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                    "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # latency-hiding scheduler (MaxText default-on; mostly helps overlap,
    # may reorder fusions enough to change HBM access patterns)
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem96_lhs", {"xla_tpu_scoped_vmem_limit_kib": "98304",
                    "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # loop-invariant code motion inflation cap (MaxText perf recipe)
    ("licm", {"xla_tpu_licm_size_inflation_ratio": "1"}),
]


def build_eval_step(bs, clip_len, size, steps, compiler_options):
    """Serving-forward variant (bench.py run_eval_bench's program) so the
    flag axis can be adjudicated for inference too."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network

    config = Config(network="r2plus1d_18", head="mlp", bs=bs)
    model = get_network(config)
    # no optimizer: Adam moments would hold ~2x params of dead HBM during
    # the large-batch sweep and could turn a viable candidate into an OOM
    params, model_state = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(
        -0.5, 0, (bs, 1, clip_len, size, size, 3)).astype(np.float32))

    def multi(params, state, x):
        def body(i, acc):
            emb, _ = model.apply(params, state,
                                 x + (acc * 0).astype(x.dtype), train=False,
                                 compute_dtype=jnp.bfloat16)
            return acc + emb[0, 0]
        return jax.lax.fori_loop(0, steps, body, jnp.zeros(()))

    jitted = jax.jit(multi, compiler_options=compiler_options or None)
    return (lambda s=None: jitted(params, model_state, x)), None


def build_step(bs, clip_len, size, steps, compiler_options):
    # mirrors bench.py:run_bench / scripts/ab_optimizer_guard.py:build —
    # keep the three in sync so A/Bs time the shipped program
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.train import (
        create_train_state, make_optimizer)
    from zeroshotvideoclassification_tpu.train.step import (
        TrainState, masked_mse)

    config = Config(network="r2plus1d_18", head="mlp", bs=bs)
    model = get_network(config)
    optimizer = make_optimizer(config.lr)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(
        -0.5, 0, (bs, 1, clip_len, size, size, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(bs, 300)).astype(np.float32))
    w = jnp.ones((bs,), jnp.float32)

    def one_step(ts):
        def loss_fn(p):
            emb, ns = model.apply(p, ts.model_state, x, train=True,
                                  compute_dtype=jnp.bfloat16)
            return masked_mse(emb, z, w), ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        return TrainState(
            optax.apply_updates(ts.params, updates), ns, opt_state,
            ts.step + 1)

    def multi(ts):
        return jax.lax.fori_loop(0, steps, lambda i, t: one_step(t), ts)

    jitted = jax.jit(multi, compiler_options=compiler_options or None)
    return jitted, ts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3,
                   help="timed repetitions; best-of is reported")
    p.add_argument("--only", default=None,
                   help="comma-separated candidate labels to run")
    p.add_argument("--mode", default="train", choices=["train", "eval"],
                   help="program to time: train step or serving forward")
    args = p.parse_args()

    import jax

    results = []
    only = set(args.only.split(",")) if args.only else None
    for label, opts in CANDIDATES:
        if only and label not in only:
            continue
        try:
            t_build = time.perf_counter()
            if args.mode == "eval":
                fn, _ = build_eval_step(args.bs, args.clip_len, args.size,
                                        args.steps, opts)
                float(jax.device_get(fn()))  # compile + warm-up
            else:
                jitted, ts0 = build_step(args.bs, args.clip_len, args.size,
                                         args.steps, opts)
                ts = jitted(ts0)
                float(jax.device_get(ts.step))  # compile + warm-up
            compile_s = time.perf_counter() - t_build
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                if args.mode == "eval":
                    float(jax.device_get(fn()))
                else:
                    ts = jitted(ts)
                    float(jax.device_get(ts.step))
                best = min(best, (time.perf_counter() - t0) / args.steps)
            clips = args.bs / best
            results.append((label, opts, best * 1e3, clips, compile_s))
            print(f"{label:24s} {best*1e3:8.2f} ms/step "
                  f"{clips:8.1f} clips/s  (compile+warm {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:  # compiler rejection or OOM: record and move on
            print(f"{label:24s} REJECTED: {type(e).__name__}: {e}",
                  flush=True)

    if results:
        base = next((r for r in results if r[0] == "baseline"), results[0])
        print(f"\n== ranked vs {base[0]} =="
              + ("" if base[0] == "baseline" else
                 "  (baseline not in this run — ratios are vs the first "
                 "candidate, NOT the no-flags program)"))
        for label, opts, ms, clips, _ in sorted(results, key=lambda r: r[2]):
            print(f"{label:24s} {ms:8.2f} ms  {clips:8.1f} clips/s  "
                  f"{base[2]/ms:.3f}x  {json.dumps(opts)}")


if __name__ == "__main__":
    main()
