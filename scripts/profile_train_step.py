"""Profile the flagship train step on the real chip and summarize HBM passes.

Runs K jitted r2plus1d_18 bf16 train steps (bs16, 16x112x112 — the reference's
headline config, /root/reference/run.sh:5-18) inside one dispatch under
jax.profiler, then parses the trace and prints device-op time grouped by op
category (convolution / reduce fusions / elementwise fusions / other). This is
the measurement tool behind the ROADMAP performance analysis.

Usage:  python scripts/profile_train_step.py [--bs 16] [--steps 20] [--out /tmp/zsvc_prof]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(bs, clip_len, size, steps, out):
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.train import (
        create_train_state, make_optimizer)
    from zeroshotvideoclassification_tpu.train.step import TrainState, masked_mse

    config = Config(network="r2plus1d_18", head="mlp", bs=bs)
    model = get_network(config)
    optimizer = make_optimizer(config.lr)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0, (bs, 1, clip_len, size, size, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(bs, 300)).astype(np.float32))
    w = jnp.ones((bs,), jnp.float32)

    def one_step(ts):
        def loss_fn(p):
            emb, ns = model.apply(p, ts.model_state, x, train=True,
                                  compute_dtype=jnp.bfloat16)
            return masked_mse(emb, z, w), ns
        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        return TrainState(optax.apply_updates(ts.params, updates), ns,
                          opt_state, ts.step + 1)

    @jax.jit
    def multi(ts):
        return jax.lax.fori_loop(0, steps, lambda i, t: one_step(t), ts)

    print("warmup (compile)...", flush=True)
    t0 = time.perf_counter()
    ts = multi(ts)
    float(jax.device_get(ts.step))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    ts = multi(ts)
    float(jax.device_get(ts.step))
    dt = time.perf_counter() - t0
    print(f"steady: {dt/steps*1e3:.1f} ms/step = {bs*steps/dt:.1f} clips/s", flush=True)

    jax.profiler.start_trace(out)
    ts = multi(ts)
    float(jax.device_get(ts.step))
    jax.profiler.stop_trace()
    return dt / steps


def parse_trace(out, steps, step_ms):
    files = sorted(glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        print("no trace files found", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-side pids (TensorCore lanes)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}

    def category(name):
        n = name.lower()
        if "conv" in n:
            return "convolution"
        if n.startswith("fusion") or ".fusion" in n:
            return "fusion(unclassified)"
        return None

    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("RunExecutable", "Infeed", "Outfeed")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        total += dur

    print(f"\n== device op time over traced window (total {total:.1f} ms, "
          f"{total/steps:.2f} ms/step vs wall {step_ms:.1f}) ==")
    groups = defaultdict(float)
    for name, ms in by_name.items():
        n = name.lower()
        if "conv" in n and "fusion" not in n:
            g = "convolution"
        elif "reduce" in n:
            g = "reduce-fusion"
        elif "fusion" in n:
            g = "other-fusion"
        elif "copy" in n or "transpose" in n:
            g = "copy/transpose"
        else:
            g = "other"
        groups[g] += ms
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {g:18s} {ms/steps:8.3f} ms/step  ({100*ms/max(total,1e-9):.1f}%)")
    print("\n== top 30 ops ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms/steps:8.3f} ms/step  {name[:140]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="/tmp/zsvc_prof")
    args = p.parse_args()
    step_ms = run(args.bs, args.clip_len, args.size, args.steps, args.out) * 1e3
    parse_trace(args.out, args.steps, step_ms)


if __name__ == "__main__":
    main()
