"""Profile ONE train step and cross-reference device fusions with HLO.

Compiles the single-step program (so trace op names match its HLO), runs it
repeatedly under jax.profiler, then prints the top device ops with their HLO
definition (fused computation kind + operand/result shapes + byte estimate).
This yields the byte-level model of where the step time goes — the input to
kernel-fusion decisions (ROADMAP round-2 priority 1).

Usage: python scripts/analyze_step_hlo.py [--bs 16] [--reps 20] [--top 40]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="/tmp/zsvc_hlo_prof")
    p.add_argument("--hlo_out", default="/tmp/zsvc_step.hlo")
    args = p.parse_args()

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

    config = Config(network="r2plus1d_18", head="mlp", bs=args.bs)
    model = get_network(config)
    optimizer = make_optimizer(config.lr)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(
        -0.5, 0, (args.bs, 1, args.clip_len, args.size, args.size, 3)
    ).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(args.bs, 300)).astype(np.float32))
    w = jnp.ones((args.bs,), jnp.float32)

    @jax.jit
    def step(ts):
        def loss_fn(p):
            emb, ns = model.apply(p, ts.model_state, x, train=True,
                                  compute_dtype=jnp.bfloat16)
            return masked_mse(emb, z, w), ns
        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        return TrainState(optax.apply_updates(ts.params, updates), ns,
                          opt_state, ts.step + 1)

    print("compiling single step...", flush=True)
    compiled = step.lower(ts).compile()
    hlo = compiled.as_text()
    with open(args.hlo_out, "w") as f:
        f.write(hlo)
    print(f"HLO -> {args.hlo_out} ({len(hlo)/1e6:.1f} MB)", flush=True)

    ts2 = step(ts)
    float(jax.device_get(ts2.step))
    t0 = time.perf_counter()
    cur = ts
    for _ in range(args.reps):
        cur = step(cur)
    float(jax.device_get(cur.step))
    wall = (time.perf_counter() - t0) / args.reps
    print(f"~{wall*1e3:.1f} ms/step (pipelined dispatches)", flush=True)

    jax.profiler.start_trace(args.out)
    cur = ts
    for _ in range(args.reps):
        cur = step(cur)
    float(jax.device_get(cur.step))
    jax.profiler.stop_trace()

    # ---- parse trace ----
    files = sorted(glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Chip" in n or "/device" in n.lower()}
    by_name = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        by_name[name] += e.get("dur", 0) / 1e3
    # drop enclosing frames (jit_step, modules)
    for k in list(by_name):
        if k.startswith(("jit_", "RunExecutable")) or "." not in k:
            by_name.pop(k, None)

    # ---- index HLO definitions ----
    # instruction line: `  %fusion.123 = bf16[...] fusion(...), kind=kLoop, calls=%fused_computation.45 ...`
    instr_def = {}
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([^\n]+)$",
                         hlo, re.M):
        instr_def[m.group(1)] = m.group(2)

    def shapes_bytes(defline):
        total = 0
        for sm in re.finditer(r"(bf16|f32|s32|u8|pred|u32)\[([\d,]*)\]", defline):
            dt, dims = sm.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * {"bf16": 2, "f32": 4, "s32": 4, "u8": 1,
                          "pred": 1, "u32": 4}[dt]
        return total

    total_ms = sum(by_name.values())
    print(f"\n== total device time {total_ms/args.reps:.1f} ms/step ==")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]
    for name, ms in rows:
        d = instr_def.get(name, "")
        kind = re.search(r"kind=(\w+)", d)
        kind = kind.group(1) if kind else "?"
        calls = re.search(r"calls=%?([\w.\-]+)", d)
        # look at the fused computation body for op classes
        body_ops = ""
        if calls:
            cm = re.search(
                r"%?" + re.escape(calls.group(1)) + r"\s*\(([^)]*)\)[^{]*\{(.*?)\n\}",
                hlo, re.S)
            if cm:
                ops = set(re.findall(r"=\s*\S+\s+(\w[\w\-]*)\(", cm.group(2)))
                interesting = [o for o in ops if o in (
                    "convolution", "reduce", "dot", "transpose", "scatter",
                    "gather", "reduce-window", "select-and-scatter")]
                body_ops = ",".join(sorted(interesting)) or "elementwise"
        mb = shapes_bytes(d) / 1e6
        gbps = (mb / 1e3) / (ms / args.reps / 1e3) if ms else 0
        print(f"  {ms/args.reps:7.3f} ms  {name[:40]:40s} {kind:8s} "
              f"[{body_ops:28s}] {mb:8.1f} MB result  {gbps:6.0f} GB/s(res)")
    # aggregate by body class
    print("\n(result-shape bytes only; operand traffic adds to this)")


if __name__ == "__main__":
    main()
