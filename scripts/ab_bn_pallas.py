"""A/B: the fused lane-flattened Pallas BN epilogue (ops/bn_pallas.py) vs
XLA's native conv-fused epilogue, on the full train step (VERDICT r4 #1a —
the round-1 perf plan's one unbuilt lever).

ZSVC_PALLAS_BN is read at TRACE time, so both variants run in ONE process
(two distinct jit programs). Timing = bench.py's K-step in-graph loop (the
only honest timing on the axon relay). A failed compile of the Pallas
variant is reported as a JSON line, not a crash — the adjudication is the
deliverable either way.

Usage: python scripts/ab_bn_pallas.py [--bs 16] [--steps 20] [--reps 3]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--network", default="r2plus1d_18")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()
    if args.smoke:
        args.bs, args.clip_len, args.size, args.steps = 2, 4, 32, 2

    import bench

    results = {}
    for mode, env in (("xla_fused", "0"), ("pallas_bn", "1")):
        os.environ["ZSVC_PALLAS_BN"] = env
        try:
            value, step_time, n_chips, _ = bench.run_bench(
                args.bs, args.clip_len, args.size, args.steps,
                args.network, args.smoke)
            results[mode] = step_time
            print(json.dumps({
                "metric": f"bn_epilogue_{mode}",
                "value": round(value, 2),
                "unit": "clips/s/chip",
                "step_time_ms": round(step_time * 1e3, 2),
                "bs": args.bs,
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — record the rejection
            print(json.dumps({
                "metric": f"bn_epilogue_{mode}",
                "value": None,
                "error": repr(e)[:500],
                "bs": args.bs,
            }), flush=True)
    os.environ.pop("ZSVC_PALLAS_BN", None)
    if len(results) == 2:
        print(json.dumps({
            "metric": "bn_epilogue_pallas_speedup",
            "value": round(results["xla_fused"] / results["pallas_bn"], 4),
            "unit": "x",
        }))


if __name__ == "__main__":
    main()
