"""Re-run the train scaling curve under the SHIPPED program (VERDICT r3 #6).

Round 2's curve predates the tuned XLA flags, the select-based non-finite
guard and the bf16 transform input; this harness re-measures clips/s/chip
across batch size, clip length and remat modes by invoking bench.py's
in-graph loop (each config in a fresh process — one flaky backend init must
not kill the sweep; bench.py's own worker mode is reused so every number is
measured exactly like the headline).

Writes one JSON line per config to --out (default scripts/scaling_r4.json)
and prints a markdown table at the end.

Usage: python scripts/scaling_curve.py [--steps 50] [--quick]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (bs, clip_len, extra args, label)
    (8, 16, [], "bs8"),
    (16, 16, [], "bs16 (headline)"),
    (32, 16, [], "bs32"),
    (64, 16, [], "bs64"),
    (16, 8, [], "len8"),
    (16, 32, [], "len32"),
    (16, 16, ["--remat", "convs"], "remat convs"),
    (16, 16, ["--remat", "full"], "remat full"),
]


def run_one(bs, clip_len, extra, steps, timeout):
    # go through bench.py's supervisor (NOT --_worker) so each config gets
    # its retry-on-transient-outage behavior; 2 attempts keep the sweep's
    # worst case bounded while surviving one relay hiccup per config
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--attempts", "2", "--skip_e2e",
           "--attempt_timeout", str(max(60.0, timeout / 2 - 60)),
           "--bs", str(bs), "--clip_len", str(clip_len),
           "--steps", str(steps)] + extra
    try:
        # zero the supervisor's retry backoff: the sweep's outer timeout is
        # the only budget, and a dead 30 s sleep can push two attempts past
        # it, losing the structured diagnostic line
        env = dict(os.environ, ZSVC_BENCH_BACKOFF_S="0")
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=ROOT, env=env)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout {timeout}s"}
    line = next((ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith('{"metric"')), None)
    if proc.returncode != 0 or line is None:
        tail = " | ".join(proc.stderr.strip().splitlines()[-2:])
        return {"error": f"rc={proc.returncode}: {tail[:300]}"}
    out = json.loads(line)
    out["stderr"] = proc.stderr.strip().splitlines()[-1:]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--timeout", type=float, default=2400.0)
    p.add_argument("--out", default=os.path.join(ROOT, "scripts",
                                                 "scaling_r5.json"))
    p.add_argument("--quick", action="store_true",
                   help="bs16 + len variants only")
    args = p.parse_args()

    configs = CONFIGS if not args.quick else CONFIGS[1:2] + CONFIGS[4:6]
    rows = []
    for bs, cl, extra, label in configs:
        r = run_one(bs, cl, extra, args.steps, args.timeout)
        r.update({"bs": bs, "clip_len": cl, "label": label})
        rows.append(r)
        print(json.dumps(r), flush=True)
        with open(args.out, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")

    print("\n| config | clips/s/chip | frames/s |")
    print("|---|---|---|")
    for r in rows:
        if "value" in r and r.get("value") is not None:
            fps = r["value"] * r["clip_len"]
            print(f"| {r['label']} | {r['value']:.1f} | {fps:.0f} |")
        else:
            print(f"| {r['label']} | ERROR: {r.get('error')} | |")


if __name__ == "__main__":
    main()
