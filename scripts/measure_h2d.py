"""Measure host->device transfer bandwidth through this harness.

The e2e benchmark ships a 67 MB uint8 canvas per bs16 batch; on a TPU VM the
PCIe H2D for that is ~4 ms (negligible vs the 60 ms step), but the axon
relay tunnels transfers, so this measures what the tunnel actually delivers —
the denominator for interpreting BENCH e2e numbers on this harness.

Usage: python scripts/measure_h2d.py [--mb 64] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=64)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = args.mb * 1024 * 1024
    host = np.random.default_rng(0).integers(0, 255, n, np.uint8)

    # force materialization + a value fetch to sync the async relay
    @jax.jit
    def touch(x):
        return x[::4096].astype(jnp.int32).sum()

    d = jax.device_put(host)
    float(jax.device_get(touch(d)))  # warm compile

    rates = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        d = jax.device_put(host)
        float(jax.device_get(touch(d)))
        dt = time.perf_counter() - t0
        rates.append(args.mb / dt)
    print(f"H2D ~{max(rates):.1f} MB/s best, {sum(rates)/len(rates):.1f} MB/s "
          f"mean over {args.reps} x {args.mb} MB (includes one small fetch)")


if __name__ == "__main__":
    main()
