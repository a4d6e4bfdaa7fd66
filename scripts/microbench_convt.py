"""Microbench: temporal (3,1,1) conv formulations at the layer1 hot shape.

The step profile (scripts/analyze_step_hlo.py) shows the four layer1
conv_t+BN-stat fusions at 2.58 ms each — 14% MFU, under both the compute and
bandwidth walls. Candidates:
  A. lax.conv_general_dilated (current, layers.conv3d)
  B. sum of 3 shifted dot_generals over the channel dim (matmul form)
  C. B with BN statistics fused (sum / sum of squares of the output)
  A2. A with BN statistics fused (what XLA does in the step today)

Each is timed fwd-only and fwd+bwd (value_and_grad of a mean), inside one
jitted fori_loop (per-dispatch timing lies through the relay).

Usage: python scripts/microbench_convt.py [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--cin", type=int, default=144)
    p.add_argument("--cout", type=int, default=64)
    p.add_argument("--t", type=int, default=16)
    p.add_argument("--hw", type=int, default=56)
    p.add_argument("--bs", type=int, default=16)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(
        size=(args.bs, args.t, args.hw, args.hw, args.cin)
    ).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(
        size=(3, 1, 1, args.cin, args.cout)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    def conv_a(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=[(1, 1), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv_b(x, w):
        # pad T, then out[t] = x[t-1]@W0 + x[t]@W1 + x[t+1]@W2
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        t = x.shape[1]
        w0, w1, w2 = w[0, 0, 0], w[1, 0, 0], w[2, 0, 0]
        return (jnp.dot(xp[:, 0:t], w0) + jnp.dot(xp[:, 1:t + 1], w1)
                + jnp.dot(xp[:, 2:t + 2], w2))

    def with_stats(f):
        def g(x, w):
            y = f(x, w)
            yf = y.astype(jnp.float32)
            s1 = jnp.mean(yf, axis=(0, 1, 2, 3))
            s2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3))
            return y, s1, s2
        return g

    # numerical agreement
    ya = jax.device_get(jax.jit(conv_a)(x, w)).astype(np.float32)
    yb = jax.device_get(jax.jit(conv_b)(x, w)).astype(np.float32)
    print(f"max|A-B| = {np.abs(ya - yb).max():.3e} "
          f"(scale {np.abs(ya).max():.1f})")

    def bench(fn, label, grad=False):
        if grad:
            def loss(x, w):
                out = fn(x, w)
                y = out[0] if isinstance(out, tuple) else out
                return jnp.sum(y.astype(jnp.float32) * 1e-6)
            f = jax.value_and_grad(loss, argnums=(0, 1))
        else:
            f = fn

        @jax.jit
        def loop(x, w):
            def body(i, c):
                out = f(x + (c * 0).astype(x.dtype), w)
                leaf = jax.tree.leaves(out)[0]
                return c + leaf.astype(jnp.float32).ravel()[0]
            return jax.lax.fori_loop(0, args.reps, body, jnp.zeros(()))

        r = loop(x, w)
        float(jax.device_get(r))
        t0 = time.perf_counter()
        float(jax.device_get(loop(x, w)))
        dt = (time.perf_counter() - t0) / args.reps
        flops = 2 * x.size // args.cin * args.cin * args.cout * 3
        if grad:
            flops *= 3
        print(f"  {label:24s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s")
        return dt

    print(f"shape: x{tuple(x.shape)} w{tuple(w.shape)} bf16")
    print("temporal conv fwd only:")
    bench(conv_a, "A conv_general")
    bench(conv_b, "B shifted-matmul")
    bench(with_stats(conv_a), "A + bn stats")
    bench(with_stats(conv_b), "B + bn stats")
    print("temporal conv fwd+bwd:")
    bench(conv_a, "A conv_general", grad=True)
    bench(conv_b, "B shifted-matmul", grad=True)
    bench(with_stats(conv_a), "A + bn stats", grad=True)
    bench(with_stats(conv_b), "B + bn stats", grad=True)

    # ---- spatial (1,3,3) conv: 3D vs 2D-folded at the fusion boundary ----
    cin_s, cout_s = 64, 144
    xs = jnp.asarray(rng.normal(
        size=(args.bs, args.t, args.hw, args.hw, cin_s)
    ).astype(np.float32)).astype(jnp.bfloat16)
    ws = jnp.asarray(rng.normal(
        size=(1, 3, 3, cin_s, cout_s)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    def sconv_a(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=[(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def sconv_b(x, w):
        n, t, h, wd, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(n * t, h, wd, c), w[0],
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(n, t, h, wd, -1)

    ya = jax.device_get(jax.jit(sconv_a)(xs, ws)).astype(np.float32)
    yb = jax.device_get(jax.jit(sconv_b)(xs, ws)).astype(np.float32)
    print(f"\nspatial: max|A-B| = {np.abs(ya - yb).max():.3e}")

    def bench_s(fn, label, grad=False):
        if grad:
            def loss(x, w):
                out = fn(x, w)
                y = out[0] if isinstance(out, tuple) else out
                return jnp.sum(y.astype(jnp.float32) * 1e-6)
            f = jax.value_and_grad(loss, argnums=(0, 1))
        else:
            f = fn

        @jax.jit
        def loop(x, w):
            def body(i, c):
                out = f(x + (c * 0).astype(x.dtype), w)
                leaf = jax.tree.leaves(out)[0]
                return c + leaf.astype(jnp.float32).ravel()[0]
            return jax.lax.fori_loop(0, args.reps, body, jnp.zeros(()))

        float(jax.device_get(loop(xs, ws)))
        t0 = time.perf_counter()
        float(jax.device_get(loop(xs, ws)))
        dt = (time.perf_counter() - t0) / args.reps
        flops = 2 * xs.size // cin_s * cin_s * cout_s * 9
        if grad:
            flops *= 3
        print(f"  {label:24s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s")

    print("spatial conv fwd only:")
    bench_s(sconv_a, "A conv3d (1,3,3)")
    bench_s(sconv_b, "B conv2d folded")
    bench_s(with_stats(sconv_a), "A + bn stats")
    bench_s(with_stats(sconv_b), "B + bn stats")
    print("spatial conv fwd+bwd:")
    bench_s(sconv_a, "A conv3d (1,3,3)", grad=True)
    bench_s(sconv_b, "B conv2d folded", grad=True)
    bench_s(with_stats(sconv_a), "A + bn stats", grad=True)
    bench_s(with_stats(sconv_b), "B + bn stats", grad=True)


if __name__ == "__main__":
    main()
