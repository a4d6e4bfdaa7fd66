"""On-chip A/B: XLA gather fused_video_transform vs the Pallas MXU variant.

Adjudicates the ZSVC_PALLAS_RESAMPLE flag (VERDICT r1 weak-item 4): times
both kernels at the real input-pipeline shape (bs16 canvas batch) inside one
jitted fori_loop (per-dispatch timing lies through the axon relay) and checks
numerical agreement.

Usage: python scripts/ab_resample.py [--bs 16] [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.data.datasets import VideoTable
    from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline
    from zeroshotvideoclassification_tpu.ops.resample import (
        fused_video_transform,
    )
    from zeroshotvideoclassification_tpu.ops.resample_pallas import (
        fused_video_transform_pallas,
    )

    # real host batch at the flagship shape (synthetic source)
    cfg = Config(bs=args.bs, clip_len=args.clip_len, size=args.size)
    n_classes = 4
    rng = np.random.default_rng(0)
    ce = rng.normal(size=(n_classes, 300)).astype(np.float32)
    ce /= np.linalg.norm(ce, axis=1, keepdims=True)
    labels = rng.integers(0, n_classes, size=args.bs).astype(np.int32)
    table = VideoTable(
        name="ab", fnames=np.asarray([(int(l), i) for i, l in enumerate(labels)],
                                     object),
        label_idx=labels, classes=[f"c{i}" for i in range(n_classes)],
        class_embed=ce, loader="synthetic", is_validation=False, n_clips=1)
    hb = next(iter(HostPipeline(table, cfg, args.bs, seed=0)))
    arrs = tuple(jnp.asarray(a) for a in hb.resample_args())

    # numerical agreement first
    a = jax.device_get(fused_video_transform(*arrs))
    b = jax.device_get(fused_video_transform_pallas(*arrs))
    err = float(np.abs(a - b).max())
    print(f"max |xla - pallas| = {err:.2e}")

    def bench(fn, label):
        @jax.jit
        def loop(c):
            def body(i, acc):
                y = fn(arrs[0], *[x + 0 * i for x in arrs[1:]])
                return acc + y[0, 0, 0, 0, 0]
            return jax.lax.fori_loop(0, args.reps, body, c)

        r = loop(jnp.zeros(()))
        float(jax.device_get(r))  # compile+run
        t0 = time.perf_counter()
        r = loop(jnp.zeros(()))
        float(jax.device_get(r))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{label}: {dt*1e3:.2f} ms/batch "
              f"({args.bs/dt:.0f} clips/s)")
        return dt

    t_xla = bench(fused_video_transform, "xla-gather ")
    t_pal = bench(fused_video_transform_pallas, "pallas-mxu ")
    print(f"winner: {'pallas' if t_pal < t_xla else 'xla'} "
          f"({t_xla/t_pal:.2f}x)")


if __name__ == "__main__":
    main()
