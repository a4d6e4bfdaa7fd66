"""On-chip A/B: XLA gather fused_image_motion_transform vs the Pallas MXU
variant (the SUN camera-motion inflation; same adjudication protocol as
scripts/ab_resample.py — in-graph fori_loop timing, numerical agreement
check first).

Usage: python scripts/ab_image_motion.py [--bs 11] [--reps 30]
(bs 11 = the reference's halved image-train batch at bs 22.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=11)
    p.add_argument("--frames", type=int, default=16,
                   help="n_clips*clip_len synthetic-motion steps")
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 342))
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from zeroshotvideoclassification_tpu.data.stillimages import (
        CH_OFFSET,
        CH_SCALE,
        camera_motion_trajectory,
        motion_resample_indices,
    )
    from zeroshotvideoclassification_tpu.ops.resample import (
        fused_image_motion_transform,
    )
    from zeroshotvideoclassification_tpu.ops.resample_pallas import (
        fused_image_motion_transform_pallas,
    )

    rng = np.random.default_rng(0)
    hw = tuple(args.hw)
    imgs = rng.integers(0, 256, (args.bs, *hw, 3), dtype=np.uint8)
    idx = []
    for b in range(args.bs):
        traj = camera_motion_trajectory(hw, args.size, args.frames, rng)
        idx.append(motion_resample_indices(traj, hw, args.size))
    stacked = [jnp.asarray(np.stack([idx[b][k] for b in range(args.bs)]))
               for k in range(6)]
    imgs = jnp.asarray(imgs)
    scale_t = tuple(map(float, CH_SCALE))
    offset_t = tuple(map(float, CH_OFFSET))

    def xla(im, *ix):
        return fused_image_motion_transform(
            im, *ix, jnp.asarray(CH_SCALE), jnp.asarray(CH_OFFSET))

    def pallas(im, *ix):
        return fused_image_motion_transform_pallas(
            im, *ix, ch_scale=scale_t, ch_offset=offset_t)

    a = jax.device_get(xla(imgs, *stacked))
    b = jax.device_get(pallas(imgs, *stacked))
    print(f"max |xla - pallas| = {float(np.abs(a - b).max()):.2e}")

    def bench(fn, label):
        @jax.jit
        def loop(c):
            def body(i, acc):
                y = fn(imgs, *[x + 0 * i for x in stacked])
                return acc + y[0, 0, 0, 0, 0]
            return jax.lax.fori_loop(0, args.reps, body, c)

        float(jax.device_get(loop(jnp.zeros(()))))
        t0 = time.perf_counter()
        float(jax.device_get(loop(jnp.zeros(()))))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{label}: {dt*1e3:.2f} ms/batch ({args.bs/dt:.0f} images/s)")
        return dt

    t_xla = bench(xla, "xla-gather ")
    t_pal = bench(pallas, "pallas-mxu ")
    print(f"winner: {'pallas' if t_pal < t_xla else 'xla'} "
          f"({t_xla/t_pal:.2f}x)")


if __name__ == "__main__":
    main()
