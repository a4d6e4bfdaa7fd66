"""A/B: antialiased (PIL-parity) SUN crop resize vs plain 2-tap bilinear.

Adjudicates Config.sun_antialias (VERDICT r4 #5). Two measurements:
  1. kernel wall time — fused_image_motion_transform_aa (K=11 taps derived
     on device from the trajectory) vs fused_image_motion_transform (host
     2-tap indices), in-graph fori_loop timing like scripts/ab_image_motion;
  2. embedding delta — both transforms of the SAME images/trajectories
     pushed through the flagship backbone (seeded init), reporting per-clip
     embedding cosine similarity and relative L2. This bounds how much the
     rounds-1-4 non-antialiased divergence could have moved SUN-pretrained
     features (the reference path is antialiased:
     /root/reference/auxiliary/auxiliary_stillimages.py:56-62,130-134).

Usage: python scripts/ab_sun_antialias.py [--bs 11] [--reps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=11)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 342))
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--skip_embed", action="store_true")
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
        fused_image_motion_transform_aa,
    )

    rng = np.random.default_rng(0)
    hw = tuple(args.hw)
    imgs = rng.integers(0, 256, (args.bs, *hw, 3), dtype=np.uint8)
    trajs, idx = [], []
    for b in range(args.bs):
        traj = camera_motion_trajectory(hw, args.size, args.frames, rng)
        trajs.append(traj)
        idx.append(motion_resample_indices(traj, hw, args.size))
    stacked = [jnp.asarray(np.stack([idx[b][k] for b in range(args.bs)]))
               for k in range(6)]
    traj_d = jnp.asarray(np.stack(trajs).astype(np.int32))
    hw_d = jnp.asarray(np.tile(np.asarray([hw], np.int32), (args.bs, 1)))
    imgs_d = jnp.asarray(imgs)
    cs, co = jnp.asarray(CH_SCALE), jnp.asarray(CH_OFFSET)

    def plain(im):
        return fused_image_motion_transform(im, *stacked, cs, co)

    def aa(im):
        return fused_image_motion_transform_aa(
            im, traj_d, hw_d, cs, co, crop_size=args.size)

    def aa_gather(im):
        return fused_image_motion_transform_aa(
            im, traj_d, hw_d, cs, co, crop_size=args.size, impl="gather")

    a = jax.device_get(aa(imgs_d))
    b = jax.device_get(plain(imgs_d))
    # pixel-level: how different the two transforms actually are
    print(json.dumps({
        "metric": "sun_aa_pixel_delta",
        "mean_abs": float(np.abs(a - b).mean()),
        "max_abs": float(np.abs(a - b).max()),
        "note": "normalized units; std ~0.22 so 0.0455 = 1/255*... per-pixel",
    }))

    def bench(fn, label):
        @jax.jit
        def loop(c):
            def body(i, acc):
                y = fn(imgs_d + (0 * i).astype(jnp.uint8))
                return acc + y[0, 0, 0, 0, 0]
            return jax.lax.fori_loop(0, args.reps, body, c)

        float(jax.device_get(loop(jnp.zeros(()))))
        t0 = time.perf_counter()
        float(jax.device_get(loop(jnp.zeros(()))))
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"metric": f"sun_{label}_kernel",
                          "value": round(dt * 1e3, 3), "unit": "ms/batch",
                          "images_per_sec": round(args.bs / dt, 1)}))
        return dt

    t_plain = bench(plain, "plain_bilinear")
    t_aa = bench(aa, "antialiased")
    print(json.dumps({"metric": "sun_aa_kernel_cost",
                      "value": round(t_aa / t_plain, 3), "unit": "x"}))
    t_gather = bench(aa_gather, "antialiased_gather")
    print(json.dumps({"metric": "sun_aa_mxu_vs_gather_speedup",
                      "value": round(t_gather / t_aa, 3), "unit": "x"}))

    if not args.skip_embed:
        from zeroshotvideoclassification_tpu.config import Config
        from zeroshotvideoclassification_tpu.models import get_network

        cfg = Config(dataset="sun2both", nopretrained=True, clip_len=8,
                     bs=args.bs)
        model = get_network(cfg)
        params, state = model.init(jax.random.PRNGKey(0))

        @jax.jit
        def embed(x):
            # [B, T, S, S, C] -> [B, nc=1, cl, S, S, C] model input
            bsz, t, s, _, c = x.shape
            xin = x.reshape(bsz, 1, t, s, s, c)[:, :, :8]
            emb, _ = model.apply(params, state, xin, train=False)
            return emb

        ea = np.asarray(embed(jnp.asarray(a)), np.float64)
        eb = np.asarray(embed(jnp.asarray(b)), np.float64)
        cos = (ea * eb).sum(1) / (
            np.linalg.norm(ea, axis=1) * np.linalg.norm(eb, axis=1) + 1e-12)
        rel = np.linalg.norm(ea - eb, axis=1) / (
            np.linalg.norm(eb, axis=1) + 1e-12)
        print(json.dumps({
            "metric": "sun_aa_embedding_delta",
            "cosine_mean": round(float(cos.mean()), 6),
            "cosine_min": round(float(cos.min()), 6),
            "rel_l2_mean": round(float(rel.mean()), 6),
            "rel_l2_max": round(float(rel.max()), 6),
            "note": "AA vs plain transform through the seeded backbone",
        }))


if __name__ == "__main__":
    main()
