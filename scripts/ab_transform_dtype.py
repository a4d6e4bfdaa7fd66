"""On-chip A/B: fused-transform output dtype f32 vs bf16 (VERDICT r3 #2).

The round-3 roofline (PERF_ROOFLINE.json) left one untried bandwidth lever:
the transform emitted float32, so the stem read a 2x-bigger activation and
the transform wrote 2x the bytes on a step whose dominant backward fusions
are bandwidth-walled at 272-347 GB/s. bf16 output is BIT-IDENTICAL under
bf16 compute (tests/test_transform_dtype.py proves it at the transform,
eval-forward and full-train-step level), so this is a pure-bandwidth
adjudication.

Measures the PRODUCTION device program — fused transform -> reshape ->
train step — inside one jitted fori_loop (per-dispatch timing lies on the
axon relay; see bench.py). The canvas/gather inputs are fixed across
iterations; the state threads through the loop so nothing is hoisted.

Usage: python scripts/ab_transform_dtype.py [--bs 16] [--steps 20] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inputs(bs, clip_len, size):
    import numpy as np

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.data.datasets import VideoTable
    from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline

    cfg = Config(bs=bs, clip_len=clip_len, size=size, n_clips=1,
                 prefetch_depth=0)
    rng = np.random.default_rng(0)
    fnames = np.asarray([(int(i % 8), i) for i in range(bs)], object)
    table = VideoTable(
        name="ab", fnames=fnames, label_idx=np.arange(bs, dtype=np.int32) % 8,
        classes=[f"c{i}" for i in range(8)],
        class_embed=rng.normal(size=(8, 300)).astype(np.float32),
        loader="synthetic", is_validation=False, n_clips=1)
    hb = next(iter(HostPipeline(table, cfg, bs, seed=0)))
    return hb, cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--network", default="r2plus1d_18")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.ops.resample import (
        fused_video_transform,
    )
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_optimizer,
    )
    from zeroshotvideoclassification_tpu.train.step import (
        TrainState,
        masked_mse,
    )
    from zeroshotvideoclassification_tpu.utils.xla_tuning import (
        tpu_compiler_options,
    )

    use_pallas = jax.default_backend() in ("tpu", "axon")
    if use_pallas:
        from zeroshotvideoclassification_tpu.ops.resample_pallas import (
            fused_video_transform_pallas as transform,
        )
    else:
        transform = fused_video_transform

    import optax

    hb, cfg = build_inputs(args.bs, args.clip_len, args.size)
    cfg = cfg.replace(network=args.network)
    model = get_network(cfg)
    optimizer = make_optimizer(cfg.lr)
    ts0 = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    z = jnp.asarray(hb.z)
    w = jnp.asarray(hb.weight)
    rargs = tuple(map(jnp.asarray, hb.resample_args()))

    def loop(out_dtype):
        def one_step(ts):
            x = transform(*rargs, out_dtype=out_dtype)
            b, s = x.shape[0], x.shape[2]
            x = x.reshape(b, 1, args.clip_len, s, s, 3)  # [B, nc=1, T, S, S, C]

            def loss_fn(p):
                emb, ns = model.apply(p, ts.model_state, x, train=True,
                                      compute_dtype=jnp.bfloat16)
                return masked_mse(emb, z, w), ns

            (loss, ns), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts.params)
            updates, opt_state = optimizer.update(grads, ts.opt_state,
                                                  ts.params)
            return TrainState(optax.apply_updates(ts.params, updates), ns,
                              opt_state, ts.step + 1)

        import functools

        @functools.partial(jax.jit,
                           compiler_options=tpu_compiler_options())
        def multi(ts):
            return jax.lax.fori_loop(0, args.steps, lambda i, t: one_step(t),
                                     ts)

        return multi

    results = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        multi = loop(dt)
        ts = multi(ts0)
        float(jax.device_get(ts.step))  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ts = multi(ts)
            float(jax.device_get(ts.step))
            best = min(best, (time.perf_counter() - t0) / args.steps)
        results[name] = best
        print(f"{name}: {best * 1e3:.2f} ms/step "
              f"({args.bs / best:.1f} clips/s/chip)")
    print(f"speedup f32->bf16: {results['f32'] / results['bf16']:.3f}x")


if __name__ == "__main__":
    main()
