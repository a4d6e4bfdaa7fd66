"""Benchmark: steady-state training throughput of the flagship config.

Measures clips/sec/chip for the end-to-end jitted train step of R(2+1)D-18
(+MLP head, bf16 compute) at the reference's headline shape — 16x112x112
clips, MSE regression to 300-d embeddings — on the available accelerator.

Baseline note: the reference publishes no throughput (SURVEY.md §6;
BASELINE.json "published": {}). `vs_baseline` is computed against an
ESTIMATED 120 clips/sec for the reference's V100 + AMP DataParallel setup
(R(2+1)D-18 train ~= 3 x 40 GFLOP/clip; V100 AMP video-conv pipelines of that
era sustained ~100-150 clips/s/GPU). Revisit when a measured number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

V100_REFERENCE_CLIPS_PER_SEC_ESTIMATE = 120.0


def run_bench(bs: int, clip_len: int, size: int, steps: int,
              network: str, smoke: bool):
    """Time `steps` full training steps executed inside ONE jitted fori_loop.

    The in-graph loop is essential on this harness: the axon device relay is
    deeply asynchronous (block_until_ready returns before execution) and has
    ~1s per-dispatch round-trip cost, so per-call timing measures the tunnel,
    not the chip. A K-step loop with a scalar fetch measures real device
    compute — the number that transfers to production TPU VMs.
    """
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.parallel import (
        make_mesh, replicated, shard_batch)
    from zeroshotvideoclassification_tpu.train import (
        create_train_state, make_optimizer)
    from zeroshotvideoclassification_tpu.train.step import TrainState, masked_mse

    config = Config(network=network, head="mlp", bs=bs)
    model = get_network(config)
    optimizer = make_optimizer(config.lr)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    n_chips = len(jax.devices())
    mesh = make_mesh((-1,), ("data",))
    if n_chips > 1:
        ts = jax.device_put(ts, replicated(mesh))

    rng = np.random.default_rng(0)
    n_classes = 64
    x = rng.uniform(-0.5, 0, (bs, 1, clip_len, size, size, 3)).astype(np.float32)
    class_embed = rng.normal(size=(n_classes, 300)).astype(np.float32)
    class_embed /= np.linalg.norm(class_embed, axis=1, keepdims=True)
    labels = rng.integers(0, n_classes, size=bs).astype(np.int32)
    z = class_embed[labels]
    weight = np.ones(bs, np.float32)
    if n_chips > 1:
        xb, zb, lb, wb = shard_batch(mesh, (x, z, labels, weight))
    else:
        xb, zb, lb, wb = map(jnp.asarray, (x, z, labels, weight))

    def one_step(ts):
        def loss_fn(p):
            emb, ns = model.apply(p, ts.model_state, xb, train=True,
                                  compute_dtype=jnp.bfloat16)
            return masked_mse(emb, zb, wb), ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        return TrainState(
            optax.apply_updates(ts.params, updates), ns, opt_state, ts.step + 1)

    @jax.jit
    def multi(ts):
        return jax.lax.fori_loop(0, steps, lambda i, t: one_step(t), ts)

    ts = multi(ts)
    float(jax.device_get(ts.step))  # warm-up: one full multi-step call (compile + run)
    t0 = time.perf_counter()
    ts = multi(ts)
    float(jax.device_get(ts.step))  # sync
    dt = time.perf_counter() - t0
    clips_per_sec = bs * steps / dt
    return clips_per_sec / n_chips, dt / steps, n_chips


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--network", default="r2plus1d_18")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU run (CI sanity, meaningless absolute numbers)")
    args = p.parse_args()
    if args.smoke:
        args.bs, args.clip_len, args.size, args.steps = 2, 4, 32, 2

    value, step_time, n_chips = run_bench(
        args.bs, args.clip_len, args.size, args.steps,
        args.network, args.smoke)
    print(json.dumps({
        "metric": f"train_clips_per_sec_per_chip_{args.network}_bs{args.bs}"
                  f"_len{args.clip_len}_{args.size}px_bf16",
        "value": round(value, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(value / V100_REFERENCE_CLIPS_PER_SEC_ESTIMATE, 3),
    }))
    print(f"# step_time={step_time*1e3:.1f}ms n_chips={n_chips}", file=sys.stderr)


if __name__ == "__main__":
    main()
