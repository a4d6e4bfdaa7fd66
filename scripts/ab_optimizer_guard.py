"""A/B: cond-based vs select-based non-finite step-skip guard.

PERF_ROOFLINE.json puts the optimizer's apply_if_finite fusion at 1.42 ms /
af 0.69: optax implements the skip with `lax.cond`, and a conditional is a
fusion BARRIER in XLA — the branch bodies compile as separate computations,
so the finiteness check, the Adam moment update and the parameter apply
cannot fuse into one pass over the ~0.4 GB optimizer state.

The select formulation computes the Adam update unconditionally and
`jnp.where`-selects (new vs old) per leaf on a scalar finiteness flag —
identical skip semantics (params, moments and count all untouched on a
non-finite gradient; the NaN-poisoned candidate state is discarded), but
pure elementwise dataflow that XLA can fuse end-to-end.

This script times the FULL train step under both guards (same in-graph
K-step loop as bench.py, tuned compile options applied as shipped) and
also asserts the two guards agree bit-for-bit on a finite step and on a
NaN-gradient step before timing.

Usage: python scripts/ab_optimizer_guard.py [--bs 16] [--steps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def adam_cond_guard(learning_rate):
    """The losing arm kept verbatim for re-runs: optax.apply_if_finite's
    lax.cond skip (the framework default before this A/B; the select-based
    winner now lives in train/optimizer.py:_adam_with_guard)."""
    import optax

    return optax.apply_if_finite(
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        max_consecutive_errors=10**8,
    )


def build(bs, clip_len, size, steps, guard):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.train import create_train_state
    from zeroshotvideoclassification_tpu.train.optimizer import (
        _adam_with_guard)
    from zeroshotvideoclassification_tpu.train.step import (
        TrainState, masked_mse)
    from zeroshotvideoclassification_tpu.utils.xla_tuning import (
        tpu_compiler_options)

    config = Config(network="r2plus1d_18", head="mlp", bs=bs)
    model = get_network(config)
    # wrap in inject_hyperparams exactly as the shipped make_optimizer does
    # (train/optimizer.py) so both timed arms are the production program
    # modulo ONLY the guard. NOTE: this step construction intentionally
    # mirrors bench.py:run_bench / scripts/ab_xla_flags.py:build_step —
    # keep the three in sync.
    optimizer = optax.inject_hyperparams(
        adam_cond_guard if guard == "cond" else _adam_with_guard
    )(learning_rate=config.lr)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(
        -0.5, 0, (bs, 1, clip_len, size, size, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(bs, 300)).astype(np.float32))
    w = jnp.ones((bs,), jnp.float32)

    def one_step(ts):
        def loss_fn(p):
            emb, ns = model.apply(p, ts.model_state, x, train=True,
                                  compute_dtype=jnp.bfloat16)
            return masked_mse(emb, z, w), ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        return TrainState(
            optax.apply_updates(ts.params, updates), ns, opt_state,
            ts.step + 1)

    jitted = jax.jit(lambda t: jax.lax.fori_loop(
        0, steps, lambda i, s: one_step(s), t),
        compiler_options=tpu_compiler_options())
    return jitted, ts


def check_semantics():
    """Both guards must agree on finite steps and skip identically on NaN."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from zeroshotvideoclassification_tpu.train.optimizer import (
        _adam_with_guard)

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0,
              "b": jnp.ones((3,), jnp.float32)}
    g_ok = jax.tree.map(lambda p: 0.1 * (p + 1.0), params)
    g_bad = jax.tree.map(lambda p: p * jnp.nan, params)

    def run(opt, mu_of):
        st = opt.init(params)
        up1, st1 = opt.update(g_ok, st, params)
        p1 = optax.apply_updates(params, up1)
        up2, st2 = opt.update(g_bad, st1, params)
        p2 = optax.apply_updates(p1, up2)
        return (jax.tree.map(np.asarray, (p1, p2)),
                jax.tree.map(np.asarray, (mu_of(st1), mu_of(st2))))

    (c_p1, c_p2), (c_mu1, c_mu2) = run(
        adam_cond_guard(1e-3), lambda s: s.inner_state[0].mu)
    (s_p1, s_p2), (s_mu1, s_mu2) = run(
        _adam_with_guard(1e-3), lambda s: s.inner_state[0].mu)

    for a, b in [(c_p1, s_p1), (c_p2, s_p2), (c_mu1, s_mu1), (c_mu2, s_mu2)]:
        jax.tree.map(np.testing.assert_array_equal, a, b)
    # the NaN step must be a true skip: params and moments frozen, no NaNs
    jax.tree.map(np.testing.assert_array_equal, s_p2, s_p1)
    jax.tree.map(np.testing.assert_array_equal, s_mu2, s_mu1)
    assert all(np.all(np.isfinite(x))
               for x in jax.tree_util.tree_leaves((s_p2, s_mu2)))
    print("semantics: cond == select on finite AND NaN steps (bit-exact)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax

    check_semantics()

    results = []
    for guard in ["cond", "select"]:
        jitted, ts0 = build(args.bs, args.clip_len, args.size, args.steps,
                            guard)
        ts = jitted(ts0)
        float(jax.device_get(ts.step))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ts = jitted(ts)
            float(jax.device_get(ts.step))
            best = min(best, (time.perf_counter() - t0) / args.steps)
        results.append((guard, best * 1e3, args.bs / best))
        print(f"{guard:8s} {best*1e3:8.2f} ms/step {args.bs/best:8.1f} clips/s",
              flush=True)

    (g0, ms0, _), (g1, ms1, _) = results
    print(f"\n{g1} vs {g0}: {ms0/ms1:.3f}x")


if __name__ == "__main__":
    main()
