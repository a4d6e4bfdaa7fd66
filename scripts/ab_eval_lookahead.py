"""A/B: what does the eval one-batch lookahead buy end to end? (VERDICT r4
weak #2 — the eval-lookahead delta never landed in the round-4 log.)

extract_embeddings dispatches batch k+1 before fetching batch k's result
(zeroshotvideoclassification_tpu/eval/zeroshot.py); ZSVC_EVAL_LOOKAHEAD=0 is
the synchronous control. This script times the production eval path — the
synthetic source rendered through HostPipeline -> device_batch_global ->
jitted eval forward at the production 128-clip dispatch budget — under both
modes in ONE process (the toggle is host-side only, so both modes share one
compiled program; parity anchor for the batch-vs-model accounting:
/root/reference/main.py:216-218).

Prints one JSON line per mode plus a delta line.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_videos", type=int, default=128)
    p.add_argument("--n_clips", type=int, default=4)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.n_videos, args.n_clips, args.clip_len, args.reps = 8, 2, 4, 1
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.data.datasets import VideoTable
    from zeroshotvideoclassification_tpu.data.pipeline import (
        HostPipeline,
        device_batch_global,
    )
    from zeroshotvideoclassification_tpu.data.synthetic import class_embeddings
    from zeroshotvideoclassification_tpu.eval.zeroshot import extract_embeddings
    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.parallel import make_mesh, replicated
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    config = Config(network="r2plus1d_18", head="mlp",
                    clip_len=args.clip_len, size=112 if not args.smoke else 32)
    n_classes = min(32, args.n_videos)
    class_ids = list(range(100, 100 + n_classes))
    # honor --n_videos exactly: cycle the class list to n_videos entries
    labels = np.resize(np.arange(n_classes, dtype=np.int32), args.n_videos)
    fnames = np.asarray([(class_ids[l], i) for i, l in enumerate(labels)],
                        object)
    table = VideoTable(
        name="ab_lookahead", fnames=fnames, label_idx=labels,
        classes=[f"class{c}" for c in class_ids],
        class_embed=class_embeddings(class_ids),
        loader="synthetic", is_validation=True, n_clips=args.n_clips)

    model = get_network(config)
    ts = create_train_state(model, make_optimizer(config.lr),
                            jax.random.PRNGKey(0))
    mesh = make_mesh((-1,), ("data",))
    ts = jax.device_put(ts, replicated(mesh))
    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    eval_step = make_eval_step(model, compute_dtype=dtype)

    # production dispatch sizing: floor clips/device at eval_clip_budget
    eval_bs = max(config.eval_clip_budget // args.n_clips, 1)
    eval_bs = min(eval_bs, len(table))
    n_batches = -(-len(table) // eval_bs)

    def one_pass(seed):
        pipe = HostPipeline(table, config, eval_bs, seed=seed)
        batches = (device_batch_global(mesh, h, table.n_clips,
                                       config.clip_len, out_dtype=dtype)
                   for h in pipe)
        t0 = time.perf_counter()
        pred, _, _ = extract_embeddings(
            eval_step, ts.params, ts.model_state, batches)
        return time.perf_counter() - t0, len(pred)

    one_pass(0)  # compile + warm caches
    results = {}
    for mode, env in (("lookahead", "1"), ("sync", "0")):
        os.environ["ZSVC_EVAL_LOOKAHEAD"] = env
        times = [one_pass(1 + r)[0] for r in range(args.reps)]
        best = min(times)
        results[mode] = best
        print(json.dumps({
            "metric": f"eval_e2e_{mode}",
            "value": round(len(table) * args.n_clips / best, 2),
            "unit": "clips/s",
            "seconds_best": round(best, 3),
            "seconds_all": [round(t, 3) for t in times],
            "n_batches": n_batches,
            "dispatch_clips": eval_bs * args.n_clips,
        }), flush=True)
    os.environ.pop("ZSVC_EVAL_LOOKAHEAD", None)
    print(json.dumps({
        "metric": "eval_lookahead_speedup",
        "value": round(results["sync"] / results["lookahead"], 4),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
