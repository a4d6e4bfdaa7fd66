"""Zero-shot video classification as a serving tool.

The reference's user story ends at dataset-level evaluation; deploying the
trained regressor as an actual classifier (the paper's end product — embed a
clip, nearest class name wins, /root/reference/main.py:316-325) required
hand-wiring its internals. This CLI packages that path: checkpoint + class
names + videos -> ranked predictions, one JSON line per video.

  python -m zeroshotvideoclassification_tpu.cli.infer \
      --weights runs/.../checkpoint.npz --network r2plus1d_18 \
      --classes "playing guitar" "riding a horse" "washing dishes" \
      --videos /data/clip1 /data/clip2.mp4 /data/clip3.npy

Inputs may be JPEG frame dirs (`<dir>/images/img_%05d.jpg`, the reference's
Kinetics layout), video files (cv2 decode), or pre-extracted `.npy` clip
stacks — the same three loaders the training pipeline uses, auto-detected
per path. Class names go through the same name->words->word2vec-mean
embedding rules as training (`--class_rule` picks the rule set); scores are
cosine similarities on the device (ops/cdist.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import List, Optional, Sequence

import numpy as np


from zeroshotvideoclassification_tpu.data.decode import detect_loader  # noqa: F401  (public re-export; loaders live with the decoders)


def build_class_embeddings(class_names: Sequence[str], rule: str,
                           args) -> np.ndarray:
    """[C, 300] unit rows via the training-time embedding path."""
    from zeroshotvideoclassification_tpu.text import (
        classes2embedding,
        load_word2vec,
    )

    if args.synthetic_word2vec:
        from zeroshotvideoclassification_tpu.text.word2vec import (
            SyntheticWordVectors,
        )

        wv = SyntheticWordVectors()
    else:
        wv = load_word2vec(args.word2vec_path, args.word2vec_cache)
    return classes2embedding(rule, class_names, wv)


def build_scoring_state(network: str, head: str, weights: Optional[str],
                        config):
    """(model, state, eval_step) for inference — shared by this CLI and the
    serving front-end (serve/engine.py). Checkpoint semantics: strict
    full-checkpoint load first; KeyError/ValueError (no __meta__ /
    section mismatch) falls back to a non-strict port, which must load at
    least one tensor; other errors propagate — silently scoring a
    random-init model is the failure mode the strict path prevents."""
    import jax

    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        load_checkpoint,
        make_eval_step,
        make_optimizer,
        warm_start,
    )

    model = get_network(config)
    state = create_train_state(model, make_optimizer(config.lr),
                               jax.random.PRNGKey(0))
    if weights and weights != "none":
        try:  # full framework checkpoint (params + BN stats, strict)
            state, meta = load_checkpoint(
                weights, state, strict_sections=("params", "model_state"))
            print(f"LOADED CHECKPOINT: {weights} "
                  f"(epoch {meta.get('epoch')}, acc {meta.get('accuracy')})",
                  file=sys.stderr)
        except (KeyError, ValueError):
            params, mstate, n = warm_start(
                weights, state.params, state.model_state,
                network=network, head=head)
            if n == 0:
                raise SystemExit(
                    f"--weights {weights!r}: 0 tensors matched the "
                    f"--network {network!r} / --head {head!r} "
                    f"layout; refusing to score a random-init model")
            state = dataclasses.replace(state, params=params,
                                        model_state=mstate)
            print(f"LOADED MODEL: {weights} ({n} tensors)", file=sys.stderr)
    else:
        print("WARNING: no --weights; scoring a random-init model",
              file=sys.stderr)
    from zeroshotvideoclassification_tpu.config import compute_jnp_dtype

    return model, state, make_eval_step(
        model, compute_dtype=compute_jnp_dtype(config.compute_dtype))


def classify_videos(
    videos: Sequence[str],
    class_names: Sequence[str],
    class_embed: np.ndarray,
    args,
) -> List[dict]:
    """Embed every video (n_clips TSN windows, clip-mean) and rank classes."""
    import jax
    import jax.numpy as jnp

    from zeroshotvideoclassification_tpu.config import Config
    from zeroshotvideoclassification_tpu.data.datasets import VideoTable
    from zeroshotvideoclassification_tpu.data.pipeline import (
        HostPipeline,
        device_batch,
        transform_out_dtype,
    )
    from zeroshotvideoclassification_tpu.ops.cdist import cosine_distances

    config = Config(network=args.network, head=args.head, bs=args.bs,
                    clip_len=args.clip_len, size=args.size,
                    n_clips=args.n_clips,
                    compute_dtype=args.compute_dtype,
                    decode_scale=args.decode_scale)
    model, state, eval_step = build_scoring_state(
        args.network, args.head, args.weights, config)

    # group by loader so each group is one homogeneous VideoTable; results
    # are keyed by POSITION in --videos (a path listed twice gets a result
    # in every slot, not just the last)
    results = [None] * len(videos)
    by_loader = {}
    for pos, v in enumerate(videos):
        by_loader.setdefault(detect_loader(v), []).append((pos, v))
    for loader, entries in by_loader.items():
        positions = [pos for pos, _ in entries]
        paths = [v for _, v in entries]
        table = VideoTable(
            name="infer", fnames=np.asarray(paths, object),
            label_idx=np.zeros(len(paths), np.int32),
            classes=list(class_names), class_embed=class_embed,
            loader=loader, is_validation=True, n_clips=args.n_clips)
        pipe = HostPipeline(table, config, args.bs, seed=0)
        embs, weights = [], []
        for host in pipe:
            batch = device_batch(host, table.n_clips, config.clip_len,
                                 out_dtype=transform_out_dtype(config))
            embs.append(np.asarray(jax.device_get(
                eval_step(state.params, state.model_state, batch["x"]))))
            weights.append(np.asarray(jax.device_get(batch["weight"])))
        emb = np.concatenate(embs)[:len(paths)]
        ok = np.concatenate(weights)[:len(paths)] > 0
        dist = np.asarray(jax.device_get(
            cosine_distances(jnp.asarray(emb), jnp.asarray(class_embed))))
        rank = np.argsort(dist, axis=1)
        k = min(args.top_k, len(class_names))
        for i, (pos, path) in enumerate(zip(positions, paths)):
            if not ok[i]:
                results[pos] = {"video": path,
                                "error": "decode failed"}
                continue
            results[pos] = {
                "video": path,
                "top_class": class_names[int(rank[i, 0])],
                "topk": [
                    {"class": class_names[int(c)],
                     "similarity": round(float(1.0 - dist[i, c]), 6)}
                    for c in rank[i, :k]
                ],
            }
    return results


def add_class_and_model_args(p: argparse.ArgumentParser) -> None:
    """Class-embedding + model flags shared with cli/serve.py."""
    p.add_argument("--classes", nargs="*", default=None,
                   help="candidate class names (zero-shot: any names)")
    p.add_argument("--classes_file", default=None,
                   help="file with one class name per line")
    p.add_argument("--class_rule", default="kinetics",
                   choices=["ucf101", "hmdb51", "kinetics", "activitynet",
                            "sun"],
                   help="name->words rule set (text/class_names.py)")
    p.add_argument("--weights", default="none")
    p.add_argument("--network", default="r2plus1d_18")
    p.add_argument("--head", default="mlp")
    p.add_argument("--n_clips", type=int, default=4,
                   help="TSN windows per video (clip-mean pooled)")
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--decode_scale", type=int, default=1,
                   choices=[1, 2, 4, 8],
                   help="max libjpeg DCT-scale denominator for frame-dir "
                        "JPEG decode (1 = exact reference decode parity; "
                        "docs/TUNING.md)")
    p.add_argument("--word2vec_path",
                   default="./assets/GoogleNews-vectors-negative300.bin")
    p.add_argument("--word2vec_cache", default="./assets/word2vec_cache.npz")
    p.add_argument("--synthetic_word2vec", action="store_true",
                   help="deterministic hash embeddings (no word2vec asset; "
                        "tests/smoke only)")
    p.add_argument("--class_embed", default=None,
                   help="precomputed class embeddings: .npz with 'classes' "
                        "and 'embeddings' [C,300] (skips word2vec)")


def resolve_classes(args):
    """(class_names, class_embed [C,300] unit rows) from the shared flags."""
    if args.class_embed:
        z = np.load(args.class_embed, allow_pickle=False)
        class_names = [str(c) for c in z["classes"]]
        class_embed = np.asarray(z["embeddings"], np.float32)
        if class_embed.ndim != 2 or len(class_names) != len(class_embed):
            raise SystemExit("--class_embed: need classes[C], embeddings[C,D]")
        class_embed /= np.maximum(
            np.linalg.norm(class_embed, axis=1, keepdims=True), 1e-12)
    else:
        class_names = list(args.classes or [])
        if args.classes_file:
            with open(args.classes_file) as f:
                class_names += [l.strip() for l in f if l.strip()]
        if not class_names:
            raise SystemExit("no classes: pass --classes, --classes_file "
                             "or --class_embed")
        class_embed = build_class_embeddings(class_names, args.class_rule,
                                             args)
    return class_names, class_embed


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Zero-shot classify videos against arbitrary class names")
    p.add_argument("--videos", nargs="+", required=True,
                   help="frame dirs / video files / .npy clip stacks")
    add_class_and_model_args(p)
    args = p.parse_args(argv)
    from zeroshotvideoclassification_tpu.utils.xla_tuning import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    class_names, class_embed = resolve_classes(args)
    results = classify_videos(args.videos, class_names, class_embed, args)
    for r in results:
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
