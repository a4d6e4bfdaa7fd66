"""Checkpointing: full train-state save/restore + partial warm start.

Improves on the reference, which saves only model weights + accuracy and
restarts the LR schedule on resume (/root/reference/main.py:361-365; SURVEY
§5): here params, BN state, optimizer state, step and epoch are all saved.
Kept policies: best-by-mean-test-accuracy gating, and non-strict
intersect-and-update warm start (main.py:114-124).

Format: flat npz (leaf path -> array) + JSON metadata — dependency-free,
mmap-friendly, and stable across JAX versions.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _entry_str(p) -> str:
    """Version-independent string for one key-path entry.

    Handles every jax.tree_util key type explicitly (DictKey/
    FlattenedIndexKey carry .key, GetAttrKey carries .name, SequenceKey
    carries .idx) instead of falling back to str(entry), whose repr is a JAX
    implementation detail — namedtuple fields in optax state previously
    serialized as '.field' and would silently break strict restores if a JAX
    upgrade changed the repr."""
    for attr in ("key", "name", "idx"):
        v = getattr(p, attr, None)
        if v is not None:
            return str(v)
    return str(p)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_entry_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(template, flat: Dict[str, np.ndarray]):
    """Rebuild a pytree with `template`'s structure from flat arrays.
    Missing keys keep the template's value (non-strict load); extra keys are
    ignored. Returns (tree, n_loaded, n_total).

    The template only contributes structure, shapes and dtypes, so a
    jax.eval_shape ShapeDtypeStruct tree works too — callers that load
    every leaf they use (strict sections) never pay a real init."""
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    treedef = paths_leaves[1]
    loaded = 0
    new_leaves = []
    for path, leaf in paths_leaves[0]:
        key = "/".join(_entry_str(p) for p in path)
        if key in flat and flat[key].shape == np.shape(leaf):
            dtype = getattr(leaf, "dtype", None)
            if dtype is None:  # Python scalar leaf
                dtype = np.asarray(leaf).dtype
            new_leaves.append(flat[key].astype(dtype))
            loaded += 1
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), loaded, len(new_leaves)


def save_checkpoint(
    path: str,
    train_state,
    epoch: int,
    accuracy: float,
    config_json: Optional[str] = None,
) -> None:
    """Atomic write of the full train state."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {}
    for section in ("params", "model_state", "opt_state"):
        for k, v in _flatten(getattr(train_state, section)).items():
            payload[f"{section}::{k}"] = v
    payload["__step__"] = np.asarray(train_state.step)
    meta = {"epoch": epoch, "accuracy": float(accuracy)}
    if config_json:
        meta["config"] = json.loads(config_json)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta), **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_meta(path: str) -> Dict:
    """Checkpoint metadata (epoch, accuracy, config) without loading tensors."""
    with np.load(path, allow_pickle=False) as data:
        return json.loads(str(data["__meta__"]))


def load_checkpoint(
    path: str,
    train_state,
    strict_sections: Tuple[str, ...] = ("params", "model_state", "opt_state"),
    load_sections: Tuple[str, ...] = ("params", "model_state", "opt_state"),
) -> Tuple[Any, Dict]:
    """Restore a full TrainState (structure from `train_state`).

    STRICT for `strict_sections`: every leaf must be present in the
    checkpoint with a matching shape, otherwise ValueError — a checkpoint
    from a different network/head silently scoring random weights is exactly
    the failure mode this guards against. Evaluation-only restores pass
    strict_sections=("params", "model_state") so optimizer-layout changes
    across framework versions don't block scoring old checkpoints. Use
    warm_start() for deliberately partial weight loads.

    `load_sections` limits which sections are READ at all: npz members are
    lazy, so a section left out never touches disk and its tree keeps the
    template's leaves verbatim. Serving's /reload passes
    ("params", "model_state") — eagerly reading and converting Adam's m/v
    moments (~2x the param bytes) only to discard them would roughly triple
    the I/O of every hot-swap."""
    missing = set(strict_sections) - set(load_sections)
    if missing:
        raise ValueError(f"strict_sections {sorted(missing)} are not in "
                         f"load_sections — they could never be verified")
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    sections = {sec: {} for sec in load_sections}
    for k in data.files:
        if "::" in k:
            sec, key = k.split("::", 1)
            if sec in sections:
                sections[sec][key] = data[k]
    new = {}
    for sec, flat in sections.items():
        tree, loaded, total = _unflatten_into(getattr(train_state, sec), flat)
        if loaded != total and sec in strict_sections:
            raise ValueError(
                f"checkpoint {path!r} does not match the current model: only "
                f"{loaded}/{total} {sec} tensors restored (wrong --network/"
                f"--head?). Use --weights for a partial warm start.")
        new[sec] = tree
    import dataclasses

    return (
        dataclasses.replace(
            train_state, step=jax.numpy.asarray(data["__step__"]), **new),
        meta,
    )


def warm_start(
    path: str,
    params,
    model_state=None,
    network: str = "r2plus1d_18",
    head: str = "mlp",
):
    """Non-strict partial load (--weights semantics, main.py:114-124:
    intersect keys, update, keep the rest).

    Accepts framework npz checkpoints AND torch sources directly
    (.pth/.pth.tar/.pickle: torchvision video-resnet weights, c3d.pickle,
    or a full reference fork checkpoint — ported in-memory via
    models.porting; `network`/`head` select the target layout).

    Returns (params, n_loaded), or (params, model_state, n_loaded) when
    `model_state` is given — BN running statistics are warm-started too,
    which pretrained evaluation quality depends on."""
    if path.endswith((".pth", ".pth.tar", ".pickle", ".pkl")):
        from zeroshotvideoclassification_tpu.models.porting import port_file

        p_tree, s_tree = port_file(path, network, head)
        p_flat, s_flat = _flatten(p_tree), _flatten(s_tree)
    else:
        data = np.load(path, allow_pickle=False)
        p_flat = {k.split("::", 1)[1]: data[k] for k in data.files
                  if k.startswith("params::")}
        s_flat = {k.split("::", 1)[1]: data[k] for k in data.files
                  if k.startswith("model_state::")}
    tree, loaded, _ = _unflatten_into(params, p_flat)
    if model_state is None:
        return tree, loaded
    state_tree, s_loaded, _ = _unflatten_into(model_state, s_flat)
    return tree, state_tree, loaded + s_loaded
