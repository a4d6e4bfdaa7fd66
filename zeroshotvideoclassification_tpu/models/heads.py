"""Embedding heads + the user-facing ZeroShotModel bundle.

Head variants (selected by Config.head / Config.network):
  * 'mlp'    — the active fork head (/root/reference/network.py:517,595-600):
               mean-pool layer4 features -> MLP(512, 512, 300, 2 layers) ->
               L2 normalize. (The reference's dead TransformerEncoder params,
               network.py:500-514, are intentionally NOT re-created: quirk #7.)
  * 'linear' — the upstream paper head (network.py:50-80): clip-mean pooled
               features -> dropout(0.05) -> Linear(512, 300) -> L2 normalize.
  * C3D      — relu(fc6) -> dropout(0.10) -> clip-mean -> Linear(4096, 300)
               -> L2 normalize (network.py:143-180).

Multi-clip handling (`clip_pool`):
  * 'feature' (default) — clip-mean applied to FEATURES before the head (the
    upstream/paper semantics, network.py:76; the fork's MLP head only ever
    saw n_clips=1 in training, where the two orders coincide).
  * 'embedding' — fork-style per-clip head: head + L2-normalize per clip,
    then mean over clips and re-normalize (network.py:595-600 ran the head on
    every clip row with no clip-mean anywhere). Identical at n_clips=1,
    divergent for n_clips>1 — the escape hatch for reproducing fork behavior
    with multi-clip training/eval. The C3D head always clip-means features
    (its own documented order, network.py:168-178).

`fixconvs` freezes the backbone via stop_gradient on its outputs — exact
torch requires_grad=False semantics (BN batch statistics still update in
train mode, matching the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from zeroshotvideoclassification_tpu.models import layers as L
from zeroshotvideoclassification_tpu.models.c3d import C3DBackbone
from zeroshotvideoclassification_tpu.models.resnet3d import (
    VideoResNet,
    mc3_18,
    r2plus1d_18,
    r3d_18,
)

EMBED_DIM = 300


@dataclasses.dataclass(frozen=True)
class ZeroShotModel:
    """backbone + embedding head; input [B, n_clips, T, H, W, 3] uint8-normed."""

    backbone: object  # VideoResNet | C3DBackbone
    head: str         # 'mlp' | 'linear' | 'c3d'
    fixconvs: bool = False
    dropout_rate: float = 0.0
    clip_pool: str = "feature"  # 'feature' | 'embedding' (see module doc)

    def init(self, rng) -> Tuple[Dict, Dict]:
        kb, k1, k2 = jax.random.split(rng, 3)
        bb_params, bb_state = self.backbone.init(kb)
        f = self.backbone.feature_dim
        if self.head == "mlp":
            head_params = {
                "fc1": L.torch_linear_init(k1, f, f),
                "fc2": L.torch_linear_init(k2, f, EMBED_DIM),
            }
        elif self.head in ("linear", "c3d"):
            head_params = {"regressor": L.torch_linear_init(k1, f, EMBED_DIM)}
        else:
            raise ValueError(f"unknown head {self.head!r}")
        return (
            {"backbone": bb_params, "head": head_params},
            {"backbone": bb_state},
        )

    def apply(
        self,
        params,
        state,
        x: jax.Array,  # [B, nc, T, H, W, 3]
        train: bool,
        rng: Optional[jax.Array] = None,
        compute_dtype=jnp.bfloat16,
    ):
        """-> (embeddings [B, 300] unit-norm fp32, new_state)."""
        b, nc = x.shape[0], x.shape[1]
        xf = x.reshape((b * nc,) + x.shape[2:])
        pooled, _featmap, bb_state = self.backbone.apply(
            params["backbone"], state["backbone"], xf, train, compute_dtype)
        if self.fixconvs:
            pooled = jax.lax.stop_gradient(pooled)

        hp = params["head"]
        if self.head == "c3d":
            # relu already applied by backbone fc6; dropout BEFORE clip-mean
            # (network.py:166-178)
            feats = L.dropout(pooled, self.dropout_rate, rng, train)
            feats = feats.reshape(b, nc, -1).mean(axis=1)
            emb = L.linear(feats, hp["regressor"], jnp.float32)
        elif self.head == "linear":
            feats = self._pool_feats(pooled, b, nc)
            feats = L.dropout(feats, self.dropout_rate, rng, train)
            emb = L.linear(feats, hp["regressor"], jnp.float32)
        else:  # mlp
            feats = self._pool_feats(pooled, b, nc)
            h = L.relu(L.linear(feats, hp["fc1"], jnp.float32))
            emb = L.linear(h, hp["fc2"], jnp.float32)
        if self.clip_pool == "embedding" and self.head != "c3d":
            # fork-style: the head ran per clip; average the unit embeddings
            # and re-normalize (identical to 'feature' at n_clips=1)
            emb = L.l2_normalize(emb).reshape(b, nc, -1).mean(axis=1)
        return L.l2_normalize(emb), {"backbone": bb_state}

    def _pool_feats(self, pooled, b, nc):
        if self.clip_pool == "embedding":
            return pooled  # keep per-clip rows; pooling happens post-head
        return pooled.reshape(b, nc, -1).mean(axis=1)


def get_network(config) -> ZeroShotModel:
    """Backbone/head routing with reference CLI parity.

    Reference routing (network.py:24-44): substring match 'r3d' / '2plus1d' /
    'c3d'; 'resnet18' was advertised but unroutable (quirk #9) — here it maps
    to the upstream design it referred to: an R3D-18 with the linear head.
    """
    name = config.network
    head = getattr(config, "head", "mlp")
    dropout = 0.0
    if "c3d" in name:
        backbone, head, dropout = C3DBackbone(), "c3d", 0.10
    elif "2plus1d" in name:
        backbone = r2plus1d_18()
    elif "mc3" in name:
        backbone = mc3_18()
    elif "r3d" in name:
        backbone = r3d_18()
    elif "resnet18" in name:
        backbone, head = r3d_18(), "linear"
    else:
        raise ValueError(f"Network {name!r} not available!")
    remat = getattr(config, "remat", False)
    if str(remat) in ("False", "none", ""):
        remat = False  # normalize 'none' BEFORE branching: the VideoResNet
        # branch would otherwise map a truthy 'none' to remat='full'
    if remat and isinstance(backbone, VideoResNet):
        backbone = dataclasses.replace(
            backbone, remat="convs" if remat == "convs" else "full")
    elif remat:
        # the knob must not be silently dropped: a user chasing an HBM OOM
        # needs to know rematerialization is only implemented for the
        # VideoResNet families (C3D is the pretrained-only legacy net)
        import sys

        print(f"WARNING: --remat {remat} has no effect on {name!r} "
              f"(only the VideoResNet backbones rematerialize)",
              file=sys.stderr)
    if head == "linear":
        dropout = 0.05
    return ZeroShotModel(
        backbone=backbone, head=head,
        fixconvs=bool(getattr(config, "fixconvs", False)),
        dropout_rate=dropout,
        clip_pool=str(getattr(config, "clip_pool", "feature")),
    )
