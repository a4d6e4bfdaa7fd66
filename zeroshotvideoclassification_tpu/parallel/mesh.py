"""Mesh + sharding-spec helpers (pjit-style SPMD data/tensor parallelism)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a device mesh; -1 in `shape` absorbs the remaining devices.

    Every available device must be used: a fixed axis that does not divide
    the device count used to silently DROP the remainder (e.g. --tp 3 on 8
    chips idled 2 of them with no signal), and an oversized axis crashed
    inside np.reshape with an opaque message. Both are clear errors now;
    pass `devices` explicitly to run on a deliberate subset."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if shape.count(-1) > 1:
        raise ValueError(f"mesh shape {tuple(shape)}: at most one axis "
                         f"may be -1")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if known <= 0 or n % known:
            raise ValueError(
                f"mesh shape {tuple(shape)} over axes {tuple(axes)}: the "
                f"fixed axes multiply to {known}, which does not divide "
                f"the {n} available devices — the remainder would sit idle")
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    if total != n:
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {total} devices but {n} are "
            f"available; pass devices= explicitly to use a subset")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _tp_spec_for(mesh: Mesh):
    """Path-based sharding rule shared by param_shardings/state_shardings."""
    has_model_axis = "model" in mesh.axis_names and mesh.shape["model"] > 1

    def spec_for(path, leaf) -> NamedSharding:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if has_model_axis and "head" in names and np.ndim(leaf) >= 1:
            if "fc1" in names:
                return NamedSharding(
                    mesh, P(*([None] * (np.ndim(leaf) - 1)), "model"))
            if "fc2" in names and np.ndim(leaf) == 2:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return spec_for


def param_shardings(params, mesh: Mesh):
    """Sharding pytree for model params.

    Backbone: fully replicated (18-layer conv nets are small; DP is the win).
    Head linears: tensor-parallel over 'model' when that axis exists —
    fc1 column-sharded [F, F/mp], fc2 row-sharded [F/mp, 300]; XLA inserts the
    all-reduce between them. With no 'model' axis, everything is replicated.
    """
    return jax.tree_util.tree_map_with_path(_tp_spec_for(mesh), params)


def state_shardings(state, mesh: Mesh):
    """Sharding pytree for a WHOLE train state (params + BN state + optimizer
    state + step), by the same path rule as param_shardings: Adam's mu/nu
    trees mirror the params dict key-for-key, so the optimizer moments of a
    tensor-parallel weight shard consistently with the weight they update
    (an fc1 column shard's moments live on the same devices as the shard).
    Everything without a tensor-parallel rule — backbone, BN stats,
    schedule scalars — is replicated. With no 'model' axis this degenerates
    to fully replicated placement."""
    return jax.tree_util.tree_map_with_path(_tp_spec_for(mesh), state)


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch axis sharded on 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )
