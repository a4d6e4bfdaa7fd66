"""On-device cosine retrieval: distance matrix + top-k class search.

Replaces the reference's CPU scipy `cdist(...,'cosine').argsort/argmin`
(/root/reference/main.py:316-325) and its vestigial faiss dependency with a
single MXU matmul + `lax.top_k`. For N test clips vs C classes the cosine
distance matrix is 1 - A_n @ B_n^T where rows are unit-normalized — one
[N, 300] x [300, C] matmul, which XLA tiles onto the MXU directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unit(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


@jax.jit
def cosine_distances(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, D] x [C, D] -> [N, C] pairwise cosine distances (scipy semantics)."""
    a32 = _unit(a.astype(jnp.float32))
    b32 = _unit(b.astype(jnp.float32))
    # precision='highest': class embeddings can be ~1e-3 apart in cosine
    # distance (tau=0.04 scale), so the default bf16-pass matmul (~4e-4 abs
    # error) could flip rankings; this matmul is tiny (N x 300 x C).
    return 1.0 - jnp.dot(
        a32, b32.T, preferred_element_type=jnp.float32, precision="highest"
    )


@jax.jit
def nearest_class(pred: jax.Array, class_embed: jax.Array) -> jax.Array:
    """argmin cosine distance -> [N] int32 class indices (main.py:321-322)."""
    return jnp.argmin(cosine_distances(pred, class_embed), axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_classes(pred: jax.Array, class_embed: jax.Array, k: int = 5) -> jax.Array:
    """k nearest classes by cosine distance -> [N, min(k, C)] int32 (ties:
    larger similarity first, matching argsort-of-distance order for distinct
    values; k clamps to the class count like argsort[:, :5] does)."""
    sim = -cosine_distances(pred, class_embed)
    _, idx = jax.lax.top_k(sim, min(k, sim.shape[1]))
    return idx.astype(jnp.int32)
