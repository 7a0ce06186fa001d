"""Counter-based PRNG helpers for hypothesis sampling.

The reference relies on OpenCV's hidden global RANSAC RNG; here every random
choice flows from an explicit ``jax.random`` key so runs are reproducible and
hypothesis batches can be sharded deterministically across devices (each
shard folds in its mesh position).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_for(seed: int, *folds: int) -> jax.Array:
    key = jax.random.key(seed)
    for f in folds:
        key = jax.random.fold_in(key, f)
    return key


def sample_without_replacement(
    key: jax.Array, num_samples: int, sample_size: int, num_points: int,
    point_mask: jax.Array | None = None,
) -> jnp.ndarray:
    """[S, k] index tensor of uniform k-subsets of the valid points.

    Uses the top-k-of-uniforms trick (first k of a random permutation), which
    is branch-free, shape-static, and vmappable — the TPU-native replacement
    for OpenCV's sequential rejection sampler.  Masked-out points get -inf
    priority so they are never chosen (requires >= sample_size valid points).
    """
    u = jax.random.uniform(key, (num_samples, num_points))
    if point_mask is not None:
        u = jnp.where(point_mask[None, :] > 0, u, -jnp.inf)
    _, idx = jax.lax.top_k(u, sample_size)
    return idx
