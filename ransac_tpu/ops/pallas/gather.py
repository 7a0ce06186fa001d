"""Vector gather-from-scalars helpers shared by the fused sweep kernels.

The sweep kernels must materialize, per hypothesis lane, the coordinates of
its sampled points: a gather of scalar-memory values at a *vector* of
indices, which Mosaic has no native instruction for.  The original kernels
used one-hot accumulation — ``acc += where(ind == n, ref[n], 0)`` over all
N points — costing 3 vector ops per point per gathered column
(~600 ops/hypothesis at N=13 x 16 columns, the single largest op block in
the homography sweep).

``tree_gather`` replaces that with a log2 selection tree on the index bits:
the bit masks are computed once per index vector (3 ops per level) and each
gathered column costs at most 2^ceil(log2 N) - 1 selects (13 at N=13, with
invalid-subtree pruning).  For the homography kernel's 16 columns this is
~4x fewer vector ops than one-hot accumulation, and the tree's levels are
independent across columns (good ILP).

Correctness of pruning: a node whose right subtree contains no index
< n_points can pass its left value through unconditionally, because the
runtime index is always < n_points and therefore never routes into the
invalid subtree.
"""

from __future__ import annotations

import jax.numpy as jnp


def index_bit_masks(ind, n_points: int):
    """Boolean select masks for each index bit, lowest first.

    ``ind``: integer vector of sampled point indices in [0, n_points).
    Returns a list of ceil(log2(n_points)) boolean vectors.
    """
    levels = max((n_points - 1).bit_length(), 1)
    return [((ind >> k) & 1) != 0 for k in range(levels)]


def tree_gather(bit_masks, values, n_points: int):
    """Gather ``values[ind]`` for the vector index encoded by ``bit_masks``.

    ``values``: list of >= n_points scalars (SMEM reads); entries beyond
    n_points are never selected.  Returns one vector shaped like the masks.
    """
    levels = len(bit_masks)
    size = 1 << levels
    pad = values[0]
    lvl = [(values[n] if n < len(values) else pad, n < n_points)
           for n in range(size)]
    for k in range(levels):
        nxt = []
        for i in range(len(lvl) // 2):
            a, va = lvl[2 * i]
            b, vb = lvl[2 * i + 1]
            if va and vb:
                nxt.append((jnp.where(bit_masks[k], b, a), True))
            else:
                # Right subtree has no valid leaf: indices < n_points can
                # never route there, so pass the left value through.
                nxt.append((a, va))
        lvl = nxt
    return lvl[0][0]


def tree_gather_many(ind, columns, n_points: int):
    """Gather several scalar columns at one shared index vector.

    ``columns``: list of scalar lists (each >= n_points long).  The index
    bit masks are computed once and shared.  Returns one vector per column.
    """
    bm = index_bit_masks(ind, n_points)
    return [tree_gather(bm, vals, n_points) for vals in columns]
