"""SE(3) pose-graph optimization (BASELINE.json "pose-graph optimization").

Gauss-Newton over relative-pose constraints: node poses T_i = (R_i, t_i)
world->camera as [V,6] (rvec, tvec); an edge (i, j) with measured relative
transform Z_ij contributes the residual

    r_ij = log_SE3( Z_ij^-1 * T_j * T_i^-1 )        (6-vector)

Uses the shared LM core with the gauge fixed by pinning node 0 (its update
columns are masked).  Dense normal equations are fine at keyframe-graph
scale; observation sharding + psum is the distributed form (SURVEY.md
§2.5 "keyframe-window partitioning").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ransac_tpu.ops.rotation import exp_so3, log_so3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray      # [V,6] (rvec, tvec), world->camera
    edge_i: jnp.ndarray     # [E]
    edge_j: jnp.ndarray     # [E]
    edge_z: jnp.ndarray     # [E,6] measured relative pose j<-i (rvec, tvec)
    edge_w: jnp.ndarray     # [E] weights


def compose(a6: jnp.ndarray, b6: jnp.ndarray) -> jnp.ndarray:
    """SE(3) composition c = a * b in (rvec, tvec) form: R_c = R_a R_b,
    t_c = R_a t_b + t_a."""
    Ra = exp_so3(a6[..., :3])
    Rb = exp_so3(b6[..., :3])
    Rc = Ra @ Rb
    tc = jnp.einsum("...ij,...j->...i", Ra, b6[..., 3:6]) + a6[..., 3:6]
    return jnp.concatenate([log_so3(Rc), tc], axis=-1)


def invert(a6: jnp.ndarray) -> jnp.ndarray:
    Ra = exp_so3(a6[..., :3])
    Rinv = jnp.swapaxes(Ra, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, a6[..., 3:6])
    return jnp.concatenate([log_so3(Rinv), tinv], axis=-1)


def relative(a6: jnp.ndarray, b6: jnp.ndarray) -> jnp.ndarray:
    """T_b * T_a^-1 — the relative transform taking frame a to frame b."""
    return compose(b6, invert(a6))


def edge_residuals(g: PoseGraph, poses: jnp.ndarray) -> jnp.ndarray:
    pi = poses[g.edge_i]
    pj = poses[g.edge_j]
    pred = relative(pi, pj)
    err = compose(invert(g.edge_z), pred)
    return err * g.edge_w[:, None]


@partial(jax.jit, static_argnames=("max_iters",))
def optimize_pose_graph(g: PoseGraph, max_iters: int = 30,
                        damping_init: float = 1e-4):
    """LM over all node poses with node 0 pinned.  Returns (poses, cost,
    iterations)."""
    V = g.poses.shape[0]

    def flat_residual(x):
        poses = x.reshape(V, 6)
        # Pin node 0 to its initial value.
        poses = poses.at[0].set(g.poses[0])
        return edge_residuals(g, poses).reshape(-1)

    from ransac_tpu.ops.lm import levenberg_marquardt

    res = levenberg_marquardt(
        flat_residual, g.poses.reshape(-1), max_iters=max_iters,
        damping_init=damping_init)
    poses = res.x.reshape(V, 6).at[0].set(g.poses[0])
    return poses, res.cost, res.iterations
