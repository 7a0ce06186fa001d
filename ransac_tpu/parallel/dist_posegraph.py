"""Edge-sharded distributed pose-graph optimization.

SURVEY.md §2.5 "keyframe-window partitioning" applied to the pose graph
(BASELINE.json "pose-graph optimization"): EDGES shard over the mesh
``data`` axis (node poses are tiny and replicated), each shard computes
its edges' residuals and dense Gauss-Newton normal-equation blocks, and
ONE ``psum`` of the [6V, 6V] / [6V] system per iteration is the only
cross-shard traffic — the damped solve then runs replicated on every
device.  At keyframe-graph scale (V in the hundreds) the dense normal
equations are a few MB; the psum rides ICI.

Padding edges carry weight 0 and contribute exactly nothing, so the
device count never changes the optimum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ransac_tpu.ba.posegraph import (PoseGraph, PoseGraphSim3,
                                     edge_residuals, edge_residuals_sim3)


def _pad_edges(g: PoseGraph, mult: int) -> PoseGraph:
    E = int(g.edge_i.shape[0])
    pad = (-E) % mult
    if pad == 0:
        return g
    zi = jnp.zeros(pad, g.edge_i.dtype)
    return g._replace(
        edge_i=jnp.concatenate([g.edge_i, zi]),
        edge_j=jnp.concatenate([g.edge_j, zi]),
        edge_z=jnp.concatenate(
            [g.edge_z, jnp.zeros((pad, 6), g.edge_z.dtype)]),
        edge_w=jnp.concatenate(
            [g.edge_w, jnp.zeros(pad, g.edge_w.dtype)]))


@partial(jax.jit, static_argnames=("mesh", "n_iters"))
def distributed_pose_graph(g: PoseGraph, mesh: Mesh, n_iters: int = 20,
                           damping: float = 1e-4):
    """LM over node poses with node 0 pinned, edges sharded over the
    mesh ``data`` axis.  Returns ``(poses [V,6], cost)``; bit-for-bit
    deterministic given the mesh (the psum'd system is replicated and
    every device runs the identical solve)."""
    V = g.poses.shape[0]
    nd = mesh.shape["data"]
    g = _pad_edges(g, nd)

    def shard_fn(poses0, ei, ej, ez, ew):
        psum = lambda x: jax.lax.psum(x, "data")

        def res_fn(x):
            poses = x.reshape(V, 6)
            poses = poses.at[0].set(poses0[0])
            pg = PoseGraph(poses, ei, ej, ez, ew)
            return edge_residuals(pg, poses).reshape(-1)

        fix = jnp.ones((V * 6,), poses0.dtype).at[:6].set(0.0)

        def one_iter(state, _):
            x, lam, cost = state
            r = res_fn(x)
            J = jax.jacfwd(res_fn)(x)                     # [6E_s, 6V]
            JtJ = psum(J.T @ J)
            Jtr = psum(J.T @ r)
            dU = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
            A = JtJ + lam * jnp.diag(dU)
            # Pin node 0: zero its rows/cols, unit diagonal.
            A = A * fix[:, None] * fix[None, :] + jnp.diag(1.0 - fix)
            b = -Jtr * fix
            dx = jnp.linalg.solve(A, b)
            x_new = x + dx * fix
            cost_new = psum(0.5 * jnp.sum(res_fn(x_new) ** 2))
            accept = cost_new < cost
            x = jnp.where(accept, x_new, x)
            lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-12),
                            jnp.minimum(lam * 5.0, 1e8))
            cost = jnp.where(accept, cost_new, cost)
            return (x, lam, cost), cost

        c0 = psum(0.5 * jnp.sum(res_fn(poses0.reshape(-1)) ** 2))
        (x, lam, cost), _ = jax.lax.scan(
            one_iter,
            (poses0.reshape(-1), jnp.asarray(damping, poses0.dtype), c0),
            None, length=n_iters)
        return x.reshape(V, 6), cost

    poses, cost = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )(g.poses, g.edge_i, g.edge_j, g.edge_z, g.edge_w)
    return poses.at[0].set(g.poses[0]), cost


def _pad_edges_sim3(g: PoseGraphSim3, mult: int) -> PoseGraphSim3:
    E = int(g.edge_i.shape[0])
    pad = (-E) % mult
    if pad == 0:
        return g
    zi = jnp.zeros(pad, g.edge_i.dtype)
    return g._replace(
        edge_i=jnp.concatenate([g.edge_i, zi]),
        edge_j=jnp.concatenate([g.edge_j, zi]),
        edge_z=jnp.concatenate(
            [g.edge_z, jnp.zeros((pad, 7), g.edge_z.dtype)]),
        edge_w=jnp.concatenate(
            [g.edge_w, jnp.zeros(pad, g.edge_w.dtype)]),
        edge_sw=jnp.concatenate(
            [g.edge_sw, jnp.zeros(pad, g.edge_sw.dtype)]))


@partial(jax.jit, static_argnames=("mesh", "n_iters"))
def distributed_pose_graph_sim3(g: PoseGraphSim3, mesh: Mesh,
                                n_iters: int = 30,
                                damping: float = 1e-4):
    """Sim(3) mirror of ``distributed_pose_graph`` (VERDICT r4 #5): the
    monocular loop-closing graph the single-device pipeline actually
    uses (7-dof nodes carrying log-scale; odometry edges with
    ``edge_sw = 0`` leave relative scale unobserved, loop closures with
    ``edge_sw = 1`` pin it).  Same shape: edges shard over ``data``,
    one psum of the [7V, 7V] Gauss-Newton system + scalar cost per
    iteration is the only cross-shard traffic, every device runs the
    identical replicated damped solve.  Node 0 pins the 7-dof similarity
    gauge (rotation + translation + global scale)."""
    V = g.poses.shape[0]
    nd = mesh.shape["data"]
    g = _pad_edges_sim3(g, nd)

    def shard_fn(poses0, ei, ej, ez, ew, esw):
        psum = lambda x: jax.lax.psum(x, "data")

        def res_fn(x):
            poses = x.reshape(V, 7)
            poses = poses.at[0].set(poses0[0])
            pg = PoseGraphSim3(poses, ei, ej, ez, ew, esw)
            return edge_residuals_sim3(pg, poses).reshape(-1)

        fix = jnp.ones((V * 7,), poses0.dtype).at[:7].set(0.0)

        def one_iter(state, _):
            x, lam, cost = state
            r = res_fn(x)
            J = jax.jacfwd(res_fn)(x)                     # [7E_s, 7V]
            JtJ = psum(J.T @ J)
            Jtr = psum(J.T @ r)
            dU = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
            A = JtJ + lam * jnp.diag(dU)
            A = A * fix[:, None] * fix[None, :] + jnp.diag(1.0 - fix)
            b = -Jtr * fix
            dx = jnp.linalg.solve(A, b)
            x_new = x + dx * fix
            cost_new = psum(0.5 * jnp.sum(res_fn(x_new) ** 2))
            accept = cost_new < cost
            x = jnp.where(accept, x_new, x)
            lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-12),
                            jnp.minimum(lam * 5.0, 1e8))
            cost = jnp.where(accept, cost_new, cost)
            return (x, lam, cost), cost

        c0 = psum(0.5 * jnp.sum(res_fn(poses0.reshape(-1)) ** 2))
        (x, lam, cost), _ = jax.lax.scan(
            one_iter,
            (poses0.reshape(-1), jnp.asarray(damping, poses0.dtype), c0),
            None, length=n_iters)
        return x.reshape(V, 7), cost

    poses, cost = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                  P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )(g.poses, g.edge_i, g.edge_j, g.edge_z, g.edge_w, g.edge_sw)
    return poses.at[0].set(g.poses[0]), cost
