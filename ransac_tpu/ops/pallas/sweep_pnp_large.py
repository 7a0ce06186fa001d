"""Large-N fully-fused P3P-RANSAC sweep (counter-replay variant).

The 16-point P3P sweep (``ops.pallas.sweep_pnp``) gathers minimal samples
with a log2 selection tree and packs winner indices in 4-bit fields — both
stop scaling past ~16 points.  SfM registration (``pipelines.sfm``) runs
PnP against hundreds of map correspondences, so this variant extends the
fused pose path to pools of up to 512 points using the same machinery the
large-N homography sweep (``ops.pallas.sweep_large``) proved out:

- **In-kernel counter sampling over a dynamic pool size** — the murmur3
  counter hash + exact-scale 24-bit float range reduction + Fisher-Yates
  shifts (shared with ``sweep_large``; replayable bit-identically in XLA).
  ``n_valid`` arrives as an SMEM scalar: masked points never enter a
  sample with no host-side recompile.
- **In-kernel one-hot gather** — one ``fori_loop`` over the SMEM point
  table accumulates the 3 sampled world points + unit bearings per lane.
- **Grunert P3P in registers** (same solve as ``sweep_pnp``): resultant
  quartic by Newton-from-Fujiwara-bound resolvent cubic + Ferrari (approx-
  reciprocal throughout), Newton depth polish through an unrolled adjugate
  3x3 solve, shared-invariant triad absolute orientation — 4 candidate
  roots per sample, division-deferred scoring.
- **Per-root scoring fori_loop** over the full SMEM table (cheirality +
  truncated-MSAC + weighted inlier count), folded into TWO records per
  block (min-MSAC and lexicographic max-count) with the winning root id
  packed in the record's low 2 bits — ~24 B of HBM per 4096 hypotheses.

Replaces ``cv2.solvePnPRansac(iterationsCount=5000, ...)``
(``/root/reference/main_v1.py:497-502``) at map-registration scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ransac_tpu.ops.pallas.sweep_large import (
    UNROLL, WINDOW, _draw_seeds_n, _fmix, _fy_draws, _range_reduce,
    _shuffle_order_hash, _window_bases_hash, _wrap_mod)
from ransac_tpu.ops.pallas.sweep_pnp import (N_DEPTH_POLISH, _rcp,
                                             _solve_quartic_vec)

BLOCK_H = 4096
SUB = 8
MAX_POINTS = 512   # SMEM point table: N * 9 * 4 B (<= 18 KB)
N_ROOTS = 4

# Seed layout: 3 Fisher-Yates draw seeds + [3] window bases + [4] shuffle.
N_SEEDS = 5


def sample_indices3_for(flat, seeds, n_valid, block_h: int = BLOCK_H,
                        window: int = WINDOW):
    """[..., 3] pool-slot samples for flat hypothesis ids (XLA replay of
    the in-kernel sampler; identical results by construction).  Window
    bases are re-derived from ``flat // block_h`` (circular windows; see
    ``sweep_large.window_bases``)."""
    flat = jnp.asarray(flat)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    w_eff = jnp.minimum(jnp.int32(window), n_valid)
    block = (flat // block_h).astype(jnp.uint32)
    base_range = jnp.where(n_valid > jnp.int32(window), n_valid,
                           jnp.int32(1))
    wbase = _range_reduce(_fmix(block ^ seeds[3]), base_range)
    draws = _fy_draws(flat.astype(jnp.uint32), seeds, w_eff, k=3)
    return jnp.stack([_wrap_mod(wbase + d, n_valid) for d in draws],
                     axis=-1)


def _make_kernel(n_score: int, block_h: int, n_rows: int):
    LAN = block_h // SUB
    gather_rows = min(WINDOW, n_rows)

    def kernel(pts_ref, thr_ref, seed_ref, nv_ref, wb_ref, fbest_ref,
               ibest_ref):
        thr_sq = thr_ref[0]
        # ay = fy/fx anisotropy: pool py is pre-scaled host-side; each
        # pose's y-row is scaled below so du^2 + dv^2 is the true pixel
        # error / fx (pixel-true threshold, cv2 semantics).
        ay = thr_ref[1]
        n_valid = nv_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * block_h + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        # Draws live in the block's circular window of the shuffled pool
        # (see sweep_large.window_bases; identical to unwindowed sampling
        # whenever n_valid <= WINDOW).
        wbase = wb_ref[pl.program_id(0)]
        w_eff = jnp.minimum(jnp.int32(WINDOW), n_valid)
        idx = _fy_draws(flatu, [seed_ref[j] for j in range(3)], w_eff,
                        k=3)
        idx = [_wrap_mod(wbase + i, n_valid) for i in idx]

        # One-hot gather of the 3 sampled (world point, bearing) rows from
        # the SMEM table — only the WINDOW rows a block can sample from
        # (valid-first order: idx < n_valid only ever matches valid
        # rows).  Row layout: X Y Z fx fy fz px py w.  UNROLL rows per
        # trip (fori_loop trip overhead ~70 ns would dominate).
        def gbody(n, acc):
            acc = list(acc)
            for u in range(UNROLL):
                row = wbase + (UNROLL * n + u)
                row = _wrap_mod(row, n_valid)
                vals = [pts_ref[row, c] for c in range(6)]
                for j in range(3):
                    sel = idx[j] == row
                    acc[j] = tuple(
                        jnp.where(sel, vals[c], acc[j][c])
                        for c in range(6))
            return tuple(acc)

        zero = jnp.zeros((SUB, LAN), jnp.float32)
        acc0 = tuple((zero,) * 6 for _ in range(3))
        g = jax.lax.fori_loop(0, gather_rows // UNROLL, gbody, acc0)
        P = [[g[j][c] for c in range(3)] for j in range(3)]
        F = [[g[j][3 + c] for c in range(3)] for j in range(3)]

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        def sub3(a, b):
            return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]

        # Grunert P3P (identical math to sweep_pnp._make_kernel).
        cos_a = dot3(F[1], F[2])
        cos_b = dot3(F[0], F[2])
        cos_g = dot3(F[0], F[1])
        a2 = dot3(sub3(P[1], P[2]), sub3(P[1], P[2]))
        b2 = jnp.maximum(dot3(sub3(P[0], P[2]), sub3(P[0], P[2])), 1e-12)
        c2 = dot3(sub3(P[0], P[1]), sub3(P[0], P[1]))
        rb2 = _rcp(b2)
        ra = a2 * rb2
        rc = c2 * rb2

        qa2, qa1, qa0 = ra, -2.0 * ra * cos_b, ra
        qc2, qc1, qc0 = rc, -2.0 * rc * cos_b, rc
        n2 = 1.0 - qa2 + qc2
        n1 = -qa1 + qc1
        n0 = -qa0 - 1.0 + qc0
        p2_, p1_, p0_ = -qc2, -qc1, 1.0 - qc0
        d1, d0 = 2.0 * cos_a, -2.0 * cos_g

        c4 = n2 * n2 + p2_ * d1 * d1
        c3 = (2 * n2 * n1 - 2 * cos_g * (n2 * d1) + 2 * p2_ * d1 * d0
              + p1_ * d1 * d1)
        c2_ = (2 * n2 * n0 + n1 * n1 - 2 * cos_g * (n2 * d0 + n1 * d1)
               + p2_ * d0 * d0 + 2 * p1_ * d1 * d0 + p0_ * d1 * d1)
        c1 = (2 * n1 * n0 - 2 * cos_g * (n1 * d0 + n0 * d1)
              + p1_ * d0 * d0 + 2 * p0_ * d1 * d0)
        c0 = n0 * n0 - 2 * cos_g * (n0 * d0) + p0_ * d0 * d0
        c4s = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
        roots, root_ok = _solve_quartic_vec(
            c3 / c4s, c2_ / c4s, c1 / c4s, c0 / c4s)

        big = jnp.float32(3.4e38)
        sb = jnp.sqrt(b2)

        # World triad + scalar invariants shared with every root's camera
        # triad (rigidity: |C1-C0| = |P1-P0| etc. — see sweep_pnp).
        u1w = sub3(P[1], P[0])
        i1w = jax.lax.rsqrt(dot3(u1w, u1w) + 1e-30)
        e1w = [u1w[c] * i1w for c in range(3)]
        v1w = sub3(P[2], P[0])
        dw = dot3(v1w, e1w)
        vpw = [v1w[c] - dw * e1w[c] for c in range(3)]
        i2w = jax.lax.rsqrt(dot3(vpw, vpw) + 1e-30)
        e2w = [vpw[c] * i2w for c in range(3)]
        e3w = [e1w[1] * e2w[2] - e1w[2] * e2w[1],
               e1w[2] * e2w[0] - e1w[0] * e2w[2],
               e1w[0] * e2w[1] - e1w[1] * e2w[0]]
        ew = (e1w, e2w, e3w)
        cw = [(P[0][c] + P[1][c] + P[2][c]) / 3.0 for c in range(3)]

        def triad_cam(Pts):
            u1 = sub3(Pts[1], Pts[0])
            e1 = [u1[c] * i1w for c in range(3)]
            v1 = sub3(Pts[2], Pts[0])
            vp = [v1[c] - dw * e1[c] for c in range(3)]
            e2 = [vp[c] * i2w for c in range(3)]
            e3 = [e1[1] * e2[2] - e1[2] * e2[1],
                  e1[2] * e2[0] - e1[0] * e2[2],
                  e1[0] * e2[1] - e1[1] * e2[0]]
            return e1, e2, e3
        poses = []   # per root: (valid, R, t)
        for k in range(N_ROOTS):
            v = roots[k]
            D = d1 * v + d0
            N = (n2 * v + n1) * v + n0
            u = N * _rcp(jnp.where(jnp.abs(D) < 1e-9, 1e-9, D))
            s1 = sb * jax.lax.rsqrt(jnp.maximum(
                1.0 + v * v - 2.0 * v * cos_b, 1e-12))
            s2 = u * s1
            s3 = v * s1
            valid = (root_ok[k] & (v > 1e-6) & (u > 1e-6)
                     & (jnp.abs(D) > 1e-9))

            # Newton polish of depths on the law-of-cosines system.
            for _ in range(N_DEPTH_POLISH):
                r1 = s2 * s2 + s3 * s3 - 2 * s2 * s3 * cos_a - a2
                r2 = s1 * s1 + s3 * s3 - 2 * s1 * s3 * cos_b - b2
                r3 = s1 * s1 + s2 * s2 - 2 * s1 * s2 * cos_g - c2
                j12 = 2 * s2 - 2 * s3 * cos_a
                j13 = 2 * s3 - 2 * s2 * cos_a
                j21 = 2 * s1 - 2 * s3 * cos_b
                j23 = 2 * s3 - 2 * s1 * cos_b
                j31 = 2 * s1 - 2 * s2 * cos_g
                j32 = 2 * s2 - 2 * s1 * cos_g
                det = (- j12 * (0.0 - j23 * j31) + j13 * (j21 * j32 - 0.0))
                rdet = _rcp(jnp.where(jnp.abs(det) < 1e-9, 1e-9, det))
                b1, b2r, b3 = -r1, -r2, -r3
                ds1 = (b1 * (0.0 - j23 * j32) - j12 * (b2r * 0.0 - j23 * b3)
                       + j13 * (b2r * j32 - 0.0 * b3)) * rdet
                ds2 = (0.0 - b1 * (j21 * 0.0 - j23 * j31)
                       + j13 * (j21 * b3 - b2r * j31)) * rdet
                ds3 = (0.0 - j12 * (j21 * b3 - b2r * j31)
                       + b1 * (j21 * j32 - 0.0)) * rdet
                lim1 = 0.1 * jnp.abs(s1) + 1e-6
                s1 = s1 + jnp.clip(ds1, -lim1, lim1)
                s2 = s2 + jnp.clip(ds2, -lim1, lim1)
                s3 = s3 + jnp.clip(ds3, -lim1, lim1)
            valid = valid & (s1 > 0) & (s2 > 0) & (s3 > 0)

            C = [[F[j][c] * (s1, s2, s3)[j] for c in range(3)]
                 for j in range(3)]

            ec = triad_cam(C)
            R = [[ec[0][r] * ew[0][c] + ec[1][r] * ew[1][c]
                  + ec[2][r] * ew[2][c] for c in range(3)]
                 for r in range(3)]
            ccm = [(C[0][c] + C[1][c] + C[2][c]) / 3.0 for c in range(3)]
            t = [ccm[r] - (R[r][0] * cw[0] + R[r][1] * cw[1]
                           + R[r][2] * cw[2]) for r in range(3)]
            # Pixel-true anisotropic scoring: y-row scaled once per root.
            R = [R[0], [R[1][c] * ay for c in range(3)], R[2]]
            t = [t[0], t[1] * ay, t[2]]
            poses.append((valid, R, t))

        # Score the full SMEM table against all four roots in ONE pass
        # (each point row is loaded/broadcast once for all 4 poses), two
        # points per trip for ILP (independent dependency chains; padded
        # rows carry w=0).  Division-deferred inlier test (sweep.py
        # treatment): exact bound |p_proj - p z|^2 <= thr^2 z^2, MSAC via
        # one approx reciprocal of z^2; behind-camera rows contribute
        # exactly thr^2.
        far = jnp.float32(3.0e38)

        def sbody(nn, carry):
            out = carry
            for u_i in range(UNROLL):
                row = UNROLL * nn + u_i
                Xx = pts_ref[row, 0]
                Xy = pts_ref[row, 1]
                Xz = pts_ref[row, 2]
                px = pts_ref[row, 6]
                py = pts_ref[row, 7]
                wp = pts_ref[row, 8]
                nxt = []
                for k in range(N_ROOTS):
                    count, msac = out[k]
                    _, R, t = poses[k]
                    xc = R[0][0] * Xx + R[0][1] * Xy + R[0][2] * Xz + t[0]
                    yc = R[1][0] * Xx + R[1][1] * Xy + R[1][2] * Xz + t[1]
                    zc = R[2][0] * Xx + R[2][1] * Xy + R[2][2] * Xz + t[2]
                    behind = zc <= 1e-6
                    a_ = xc - px * zc
                    b_ = yc - py * zc
                    r2_ = jnp.where(behind, far, a_ * a_ + b_ * b_)
                    z2_ = jnp.maximum(zc * zc, jnp.float32(1e-30))
                    t2_ = thr_sq * z2_
                    iz2 = pl.reciprocal(z2_, approx=True)
                    nxt.append((count + jnp.where(r2_ <= t2_, wp, 0.0),
                                msac + jnp.minimum(r2_, t2_) * iz2 * wp))
                out = tuple(nxt)
            return out

        scores = jax.lax.fori_loop(
            0, n_rows // UNROLL, sbody,
            tuple((zero, zero) for _ in range(N_ROOTS)))

        bestA_msac = jnp.full((SUB, LAN), big)
        bestA_count = jnp.full((SUB, LAN), -1.0)
        bestA_root = jnp.zeros((SUB, LAN), jnp.int32)
        bestB_msac = jnp.full((SUB, LAN), big)
        bestB_count = jnp.full((SUB, LAN), -1.0)
        bestB_root = jnp.zeros((SUB, LAN), jnp.int32)
        for k in range(N_ROOTS):
            valid = poses[k][0]
            count, msac = scores[k]
            msac = jnp.where(valid, msac, big)
            count = jnp.where(valid, count, -1.0)

            updA = msac < bestA_msac
            bestA_count = jnp.where(updA, count, bestA_count)
            bestA_root = jnp.where(updA, k, bestA_root)
            bestA_msac = jnp.minimum(msac, bestA_msac)
            updB = (count > bestB_count) | ((count == bestB_count)
                                            & (msac < bestB_msac))
            bestB_count = jnp.where(updB, count, bestB_count)
            bestB_msac = jnp.where(updB, msac, bestB_msac)
            bestB_root = jnp.where(updB, k, bestB_root)

        # Sublane reduction to one record per lane per selection rule;
        # records carry packed = flat * 4 + root (flat < 2^28), ties by
        # smallest packed id (= smallest flat id).
        packedA = flat * 4 + bestA_root
        packedB = flat * 4 + bestB_root
        msac_m = jnp.min(bestA_msac, axis=0, keepdims=True)
        selm = bestA_msac == msac_m
        packed_m = jnp.min(jnp.where(selm, packedA, 2 ** 30),
                           axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (packedA == packed_m),
                                    bestA_count, -2.0),
                          axis=0, keepdims=True)
        count_c = jnp.max(bestB_count, axis=0, keepdims=True)
        selc = bestB_count == count_c
        msac_c = jnp.min(jnp.where(selc, bestB_msac, big),
                         axis=0, keepdims=True)
        packed_c = jnp.min(jnp.where(selc & (bestB_msac == msac_c),
                                     packedB, 2 ** 30),
                           axis=0, keepdims=True)
        fbest_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        ibest_ref[...] = jnp.concatenate([packed_m, packed_c], axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_hyp", "interpret", "block_h"))
def pnp_ransac_sweep_large(
    seed, Xw: jnp.ndarray, pix_n: jnp.ndarray, point_mask: jnp.ndarray,
    threshold_n, n_hyp: int, interpret: bool = False,
    block_h: int | None = None, ay=1.0,
):
    """Run the large-N fused P3P sweep on normalized coords.

    Returns sublane-reduced records ``(msac [2, B], counts [2, B],
    packed [2, B], aux)`` with B = max(n_hyp, min_blocks * block_h) / 8
    (small n_hyp is rounded up to MIN_WINDOWED_BLOCKS independent windows
    when n > WINDOW); row 0 selects by min MSAC,
    row 1 by lexicographic (max count, min MSAC).  Each record is the best
    across its hypothesis's four P3P roots; ``packed = flat_id * 4 +
    root``.  ``aux = (seeds, n_valid, order)`` lets the caller replay any
    flat id's 3-point sample with :func:`sample_indices3_for` (pool slots)
    and map slots to input rows via ``order``.

    Sampling draws only from points with ``point_mask > 0``; scoring
    covers all points weighted by ``point_mask``.  ``threshold_n`` is in
    fx-normalized units (pixel_threshold / fx); ``ay = fy / fx`` scales
    y-residuals so the bound is pixel-true under anisotropic K.
    Requires >= 3 valid points and N <= 512.
    """
    n = Xw.shape[0]
    assert n <= MAX_POINTS, n
    if block_h is None:
        block_h = BLOCK_H
    assert block_h % SUB == 0
    LAN = block_h // SUB
    # >= MIN_WINDOWED_BLOCKS independent windows whenever the pool can
    # exceed one window (same-block window failures are fully correlated;
    # see sweep_large).
    from ransac_tpu.ops.pallas.sweep_large import MIN_WINDOWED_BLOCKS
    min_blocks = MIN_WINDOWED_BLOCKS if n > WINDOW else 1
    n_blocks = max(n_hyp // block_h, min_blocks)

    maskf = point_mask.astype(jnp.float32)
    valid_b = maskf > 0
    n_valid = valid_b.sum().astype(jnp.int32)
    seeds = _draw_seeds_n(seed, N_SEEDS)
    # Valid-first permutation with shuffled valid rows (fresh per sweep,
    # so block windows are uniform random subsets).
    order = _shuffle_order_hash(seeds[4], maskf)

    ones = jnp.ones_like(pix_n[..., :1])
    f = jnp.concatenate([pix_n, ones], -1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    ay_f = jnp.asarray(ay, jnp.float32)
    pix_s = pix_n * jnp.stack([jnp.float32(1.0), ay_f])  # py pre-scaled
    pts = jnp.concatenate(
        [Xw, f, pix_s, maskf[:, None]], axis=1).astype(jnp.float32)[order]
    # Pad to a multiple of UNROLL rows (padded rows carry w = 0).
    n_rows = -(-n // UNROLL) * UNROLL
    if n_rows > n:
        pts = jnp.concatenate(
            [pts, jnp.zeros((n_rows - n, 9), jnp.float32)])
    thr = jnp.stack([jnp.asarray(threshold_n, jnp.float32) ** 2, ay_f])
    wb = _window_bases_hash(seeds[3], n_blocks, n_valid, WINDOW)

    fbest, ibest = pl.pallas_call(
        _make_kernel(n, block_h, n_rows),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # point table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr^2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-draw seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid
            pl.BlockSpec(memory_space=pltpu.SMEM),  # window bases
        ],
        out_specs=(
            pl.BlockSpec((4, LAN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LAN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((2, n_blocks * LAN), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (2500 + 21 * min(WINDOW, n_rows) + 4 * 25 * n),
            transcendentals=n_hyp * 20,
            bytes_accessed=n_blocks * 24),
    )(pts, thr, seeds, n_valid.reshape(1), wb)

    return (fbest[jnp.array([0, 2])], fbest[jnp.array([1, 3])], ibest,
            (seeds, n_valid, order))


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per P3P sample (SoL accounting; see
    ``sweep_pnp.issue_slots_per_hyp``).  One-hot gather of 3 draws x 6
    columns ~21/row over the WINDOW rows a block samples from; 4-root
    single-pass division-deferred scoring ~136/row."""
    return 1600 + 21 * min(WINDOW, n_points) + 136 * n_points
