"""Fully-fused P3P-RANSAC sweep kernel.

Same design as ``sweep.py`` (the homography sweep) applied to pose
hypotheses: each lane derives its 3-point minimal sample from an in-kernel
counter-based PRNG (murmur3-finalizer hash of the flat hypothesis index —
no random tensor ever crosses HBM), gathers the sample from scalar memory
via the shared log2 selection tree, solves Grunert's P3P in registers —
law-of-cosines ratios, resultant quartic solved by Newton-from-Fujiwara-
bound resolvent cubic + Ferrari (Mosaic has no acos; every divide in the
solve/pose path is the hardware approximate reciprocal — the round-3
30-exact-divide cubic was 67% of kernel time), Newton depth polish against
the exact constraint system via an unrolled 3x3 solve, exact triangle-frame
(triad) absolute orientation whose normalization constants are computed
once on the world side and shared by all four camera triads (rigidity) —
scores all correspondences for each of the four candidate roots with the
division-deferred inlier test (|p_proj - p z|^2 <= thr^2 z^2), and reduces
each block to TWO best records (min-MSAC and lexicographic max-count, each
with the winning root id packed in) — ~24 B of HBM traffic per
BLOCK_H=4096 sampled hypotheses.

Hypotheses whose minimal sample touches a masked-out point are invalidated
in-kernel (one variable-shift bit test per draw against the caller's
validity bitmask), so cross-block selection over the reduced records is
exact.

This is the BASELINE.json north-star kernel: "massively-parallel RANSAC
where thousands of minimal-sample hypotheses (P3P/EPnP) are fit and
inlier-scored per Pallas grid step", replacing
``cv2.solvePnPRansac(iterationsCount=5000, ...)``
(``/root/reference/main_v1.py:497-502``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ransac_tpu.ops.pallas.gather import tree_gather_many

BLOCK_H = 4096
SUB = 8
MAX_POINTS = 16
N_ROOTS = 4


def _fmix(x):
    """murmur3 32-bit finalizer: bijective avalanche mixer (counter PRNG)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


N_CUBIC_NEWTON = 12
CUBIC_HALLEY = False
N_QUARTIC_POLISH = 2
N_DEPTH_POLISH = 1


def _rcp(x):
    """Hardware approximate reciprocal (~1e-5 relative, handles sign).

    Inside Newton iterations the reciprocal only scales the step, so the
    approximation error is self-corrected; at convergence f -> 0 and the
    step vanishes regardless."""
    return pl.reciprocal(x, approx=True)


def _cbrt_upper(x):
    """Cheap upper bound on cbrt(x) for x >= 0: exponent-third bit trick
    (ratio to true cbrt measured in [0.97, 1.04]) times a 1.1 margin."""
    xi = jax.lax.bitcast_convert_type(jnp.maximum(x, 1e-30), jnp.int32)
    yi = xi // 3 + jnp.int32(0x2A514067)
    return jax.lax.bitcast_convert_type(yi, jnp.float32) * 1.1


def _solve_quartic_vec(b, c, d, e):
    """Real roots of x^4 + b x^3 + c x^2 + d x + e = 0 on lane vectors.
    Returns (roots list[4], ok list[4]) — mirrors
    ops.linalg.solve_quartic_real (monic input).

    The resolvent-cubic largest root is found by Newton iteration started
    above a Fujiwara-style root bound (2 * max(|cb|, sqrt|cc|,
    cbrt|cd|)) — far tighter than the Cauchy bound, so 12 iterations
    replace round-3's 30 — with the hardware approximate reciprocal in
    place of exact division (the 30 serial exact divides were the
    latency-bound 67% of this kernel; measured head-to-head on 20k
    Grunert quartics the short solver is typically as accurate, p50
    3e-7, and strictly more robust: 79 vs 278 missed-root cases).
    Mosaic has no acos/trig-cubic path; this needs only arithmetic +
    sqrt."""
    shift = b / 4.0
    b2 = b * b
    p = c - 3.0 * b2 / 8.0
    q = d - b * c / 2.0 + b2 * b / 8.0
    r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

    # Resolvent cubic m^3 + cb m^2 + cc m + cd = 0: largest real root
    # (cd = -q^2/8 <= 0, so a root >= 0 always exists).
    cb = p
    cc = p * p / 4.0 - r
    cd = -q * q / 8.0
    m = 2.0 * jnp.maximum(
        jnp.abs(cb),
        jnp.maximum(jnp.sqrt(jnp.abs(cc)), _cbrt_upper(jnp.abs(cd)))
    ) + 1e-6
    for it in range(N_CUBIC_NEWTON):
        f = ((m + cb) * m + cc) * m + cd
        df = (3.0 * m + 2.0 * cb) * m + cc
        rdf = _rcp(jnp.where(jnp.abs(df) < 1e-20, 1e-20, df))
        t_ = f * rdf
        if CUBIC_HALLEY:
            # Chebyshev/Halley cubic-convergent correction:
            # dx = t (1 + t f'' / (2 f')); f'' = 6m + 2cb.
            t_ = t_ * (1.0 + t_ * (3.0 * m + cb) * rdf)
        # Iteration from above the largest root is monotone; clamp the
        # step to keep iterates finite on flat stretches.
        m = m - jnp.clip(t_, -1e6, 1e6)
    m = jnp.maximum(m, 1e-12)

    s = jnp.sqrt(2.0 * m)
    q_term = q * 0.5 * _rcp(s)
    base = p / 2.0 + m
    roots = []
    ok = []
    for sign in (1.0, -1.0):
        ccq = base + sign * q_term
        disc2 = s * s / 4.0 - ccq
        good = disc2 >= 0.0
        sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
        for pm in (1.0, -1.0):
            roots.append(sign * s / 2.0 + pm * sq2 - shift)
            ok.append(good)
    # Newton polish on the monic quartic.
    for i in range(4):
        x = roots[i]
        for _ in range(N_QUARTIC_POLISH):
            f = (((x + b) * x + c) * x + d) * x + e
            df = ((4.0 * x + 3.0 * b) * x + 2.0 * c) * x + d
            x = x - f * _rcp(jnp.where(jnp.abs(df) < 1e-20, 1e-20, df))
        roots[i] = x
    return roots, ok


def _make_kernel(n_points: int, n_score: int, reduce_block: bool,
                 block_h: int):
    LAN = block_h // SUB

    def kernel(X_ref, f_ref, pix_ref, mask_ref, thr_ref, seed_ref,
               vmask_ref, fout_ref, iout_ref):
        thr_sq = thr_ref[0]
        # Anisotropy ay = fy/fx: the caller pre-scales the pool's py by ay
        # and the pose's y-row is scaled here, so du^2 + dv^2 is the TRUE
        # pixel error divided by fx (pixel-true threshold under
        # anisotropic K; cv2.solvePnPRansac semantics, main_v1.py:497-502).
        ay = thr_ref[1]
        # Counter-based PRNG: flat hypothesis index hashed with 3
        # pre-mixed per-draw seeds.  No random bits cross HBM.
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * block_h + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        bits = [_fmix(flatu ^ seed_ref[j]) for j in range(3)]

        # 3-subset Fisher-Yates.
        idx = []
        for j in range(3):
            r = (bits[j] % jnp.uint32(n_points - j)).astype(jnp.int32)
            prev_sorted = []
            for pv in idx:
                ins = pv
                out = []
                for sv in prev_sorted:
                    lo = jnp.minimum(sv, ins)
                    hi = jnp.maximum(sv, ins)
                    out.append(lo)
                    ins = hi
                out.append(ins)
                prev_sorted = out
            for sv in prev_sorted:
                r = r + (r >= sv).astype(jnp.int32)
            idx.append(r)

        # Masked-out points poison any hypothesis that sampled them
        # (engine sample_ok semantics).
        vmask = vmask_ref[0]
        ok_bits = (vmask >> idx[0]) & (vmask >> idx[1]) & (vmask >> idx[2])
        sample_valid = (ok_bits & 1) == 1

        # World points and unit bearings of the sample via the log2
        # selection tree (shared index bit masks).
        cols = [[X_ref[n, 0] for n in range(n_points)],
                [X_ref[n, 1] for n in range(n_points)],
                [X_ref[n, 2] for n in range(n_points)],
                [f_ref[n, 0] for n in range(n_points)],
                [f_ref[n, 1] for n in range(n_points)],
                [f_ref[n, 2] for n in range(n_points)]]
        g = [tree_gather_many(i, cols, n_points) for i in idx]
        P = [[g[j][c] for c in range(3)] for j in range(3)]
        F = [[g[j][3 + c] for c in range(3)] for j in range(3)]

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        def sub3(a, b):
            return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]

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

        packed = idx[0] + idx[1] * 16 + idx[2] * 256

        # Root-independent precomputation, hoisted out of the 4-root loop.
        sb = jnp.sqrt(b2)

        # World triad (identical for all four roots), via rsqrt — and its
        # scalar invariants.  Rigidity makes the camera-side triad share
        # them: |C1-C0| = |P1-P0|, |vp_c| = |vp_w|, dot(v1_c, e1_c) =
        # dot(v1_w, e1_w) (up to polished-depth error, ~1e-5 relative),
        # so each root's camera triad needs no rsqrt/dot at all and its
        # serial dependency chain collapses to sub -> scale -> fma ->
        # scale -> cross.
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

        # Running best across the 4 roots under both selection rules.
        big = jnp.float32(3.4e38)
        bestA_msac = jnp.full((SUB, LAN), big)
        bestA_count = jnp.full((SUB, LAN), -1.0)
        bestA_root = jnp.zeros((SUB, LAN), jnp.int32)
        bestB_msac = jnp.full((SUB, LAN), big)
        bestB_count = jnp.full((SUB, LAN), -1.0)
        bestB_root = jnp.zeros((SUB, LAN), jnp.int32)

        for k in range(N_ROOTS):
            v = roots[k]
            D = d1 * v + d0
            N = (n2 * v + n1) * v + n0
            u = N * _rcp(jnp.where(jnp.abs(D) < 1e-9, 1e-9, D))
            s1 = sb * jax.lax.rsqrt(jnp.maximum(
                1.0 + v * v - 2.0 * v * cos_b, 1e-12))
            s2 = u * s1
            s3 = v * s1
            valid = (sample_valid & root_ok[k] & (v > 1e-6) & (u > 1e-6)
                     & (jnp.abs(D) > 1e-9))

            # Newton polish of depths on the law-of-cosines system
            # (unrolled 3x3 solve via adjugate; one approx reciprocal of
            # the determinant replaces three divides).
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
                # Solve J ds = -r, J = [[0,j12,j13],[j21,0,j23],[j31,j32,0]]
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

            # Camera-frame points.
            C = [[F[j][c] * (s1, s2, s3)[j] for c in range(3)]
                 for j in range(3)]

            ec = triad_cam(C)
            # R = Bc @ Bw^T where columns of B are the triad vectors:
            # R[r][c] = sum_k ec_k[r] * ew_k[c].
            R = [[ec[0][r] * ew[0][c] + ec[1][r] * ew[1][c]
                  + ec[2][r] * ew[2][c] for c in range(3)] for r in range(3)]
            ccm = [(C[0][c] + C[1][c] + C[2][c]) / 3.0 for c in range(3)]
            t = [ccm[r] - (R[r][0] * cw[0] + R[r][1] * cw[1]
                           + R[r][2] * cw[2]) for r in range(3)]

            # Pixel-true anisotropic scoring: scale the pose's y-row once
            # per root (pool py is pre-scaled by ay host-side).
            Ry = [R[1][c] * ay for c in range(3)]
            ty = t[1] * ay

            # Score all points in fx-normalized pixel-true units.
            # Division-deferred inlier test (sweep.py treatment): the
            # EXACT bound |p_proj - p z|^2 <= thr^2 z^2 needs no divide;
            # the MSAC term uses one approx reciprocal of z^2.  Points
            # behind the camera contribute exactly thr^2 (max penalty).
            count = jnp.zeros((SUB, LAN), jnp.float32)
            msac = jnp.zeros((SUB, LAN), jnp.float32)
            far = jnp.float32(3.0e38)
            for nn in range(n_score):
                Xx = X_ref[nn, 0]
                Xy = X_ref[nn, 1]
                Xz = X_ref[nn, 2]
                px = pix_ref[nn, 0]
                py = pix_ref[nn, 1]
                wp = mask_ref[nn]
                xc = R[0][0] * Xx + R[0][1] * Xy + R[0][2] * Xz + t[0]
                yc = Ry[0] * Xx + Ry[1] * Xy + Ry[2] * Xz + ty
                zc = R[2][0] * Xx + R[2][1] * Xy + R[2][2] * Xz + t[2]
                behind = zc <= 1e-6
                a_ = xc - px * zc
                b_ = yc - py * zc
                r2_ = a_ * a_ + b_ * b_
                z2_ = jnp.maximum(zc * zc, jnp.float32(1e-30))
                t2_ = thr_sq * z2_
                r2_ = jnp.where(behind, far, r2_)
                count = count + jnp.where(r2_ <= t2_, wp, 0.0)
                iz2 = pl.reciprocal(z2_, approx=True)
                msac = msac + jnp.minimum(r2_, t2_) * iz2 * wp

            msac = jnp.where(valid, msac, big)
            count = jnp.where(valid, count, -1.0)

            if not reduce_block:
                fout_ref[2 * k] = msac
                fout_ref[2 * k + 1] = count
                continue

            updA = msac < bestA_msac
            bestA_count = jnp.where(updA, count, bestA_count)
            bestA_root = jnp.where(updA, k, bestA_root)
            bestA_msac = jnp.minimum(msac, bestA_msac)
            updB = (count > bestB_count) | ((count == bestB_count)
                                            & (msac < bestB_msac))
            bestB_count = jnp.where(updB, count, bestB_count)
            bestB_msac = jnp.where(updB, msac, bestB_msac)
            bestB_root = jnp.where(updB, k, bestB_root)

        if not reduce_block:
            iout_ref[0] = packed
            return

        # Sublane reduction: one record per LANE per selection rule
        # (min-MSAC and lexicographic max-count), ties broken by smallest
        # packed index; the winning root id rides in packed bits 12-13.
        packedA = packed + bestA_root * 4096
        packedB = packed + bestB_root * 4096
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
        fout_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        iout_ref[...] = jnp.concatenate([packed_m, packed_c], axis=0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_hyp", "n_points", "interpret", "full_records",
                     "block_h"))
def pnp_ransac_sweep(
    seed, Xw: jnp.ndarray, pix_n: jnp.ndarray, point_mask: jnp.ndarray,
    threshold_n, n_hyp: int, n_points: int | None = None,
    interpret: bool = False, full_records: bool = False,
    block_h: int | None = None, ay=1.0,
):
    """Fused P3P sweep on normalized coords.

    Default (``full_records=False``): sublane-reduced records
    ``(msac [2, B], counts [2, B], packed [2, B])`` with B = n_hyp / 8 —
    row 0 selects by min MSAC, row 1 by lexicographic (max count, min
    MSAC); each record is the best across the hypothesis's four P3P roots,
    whose id sits in packed bits 12-13 (``unpack_sample3`` ignores it).
    Samples touching ``point_mask == 0`` points are invalidated in-kernel.

    ``full_records=True``: per-(hypothesis, root) ``(msac [4H], counts
    [4H], packed [4H])`` flattened root-major — for tests/inspection.

    ``threshold_n`` is in fx-normalized units (pixel_threshold / fx);
    ``ay = fy / fx`` scales y-residuals so the bound is pixel-true under
    anisotropic K (traced — no recompile per K).
    """
    n = Xw.shape[0]
    if n_points is None:
        n_points = n
    assert n <= MAX_POINTS
    if block_h is None:
        block_h = min(BLOCK_H, max(SUB, (n_hyp // SUB) * SUB))
    assert block_h % SUB == 0
    LAN = block_h // SUB
    n_blocks = max(n_hyp // block_h, 1)

    ones = jnp.ones_like(pix_n[..., :1])
    f = jnp.concatenate([pix_n, ones], -1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    ay_f = jnp.asarray(ay, jnp.float32)
    pix_s = pix_n * jnp.stack([jnp.float32(1.0), ay_f])  # py pre-scaled
    X_p = jnp.zeros((MAX_POINTS, 3), jnp.float32).at[:n].set(Xw)
    f_p = jnp.zeros((MAX_POINTS, 3), jnp.float32).at[:n].set(f)
    pix_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(pix_s)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = jnp.stack([jnp.asarray(threshold_n, jnp.float32) ** 2, ay_f])
    seed_u = jnp.asarray(seed, jnp.uint32)
    seeds = _fmix(seed_u + jnp.arange(1, 4, dtype=jnp.uint32)
                  * jnp.uint32(0x9E3779B9))
    vmask = jnp.sum(
        jnp.where(mask_p > 0, jnp.int32(1) << jnp.arange(MAX_POINTS), 0)
    ).reshape(1).astype(jnp.int32)

    kernel = _make_kernel(n_points, n, reduce_block=not full_records,
                          block_h=block_h)
    if full_records:
        out_specs = (
            pl.BlockSpec((2 * N_ROOTS, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((2 * N_ROOTS, SUB, n_blocks * LAN),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, SUB, n_blocks * LAN), jnp.int32),
        )
    else:
        out_specs = (
            pl.BlockSpec((4, LAN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LAN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((4, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((2, n_blocks * LAN), jnp.int32),
        )
    fout, iout = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # X
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bearings
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pix_n
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr^2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-draw seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sample bitmask
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (2500 + 4 * 25 * n), transcendentals=n_hyp * 20,
            bytes_accessed=n_blocks * 24),
    )(X_p, f_p, pix_p, mask_p, thr, seeds, vmask)
    if full_records:
        msac = fout[0::2].reshape(N_ROOTS, -1).reshape(-1)
        counts = fout[1::2].reshape(N_ROOTS, -1).reshape(-1)
        packed = jnp.tile(iout[0].reshape(-1), (N_ROOTS,))
        return msac, counts, packed
    return (fout[jnp.array([0, 2])], fout[jnp.array([1, 3])], iout)


def unpack_sample3(packed: int) -> np.ndarray:
    p = int(packed)
    return np.array([p & 15, (p >> 4) & 15, (p >> 8) & 15], dtype=np.int32)


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per P3P SAMPLE (4 roots solved and
    scored; FMA = 2 slots — see ``sweep.issue_slots_per_hyp``).

    Round-4 recalibration (quartic rebuild).  Score counted from source:
    per root-point ~34 slots (project 11 fma, deferred residual test,
    one approx reciprocal) x 4 roots = 136n; the measured pool-size
    slope (0.091 ms/pt per 2^22) equals ~130n — the score loop is
    issue-bound.  Non-score counted from source: sampling + 3-draw FY +
    tree gather (18 cols) ~260; quartic (12-step approx-recip Newton
    cubic + Ferrari + 2-step polish x4) ~510; pose construction x4
    roots (1-step depth polish, shared-invariant camera triad, R/t)
    ~1050; records ~40 -> ~1860 fixed, matching the measured 1.78 ms
    fixed block at ~74% issue.  Good to +-20%."""
    return 1860 + 136 * n_points
