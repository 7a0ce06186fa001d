"""Fully-fused homography-RANSAC sweep kernel.

The stage-wise engine (sample -> gather -> solve -> score as separate XLA
ops) is HBM-bound: every hypothesis round-trips its sampled points, its
8x8 system, and its model through HBM (~500 B/hypothesis).  This kernel
fuses the entire hypothesize-and-verify sweep: each grid step derives its
hypothesis sample indices from an in-kernel counter-based PRNG
(murmur3-finalizer hash of the flat hypothesis index — no random tensor is
ever materialized in HBM), gathers the (<=16-point) correspondence set from
scalar memory via a log2 selection tree, solves the 4-point homography in
closed form by the division-free projective-frame (adjugate) method, scores
all points, and reduces each block to TWO best-candidate records (best by
MSAC and best by lexicographic inlier count) — HBM traffic is ~24 bytes per
BLOCK_H=2048 hypotheses.

Solver: A maps the canonical projective basis (e1,e2,e3,e1+e2+e3) onto the
4 src points — solve [s1 s2 s3] lam = s4 by Cramer (the common 1/det drops
because homographies are up-to-scale), A = [lam1*s1 | lam2*s2 | lam3*s3];
B likewise for dst; H = B @ adj(A).  ~150 vector ops with NO divides or
sqrts, vs ~700 for Hartley normalization + pivoted 8x8 Gaussian
elimination.  The caller globally pre-normalizes both point sets to O(1)
once (inlier decisions are unchanged because the threshold is scaled
along), so f32 suffices for hypothesis *ranking*; the winning minimal
sample is returned as packed point indices and the host re-solves it
exactly and refits on its inliers, so end-to-end results match the
stage-wise engine's semantics.

This is the SURVEY.md §7.2(2) "hypotheses/s/chip headline kernel"; it
replaces cv2.findHomography's internal hypothesize-and-verify loop
(reference main_v1.py:312).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ransac_tpu.ops.pallas.gather import tree_gather_many

# Hypotheses are held as 2-D [SUB, LAN] vectors: Mosaic lays 1-D arrays out
# on a single sublane (1/8 of each (8,128) vreg), so 2-D tiles use the VPU
# at full width.  Round 5: LAN 512 -> 256 (every tile 2 vregs instead of
# 4) paired with N_ACC = 8 below — the block-size/accumulator grid scan
# (tools/exp_small3.py) put (LAN=256, acc=8) fastest, best observed
# 0.243 ms per 2^22 (17.2 B hyp/s) vs 0.68-0.79 ms for the round-4
# kernel on the same quiet host.
SUB = 8
LAN = 256
BLOCK_H = SUB * LAN
MAX_POINTS = 16
# Independent (count, msac) accumulator pairs in the score loop, summed
# at the end.  Round-5 finding: with ONE pair the loop is LATENCY-bound
# on the serial accumulate dependency chains, not issue-bound — the
# round-4 kernel ran at "44% issue" because each point's count/msac add
# had to wait for the previous point's.  Independent pairs break the
# chains; 8 pairs fit the vreg file at LAN=256 (at LAN=512 they spill
# and regress) — see tools/exp_small3.py.
N_ACC = 8

def _fmix(x):
    """murmur3 32-bit finalizer: bijective avalanche mixer (counter PRNG)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _make_kernel(n_points: int, n_score: int, reduce_block: bool):
    """Kernel specialized for static sample pool size / score count."""

    def kernel(src_ref, dst_ref, mask_ref, thr_ref, seed_ref, vmask_ref,
               fbest_ref, ibest_ref):
        thr_sq = thr_ref[0]
        # Counter-based PRNG: flat hypothesis index hashed with 4
        # pre-mixed per-draw seeds.  No random bits cross HBM.
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * BLOCK_H + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        bits = [_fmix(flatu ^ seed_ref[j]) for j in range(4)]

        # Fisher-Yates: draw r_j in [0, n-j), shift past earlier picks.
        idx = []
        for j in range(4):
            r = (bits[j] % jnp.uint32(n_points - j)).astype(jnp.int32)
            prev_sorted = []
            for p in idx:
                ins = p
                out = []
                for s in prev_sorted:
                    lo = jnp.minimum(s, ins)
                    hi = jnp.maximum(s, ins)
                    out.append(lo)
                    ins = hi
                out.append(ins)
                prev_sorted = out
            for s in prev_sorted:
                r = r + (r >= s).astype(jnp.int32)
            idx.append(r)

        # Masked-out points poison any hypothesis that sampled them
        # (engine sample_ok semantics): one variable-shift bit test per
        # draw against the caller's validity bitmask.
        vmask = vmask_ref[0]
        ok_bits = ((vmask >> idx[0]) & (vmask >> idx[1])
                   & (vmask >> idx[2]) & (vmask >> idx[3]))
        valid = (ok_bits & 1) == 1

        # Gather sampled coordinates via the log2 selection tree (shared
        # index bit masks; ~4x fewer vector ops than one-hot accumulation).
        cols = [[src_ref[n, 0] for n in range(n_points)],
                [src_ref[n, 1] for n in range(n_points)],
                [dst_ref[n, 0] for n in range(n_points)],
                [dst_ref[n, 1] for n in range(n_points)]]
        g = [tree_gather_many(i, cols, n_points) for i in idx]
        sx = [g[j][0] for j in range(4)]
        sy = [g[j][1] for j in range(4)]
        dx = [g[j][2] for j in range(4)]
        dy = [g[j][3] for j in range(4)]

        # Projective-frame 4-point homography (division-free, up to scale).
        def det3(px, py, qx, qy, rx, ry):
            # det of columns [(px,py,1),(qx,qy,1),(rx,ry,1)]
            return (qx - px) * (ry - py) - (rx - px) * (qy - py)

        def frame(xs, ys):
            d0 = det3(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2])
            l1 = det3(xs[3], ys[3], xs[1], ys[1], xs[2], ys[2])
            l2 = det3(xs[0], ys[0], xs[3], ys[3], xs[2], ys[2])
            l3 = det3(xs[0], ys[0], xs[1], ys[1], xs[3], ys[3])
            # M = [l1*s1 | l2*s2 | l3*s3], rows (x, y, 1)-scaled
            M = [[l1 * xs[0], l2 * xs[1], l3 * xs[2]],
                 [l1 * ys[0], l2 * ys[1], l3 * ys[2]],
                 [l1, l2, l3]]
            ok = ((jnp.abs(d0) > 1e-7) & (jnp.abs(l1) > 1e-7)
                  & (jnp.abs(l2) > 1e-7) & (jnp.abs(l3) > 1e-7))
            return M, ok

        A, ok_s = frame(sx, sy)
        B, ok_d = frame(dx, dy)
        valid = valid & ok_s & ok_d

        # adj(A): transpose of cofactors.
        adjA = [[A[1][1] * A[2][2] - A[1][2] * A[2][1],
                 A[0][2] * A[2][1] - A[0][1] * A[2][2],
                 A[0][1] * A[1][2] - A[0][2] * A[1][1]],
                [A[1][2] * A[2][0] - A[1][0] * A[2][2],
                 A[0][0] * A[2][2] - A[0][2] * A[2][0],
                 A[0][2] * A[1][0] - A[0][0] * A[1][2]],
                [A[1][0] * A[2][1] - A[1][1] * A[2][0],
                 A[0][1] * A[2][0] - A[0][0] * A[2][1],
                 A[0][0] * A[1][1] - A[0][1] * A[1][0]]]
        H = [None] * 9
        for r in range(3):
            for c in range(3):
                H[3 * r + c] = (B[r][0] * adjA[0][c] + B[r][1] * adjA[1][c]
                                + B[r][2] * adjA[2][c])

        # Score all points — division-deferred form (round-3 measured 12%
        # kernel win; the score loop is 84% of kernel time):
        #   inlier  <=>  |p_proj/w - p|^2 <= thr^2
        #           <=>  |p_proj - p*w|^2 <= thr^2 * w^2      (exact, f32)
        # and the MSAC term min(e2, thr^2) = min(r2, t) / w^2 uses ONE
        # approximate reciprocal instead of a guarded exact divide.  For
        # degenerate w (w^2 floored at 1e-30) min(r2, t) = t, so the
        # contribution is exactly thr^2 — the correct outlier penalty —
        # and never NaN.
        # N_ACC independent accumulator pairs break the serial
        # accumulate chain (see constant above); count sums are exact
        # (integer-valued f32), msac sums reassociate within f32 noise.
        counts = [jnp.zeros((SUB, LAN), jnp.float32)
                  for _ in range(N_ACC)]
        msacs = [jnp.zeros((SUB, LAN), jnp.float32)
                 for _ in range(N_ACC)]
        for n in range(n_score):
            x = src_ref[n, 0]
            y = src_ref[n, 1]
            px = dst_ref[n, 0]
            py = dst_ref[n, 1]
            w_pt = mask_ref[n]
            u = H[0] * x + H[1] * y + H[2]
            v = H[3] * x + H[4] * y + H[5]
            w = H[6] * x + H[7] * y + H[8]
            a = u - px * w
            b = v - py * w
            r2 = a * a + b * b
            w2 = jnp.maximum(w * w, jnp.float32(1e-30))
            t = thr_sq * w2
            iw2 = pl.reciprocal(w2, approx=True)
            k = n % N_ACC
            counts[k] = counts[k] + jnp.where(r2 <= t, w_pt, 0.0)
            msacs[k] = msacs[k] + jnp.minimum(r2, t) * iw2 * w_pt
        count = counts[0]
        msac = msacs[0]
        for k in range(1, N_ACC):
            count = count + counts[k]
            msac = msac + msacs[k]

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        count = jnp.where(valid, count, -1.0)
        packed = (idx[0] + idx[1] * 16 + idx[2] * 256 + idx[3] * 4096)

        if not reduce_block:
            # Per-hypothesis records (12 B each; the argmin runs in XLA).
            fbest_ref[0] = msac
            fbest_ref[1] = count
            ibest_ref[0] = packed
            return

        # Sublane reduction (8x record shrink): one record per LANE per
        # selection rule (min-MSAC and lexicographic max-count), ties
        # broken by smallest packed index.  Cross-sublane min/max are
        # cheap (3 shuffle steps); full cross-lane reductions measured
        # ~0.6 us/block and are left to XLA's argmin over the records.
        msac_m = jnp.min(msac, axis=0, keepdims=True)
        selm = msac == msac_m
        packed_m = jnp.min(jnp.where(selm, packed, 2 ** 30),
                           axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (packed == packed_m),
                                    count, -2.0), axis=0, keepdims=True)
        count_c = jnp.max(count, axis=0, keepdims=True)
        selc = count == count_c
        msac_c = jnp.min(jnp.where(selc, msac, jnp.float32(3.4e38)),
                         axis=0, keepdims=True)
        packed_c = jnp.min(jnp.where(selc & (msac == msac_c),
                                     packed, 2 ** 30),
                           axis=0, keepdims=True)
        fbest_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        ibest_ref[...] = jnp.concatenate([packed_m, packed_c], axis=0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_hyp", "n_points", "interpret", "full_records"))
def homography_ransac_sweep(
    seed: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
    point_mask: jnp.ndarray, threshold, n_hyp: int,
    n_points: int | None = None, interpret: bool = False,
    full_records: bool = False,
):
    """Run the fused sweep.

    Default (``full_records=False``): returns sublane-reduced records
    ``(msac [2, B], counts [2, B], packed_idx [2, B])`` with B = n_hyp / 8
    — row 0 selects by min MSAC, row 1 by lexicographic (max count, min
    MSAC).  ``argmin(msac[0])`` / ``_select_best`` on row 1 give exactly
    the same winner as over per-hypothesis records.

    ``full_records=True``: per-hypothesis ``(msac [H], counts [H],
    packed [H])`` — 4000x more HBM traffic, for tests/inspection only.

    Hypotheses whose minimal sample is degenerate OR touches a point with
    ``point_mask == 0`` carry msac ~3.4e38 and count -1.  ``n_points``
    (static) is the sample pool size (first n_points rows of src/dst);
    scoring uses all rows weighted by point_mask.  ``unpack_sample`` the
    winning packed index and re-solve exactly on the host.
    """
    n = src.shape[0]
    if n_points is None:
        n_points = n
    assert n <= MAX_POINTS
    n_blocks = max(n_hyp // BLOCK_H, 1)

    # Global O(1) normalization (replaces per-sample Hartley inside the
    # kernel): center on the sample-pool centroid, scale by mean distance.
    # Inlier decisions are identical (the threshold scales with dst) and
    # msac is rescaled back to pixel^2 units below; the kernel then needs
    # no divides/sqrts at all.
    def _norm_params(a):
        m = jnp.sum(a[:n_points], 0) / n_points
        d = jnp.sqrt(jnp.sum((a[:n_points] - m) ** 2, -1))
        s = 1.4142135623730951 / jnp.maximum(jnp.sum(d) / n_points, 1e-12)
        return m, s

    sm, s_src = _norm_params(src)
    dm, s_dst = _norm_params(dst)
    src_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(
        (src - sm) * s_src)
    dst_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(
        (dst - dm) * s_dst)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = (jnp.asarray(threshold, jnp.float32).reshape(1) * s_dst) ** 2
    # Per-draw seeds: mix the user seed with the draw id (golden-ratio
    # spaced) so the four index streams are independent.
    seed_u = jnp.asarray(seed, jnp.uint32)
    seeds = _fmix(seed_u + jnp.arange(1, 5, dtype=jnp.uint32)
                  * jnp.uint32(0x9E3779B9))
    # Sample-validity bitmask: bit n set iff point n may be sampled.
    vmask = jnp.sum(
        jnp.where(mask_p > 0, jnp.int32(1) << jnp.arange(MAX_POINTS), 0)
    ).reshape(1).astype(jnp.int32)

    kernel = _make_kernel(n_points, n, reduce_block=not full_records)
    if full_records:
        out_specs = (
            pl.BlockSpec((2, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((2, SUB, n_blocks * LAN), jnp.float32),
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
    fbest, ibest = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # src
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dst
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr^2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-draw seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sample bitmask
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (700 + 22 * n), transcendentals=0,
            bytes_accessed=n_blocks * 24),
    )(src_p, dst_p, mask_p, thr, seeds, vmask)

    inv_s2 = 1.0 / (s_dst * s_dst)

    def _rescale(m):
        return jnp.where(m >= jnp.float32(3e38), jnp.float32(3.4e38),
                         m * inv_s2)

    if full_records:
        return (_rescale(fbest[0].reshape(-1)), fbest[1].reshape(-1),
                ibest[0].reshape(-1))
    # Strided slices (rows [0,2] / [1,3]), not fancy indexing: a gather
    # over rows lowers to a real gather kernel on TPU.
    return (_rescale(fbest[0::2]), fbest[1::2], ibest)


def unpack_sample(packed: int) -> np.ndarray:
    p = int(packed)
    return np.array([p & 15, (p >> 4) & 15, (p >> 8) & 15, (p >> 12) & 15],
                    dtype=np.int32)


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per hypothesis for the SoL report
    (``utils.profiling``).

    Round-5 recalibration.  The round-4 audit (105 + 30n, FMA counted
    as 2 slots) was built against a kernel whose score loop was
    LATENCY-bound on its serial accumulator chains — the multi-
    accumulator rewrite (``N_ACC``) dropped the measured time past the
    old audit's implied ceiling (best observed 0.243 ms per 2^22 at
    n=13 -> 17.3 B hyp/s -> at most ~343 slots/hyp against the counted
    495), proving the 2-slot FMA assumption overcounts once the chains
    no longer stall: with FMA at 1 issue slot the score loop counts
    20/pt (10 FMA + 10 generic) and the audit becomes ~105 + 20n = 365
    at n=13 — consistent with the best measured rate at ~94% issue.
    Good to ~+-30%; single-run numbers through the axon tunnel vary up
    to 2x run-to-run (see PERF.md round-5 variance note), so only
    best-of-session rates should be compared against this audit.
    """
    return 105 + 20 * n_points
