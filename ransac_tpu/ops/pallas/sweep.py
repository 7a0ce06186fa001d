"""Fully-fused homography-RANSAC sweep kernel.

The stage-wise engine (sample -> gather -> solve -> score as separate XLA
ops) is HBM-bound: every hypothesis round-trips its sampled points, its
8x8 system, and its model through HBM (~500 B/hypothesis).  This kernel
fuses the entire hypothesize-and-verify sweep: each grid step seeds the
on-core PRNG, draws BLOCK_H 4-point samples (Fisher-Yates index
adjustment), gathers the (<=16-point) correspondence set from scalar
memory via one-hot accumulation, Hartley-normalizes per sample, solves the
8x8 DLT system by fully-unrolled Gaussian elimination held in vector
registers, scores all points, and reduces to ONE best-candidate record per
block — HBM traffic is 16 bytes per BLOCK.

The winning minimal sample is returned as packed point indices; the host
re-solves that single sample (exactly, with pivoting) and refits on its
inliers, so end-to-end results match the stage-wise engine's semantics.

This is the SURVEY.md §7.2(2) "hypotheses/s/chip headline kernel".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_H = 2048
# Hypotheses are held as 2-D [SUB, LAN] vectors: Mosaic lays 1-D arrays out
# on a single sublane (1/8 of each (8,128) vreg), so 2-D tiles use the VPU
# at full width.
SUB = 8
LAN = BLOCK_H // SUB
MAX_POINTS = 16


def _make_kernel(n_points: int, n_score: int):
    """Kernel specialized for static sample pool size / score count."""

    def kernel(src_ref, dst_ref, mask_ref, thr_ref, bits_ref,
               fbest_ref, ibest_ref):
        thr_sq = thr_ref[0]
        # Counter-based random bits are streamed in ([4, SUB, LAN] per
        # block, 16 B/hypothesis): testable on every backend, and trivial
        # against the >400 fused ops the kernel performs per hypothesis.
        bits = pltpu.bitcast(bits_ref[...], jnp.uint32)

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

        # Gather sampled coordinates by one-hot accumulation from SMEM.
        def gather(ref, col, ind):
            acc = jnp.zeros((SUB, LAN), jnp.float32)
            for n in range(n_points):
                acc = acc + jnp.where(ind == n, ref[n, col], 0.0)
            return acc

        sx = [gather(src_ref, 0, i) for i in idx]
        sy = [gather(src_ref, 1, i) for i in idx]
        dx = [gather(dst_ref, 0, i) for i in idx]
        dy = [gather(dst_ref, 1, i) for i in idx]

        def hartley(xs, ys):
            mx = (xs[0] + xs[1] + xs[2] + xs[3]) * 0.25
            my = (ys[0] + ys[1] + ys[2] + ys[3]) * 0.25
            d = [jnp.sqrt((x - mx) ** 2 + (y - my) ** 2 + 1e-20)
                 for x, y in zip(xs, ys)]
            md = (d[0] + d[1] + d[2] + d[3]) * 0.25
            s = 1.4142135623730951 / jnp.maximum(md, 1e-12)
            xn = [(x - mx) * s for x in xs]
            yn = [(y - my) * s for y in ys]
            return xn, yn, mx, my, s

        sxn, syn, smx, smy, ss = hartley(sx, sy)
        dxn, dyn, dmx, dmy, sd = hartley(dx, dy)

        # Augmented 8x9 system (normalized coords), entries = lane vectors.
        # Row order matters for pivot-free elimination: the u-rows live in
        # columns {0,1,2,6,7}, the v-rows in {3,4,5,6,7}; ordering
        # [u0,u1,u2, v0,v1,v2, u3,v3] keeps a structurally nonzero pivot at
        # every step (near-zero pivots from degenerate samples are caught
        # by the validity check).
        one = jnp.ones((SUB, LAN), jnp.float32)
        zero = jnp.zeros((SUB, LAN), jnp.float32)

        def u_row(j):
            x, y, u = sxn[j], syn[j], dxn[j]
            return [x, y, one, zero, zero, zero, -u * x, -u * y, u]

        def v_row(j):
            x, y, v = sxn[j], syn[j], dyn[j]
            return [zero, zero, zero, x, y, one, -v * x, -v * y, v]

        aug = [u_row(0), u_row(1), u_row(2),
               v_row(0), v_row(1), v_row(2),
               u_row(3), v_row(3)]

        valid = jnp.ones((SUB, LAN), jnp.bool_)
        # Group-restricted partial pivoting (branch-free conditional row
        # swaps).  Without pivoting, a sample point at the normalized
        # centroid (x = 0) zeroes the structural pivot and a solvable
        # sample is wrongly rejected.  Swapping only within each structural
        # group is sufficient: rows outside the group have *structural*
        # zeros in the pivot column (v-rows in cols 0-2, u3 in cols 3-5),
        # so they can never offer a better pivot.  Groups: rows 0-2
        # (u0..u2), rows 3-5 (v0..v2), rows 6-7 (u3, v3).
        group_end = {0: 3, 1: 3, 2: 3, 3: 6, 4: 6, 5: 6, 6: 8, 7: 8}
        for k in range(8):
            for i in range(k + 1, group_end[k]):
                swap = jnp.abs(aug[i][k]) > jnp.abs(aug[k][k])
                for c in range(k, 9):
                    a_k = aug[k][c]
                    a_i = aug[i][c]
                    aug[k][c] = jnp.where(swap, a_i, a_k)
                    aug[i][c] = jnp.where(swap, a_k, a_i)
            p = aug[k][k]
            valid = valid & (jnp.abs(p) > 1e-7)
            inv_p = 1.0 / jnp.where(jnp.abs(p) < 1e-12, 1e-12, p)
            for i in range(k + 1, 8):
                f = aug[i][k] * inv_p
                for c in range(k + 1, 9):
                    aug[i][c] = aug[i][c] - f * aug[k][c]
        h = [zero] * 8
        for k in range(7, -1, -1):
            acc = aug[k][8]
            for c in range(k + 1, 8):
                acc = acc - aug[k][c] * h[c]
            p = aug[k][k]
            h[k] = acc / jnp.where(jnp.abs(p) < 1e-12, 1e-12, p)

        # Denormalize: H = Td^-1 Hn Ts with
        #   Ts = [[ss,0,-ss*smx],[0,ss,-ss*smy],[0,0,1]]
        #   Td^-1 = [[1/sd,0,dmx],[0,1/sd,dmy],[0,0,1]]
        hn = h + [one]
        m = [None] * 9  # M = Hn @ Ts
        for r in range(3):
            a, b, c = hn[3 * r], hn[3 * r + 1], hn[3 * r + 2]
            m[3 * r] = a * ss
            m[3 * r + 1] = b * ss
            m[3 * r + 2] = -ss * (a * smx + b * smy) + c
        inv_sd = 1.0 / sd
        H = [
            m[0] * inv_sd + dmx * m[6], m[1] * inv_sd + dmx * m[7],
            m[2] * inv_sd + dmx * m[8],
            m[3] * inv_sd + dmy * m[6], m[4] * inv_sd + dmy * m[7],
            m[5] * inv_sd + dmy * m[8],
            m[6], m[7], m[8],
        ]

        # Score all points.
        count = jnp.zeros((SUB, LAN), jnp.float32)
        msac = jnp.zeros((SUB, LAN), jnp.float32)
        for n in range(n_score):
            x = src_ref[n, 0]
            y = src_ref[n, 1]
            px = dst_ref[n, 0]
            py = dst_ref[n, 1]
            w_pt = mask_ref[n]
            u = H[0] * x + H[1] * y + H[2]
            v = H[3] * x + H[4] * y + H[5]
            w = H[6] * x + H[7] * y + H[8]
            inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
            du = u * inv_w - px
            dv = v * inv_w - py
            e2 = du * du + dv * dv
            count = count + jnp.where(e2 <= thr_sq, w_pt, 0.0)
            msac = msac + jnp.minimum(e2, thr_sq) * w_pt

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        packed = (idx[0] + idx[1] * 16 + idx[2] * 256 + idx[3] * 4096)
        # Per-hypothesis records (12 B each; the argmin runs in XLA).
        fbest_ref[0] = msac
        fbest_ref[1] = count
        ibest_ref[0] = packed

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_hyp", "n_points", "interpret"))
def homography_ransac_sweep(
    seed: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
    point_mask: jnp.ndarray, threshold, n_hyp: int,
    n_points: int | None = None, interpret: bool = False,
):
    """Run the fused sweep.  Returns per-hypothesis (msac [H], counts [H],
    packed_idx [H]); take argmin(msac) and ``unpack_sample`` the winner.
    Invalid hypotheses carry msac ~ 3.4e38.

    ``n_points`` (static) is the sample pool size (first n_points rows of
    src/dst must be valid); scoring uses all rows weighted by point_mask.
    """
    n = src.shape[0]
    if n_points is None:
        n_points = n
    assert n <= MAX_POINTS
    n_blocks = max(n_hyp // BLOCK_H, 1)

    src_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(src)
    dst_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(dst)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = jnp.asarray(threshold, jnp.float32).reshape(1) ** 2
    key = jax.random.key(jnp.asarray(seed, jnp.uint32))
    # Hypothesis (s, b, l) lives at flat index s*(n_blocks*LAN) + b*LAN + l;
    # all tensors below use that order consistently.
    bits = jax.random.bits(key, (4, SUB, n_blocks * LAN), jnp.uint32)

    kernel = _make_kernel(n_points, n)
    fbest, ibest = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # src
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dst
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr^2
            pl.BlockSpec((4, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),  # random bits
        ],
        out_specs=(
            pl.BlockSpec((2, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, SUB, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((1, SUB, n_blocks * LAN), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (1400 + 22 * n), transcendentals=n_hyp * 8,
            bytes_accessed=n_blocks * 16),
    )(src_p, dst_p, mask_p, thr, bits)
    return (fbest[0].reshape(-1), fbest[1].reshape(-1),
            ibest[0].reshape(-1))


def unpack_sample(packed: int) -> np.ndarray:
    p = int(packed)
    return np.array([p & 15, (p >> 4) & 15, (p >> 8) & 15, (p >> 12) & 15],
                    dtype=np.int32)
