"""Large-N fully-fused 8-point essential-matrix RANSAC sweep.

Extends the fused essential sweep (``sweep_essential.py``, <=16 points) to
correspondence pools of hundreds of points — the actual two-view matching
scale (BASELINE configs[2]); until now those sizes fell back to the
stage-wise engine (~4M hyp/s, HBM-bound).  Same large-N machinery as
``sweep_large.py``:

- in-kernel counter sampling (murmur3 hash + 24-bit float range
  reduction over an SMEM ``n_valid`` scalar; 8 Fisher-Yates draws),
- in-kernel one-hot gather of the 8 sampled correspondences from the
  SMEM point table (an XLA-side gather measured 35x the whole kernel
  cost at H=2^20 — TPU gathers over tiny tables are serial),
- the division- and pivot-free canonical-frame solve from
  ``sweep_essential.py`` (adjugate frames -> zero-diagonal F' -> 4x5
  generalized cross product), rank-2 enforcement deferred to host refit,
- a Sampson score ``fori_loop`` over all N SMEM points,
- counter replay: winner records carry flat hypothesis ids;
  ``sample_indices_for8`` re-derives the sample in XLA bit-identically.

Point table enters in valid-first order (stable argsort of the mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ransac_tpu.ops.pallas.sweep_large import (
    MAX_POINTS, UNROLL, WINDOW, _draw_seeds_n, _fmix, _fy_draws,
    _range_reduce, _shuffle_order_hash, _window_bases_hash, _wrap_mod)

SUB = 8
BLOCK_H = 2048     # LAN 256: N_ACC accumulators + 9 F tiles fit the vreg file
N_ACC = 4          # independent accumulator pairs (ops.pallas.sweep)

# Seed layout: 8 Fisher-Yates draw seeds + [8] window bases + [9] shuffle.
N_SEEDS = 10


def sample_indices_for8(flat, seeds, n_valid, block_h: int = BLOCK_H,
                        window: int = WINDOW):
    """[..., 8] pool-slot samples for flat hypothesis ids (XLA replay of
    the in-kernel sampler; identical results by construction).  Window
    bases are re-derived from ``flat // block_h`` (circular windows; see
    ``sweep_large.window_bases``)."""
    flat = jnp.asarray(flat)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    w_eff = jnp.minimum(jnp.int32(window), n_valid)
    block = (flat // block_h).astype(jnp.uint32)
    base_range = jnp.where(n_valid > jnp.int32(window), n_valid,
                           jnp.int32(1))
    wbase = _range_reduce(_fmix(block ^ seeds[8]), base_range)
    draws = _fy_draws(flat.astype(jnp.uint32), seeds, w_eff, k=8)
    return jnp.stack([_wrap_mod(wbase + d, n_valid) for d in draws],
                     axis=-1)


def minimal_f_canonical(x1s: jnp.ndarray, x2s: jnp.ndarray):
    """Plain-jnp replica of the kernel's canonical-frame 8-point solve.

    ``x1s``, ``x2s``: [8, 2] NORMALIZED sample coordinates (same
    normalization the sweep applied).  Returns (F [3,3] Frobenius-
    normalized unconstrained, ok).  Used by engine wrappers to re-solve a
    replayed winner with the numerics the kernel actually scored — a
    Hartley + f32 nullspace re-solve of the same sample measured 342 ->
    175 inliers on a planted 512-point scene (different rounding paths).
    """
    u1 = [x1s[j, 0] for j in range(8)]
    v1 = [x1s[j, 1] for j in range(8)]
    u2 = [x2s[j, 0] for j in range(8)]
    v2 = [x2s[j, 1] for j in range(8)]

    def det3(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (rx - px) * (qy - py)

    def frame_adj(xs, ys):
        d0 = det3(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2])
        l1 = det3(xs[3], ys[3], xs[1], ys[1], xs[2], ys[2])
        l2 = det3(xs[0], ys[0], xs[3], ys[3], xs[2], ys[2])
        l3 = det3(xs[0], ys[0], xs[1], ys[1], xs[3], ys[3])
        A = [[l1 * xs[0], l2 * xs[1], l3 * xs[2]],
             [l1 * ys[0], l2 * ys[1], l3 * ys[2]],
             [l1, l2, l3]]
        T = [[A[1][1] * A[2][2] - A[1][2] * A[2][1],
              A[0][2] * A[2][1] - A[0][1] * A[2][2],
              A[0][1] * A[1][2] - A[0][2] * A[1][1]],
             [A[1][2] * A[2][0] - A[1][0] * A[2][2],
              A[0][0] * A[2][2] - A[0][2] * A[2][0],
              A[0][2] * A[1][0] - A[0][0] * A[1][2]],
             [A[1][0] * A[2][1] - A[1][1] * A[2][0],
              A[0][1] * A[2][0] - A[0][0] * A[2][1],
              A[0][0] * A[1][1] - A[0][1] * A[1][0]]]
        ok = ((jnp.abs(d0) > 1e-7) & (jnp.abs(l1) > 1e-7)
              & (jnp.abs(l2) > 1e-7) & (jnp.abs(l3) > 1e-7))
        n2 = sum(T[r][c] * T[r][c] for r in range(3) for c in range(3))
        inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        T = [[T[r][c] * inv for c in range(3)] for r in range(3)]
        return T, ok

    T1, ok1 = frame_adj(u1[:4], v1[:4])
    T2, ok2 = frame_adj(u2[:4], v2[:4])
    valid = ok1 & ok2

    rows = []
    for j in range(4, 8):
        p = T1[0][0] * u1[j] + T1[0][1] * v1[j] + T1[0][2]
        q = T1[1][0] * u1[j] + T1[1][1] * v1[j] + T1[1][2]
        r = T1[2][0] * u1[j] + T1[2][1] * v1[j] + T1[2][2]
        s = T2[0][0] * u2[j] + T2[0][1] * v2[j] + T2[0][2]
        t = T2[1][0] * u2[j] + T2[1][1] * v2[j] + T2[1][2]
        w = T2[2][0] * u2[j] + T2[2][1] * v2[j] + T2[2][2]
        c0 = s * q
        rows.append([s * r - c0, t * p - c0, t * r - c0,
                     w * p - c0, w * q - c0])

    m01 = {}
    m23 = {}
    for i in range(5):
        for j in range(i + 1, 5):
            m01[i, j] = rows[0][i] * rows[1][j] - rows[0][j] * rows[1][i]
            m23[i, j] = rows[2][i] * rows[3][j] - rows[2][j] * rows[3][i]

    def det4(c0, c1, c2, c3):
        return (m01[c0, c1] * m23[c2, c3] - m01[c0, c2] * m23[c1, c3]
                + m01[c0, c3] * m23[c1, c2] + m01[c1, c2] * m23[c0, c3]
                - m01[c1, c3] * m23[c0, c2] + m01[c2, c3] * m23[c0, c1])

    f13 = det4(1, 2, 3, 4)
    f21 = -det4(0, 2, 3, 4)
    f23 = det4(0, 1, 3, 4)
    f31 = -det4(0, 1, 2, 4)
    f32 = det4(0, 1, 2, 3)
    f12 = -(f13 + f21 + f23 + f31 + f32)

    P = [[f12 * T1[1][c] + f13 * T1[2][c] for c in range(3)],
         [f21 * T1[0][c] + f23 * T1[2][c] for c in range(3)],
         [f31 * T1[0][c] + f32 * T1[1][c] for c in range(3)]]
    F = [T2[0][r] * P[0][c] + T2[1][r] * P[1][c] + T2[2][r] * P[2][c]
         for r in range(3) for c in range(3)]
    F = jnp.stack(F).reshape(3, 3)
    fn2 = jnp.sum(F * F)
    valid = valid & (fn2 > 1e-30)
    return F * jax.lax.rsqrt(jnp.maximum(fn2, 1e-36)), valid


def _make_kernel(n_score: int, block_h: int, n_rows: int):
    LAN = block_h // SUB
    gather_rows = min(WINDOW, n_rows)

    def kernel(pts_ref, thr_ref, seed_ref, nv_ref, wb_ref, fout_ref,
               iout_ref):
        thr_sq = thr_ref[0]
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
        idx = _fy_draws(flatu, [seed_ref[j] for j in range(8)], w_eff,
                        k=8)
        idx = [_wrap_mod(wbase + i, n_valid) for i in idx]

        # One-hot gather of the 8 sampled correspondences from the SMEM
        # point table — only the WINDOW rows a block can sample from
        # (valid-first order: idx < n_valid hits valid rows).  UNROLL
        # rows per trip: fori_loop trip overhead (~70 ns) would dominate.
        def gbody(n, acc):
            acc = list(acc)
            for u in range(UNROLL):
                row = wbase + (UNROLL * n + u)
                row = _wrap_mod(row, n_valid)
                a = pts_ref[row, 0]
                b = pts_ref[row, 1]
                c = pts_ref[row, 2]
                d = pts_ref[row, 3]
                for j in range(8):
                    sel = idx[j] == row
                    t = acc[j]
                    acc[j] = (jnp.where(sel, a, t[0]),
                              jnp.where(sel, b, t[1]),
                              jnp.where(sel, c, t[2]),
                              jnp.where(sel, d, t[3]))
            return tuple(acc)

        zero = jnp.zeros((SUB, LAN), jnp.float32)
        acc0 = tuple((zero, zero, zero, zero) for _ in range(8))
        g = jax.lax.fori_loop(0, gather_rows // UNROLL, gbody, acc0)
        u1 = [g[j][0] for j in range(8)]
        v1 = [g[j][1] for j in range(8)]
        u2 = [g[j][2] for j in range(8)]
        v2 = [g[j][3] for j in range(8)]

        # Canonical adjugate frames from the first 4 sampled points of
        # each image (see sweep_essential.py for the full derivation).
        def det3(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (rx - px) * (qy - py)

        def frame_adj(xs, ys):
            d0 = det3(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2])
            l1 = det3(xs[3], ys[3], xs[1], ys[1], xs[2], ys[2])
            l2 = det3(xs[0], ys[0], xs[3], ys[3], xs[2], ys[2])
            l3 = det3(xs[0], ys[0], xs[1], ys[1], xs[3], ys[3])
            A = [[l1 * xs[0], l2 * xs[1], l3 * xs[2]],
                 [l1 * ys[0], l2 * ys[1], l3 * ys[2]],
                 [l1, l2, l3]]
            T = [[A[1][1] * A[2][2] - A[1][2] * A[2][1],
                  A[0][2] * A[2][1] - A[0][1] * A[2][2],
                  A[0][1] * A[1][2] - A[0][2] * A[1][1]],
                 [A[1][2] * A[2][0] - A[1][0] * A[2][2],
                  A[0][0] * A[2][2] - A[0][2] * A[2][0],
                  A[0][2] * A[1][0] - A[0][0] * A[1][2]],
                 [A[1][0] * A[2][1] - A[1][1] * A[2][0],
                  A[0][1] * A[2][0] - A[0][0] * A[2][1],
                  A[0][0] * A[1][1] - A[0][1] * A[1][0]]]
            ok = ((jnp.abs(d0) > 1e-7) & (jnp.abs(l1) > 1e-7)
                  & (jnp.abs(l2) > 1e-7) & (jnp.abs(l3) > 1e-7))
            n2 = sum(T[r][c] * T[r][c] for r in range(3) for c in range(3))
            inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
            T = [[T[r][c] * inv for c in range(3)] for r in range(3)]
            return T, ok

        T1, ok1 = frame_adj(u1[:4], v1[:4])
        T2, ok2 = frame_adj(u2[:4], v2[:4])
        valid = ok1 & ok2

        rows = []
        for j in range(4, 8):
            p = T1[0][0] * u1[j] + T1[0][1] * v1[j] + T1[0][2]
            q = T1[1][0] * u1[j] + T1[1][1] * v1[j] + T1[1][2]
            r = T1[2][0] * u1[j] + T1[2][1] * v1[j] + T1[2][2]
            s = T2[0][0] * u2[j] + T2[0][1] * v2[j] + T2[0][2]
            t = T2[1][0] * u2[j] + T2[1][1] * v2[j] + T2[1][2]
            w = T2[2][0] * u2[j] + T2[2][1] * v2[j] + T2[2][2]
            c0 = s * q
            rows.append([s * r - c0, t * p - c0, t * r - c0,
                         w * p - c0, w * q - c0])

        m01 = {}
        m23 = {}
        for i in range(5):
            for j in range(i + 1, 5):
                m01[i, j] = rows[0][i] * rows[1][j] - rows[0][j] * rows[1][i]
                m23[i, j] = rows[2][i] * rows[3][j] - rows[2][j] * rows[3][i]

        def det4(c0, c1, c2, c3):
            return (m01[c0, c1] * m23[c2, c3] - m01[c0, c2] * m23[c1, c3]
                    + m01[c0, c3] * m23[c1, c2] + m01[c1, c2] * m23[c0, c3]
                    - m01[c1, c3] * m23[c0, c2] + m01[c2, c3] * m23[c0, c1])

        f13 = det4(1, 2, 3, 4)
        f21 = -det4(0, 2, 3, 4)
        f23 = det4(0, 1, 3, 4)
        f31 = -det4(0, 1, 2, 4)
        f32 = det4(0, 1, 2, 3)
        f12 = -(f13 + f21 + f23 + f31 + f32)

        P = [[f12 * T1[1][c] + f13 * T1[2][c] for c in range(3)],
             [f21 * T1[0][c] + f23 * T1[2][c] for c in range(3)],
             [f31 * T1[0][c] + f32 * T1[1][c] for c in range(3)]]
        F = [T2[0][r] * P[0][c] + T2[1][r] * P[1][c] + T2[2][r] * P[2][c]
             for r in range(3) for c in range(3)]
        fn2 = sum(f * f for f in F)
        valid = valid & (fn2 > 1e-30)
        finv = jax.lax.rsqrt(jnp.maximum(fn2, 1e-36))
        F = [f * finv for f in F]

        # Sampson score over the full SMEM table: rows (u1, v1, u2, v2, w).
        # UNROLL points per trip (padded rows carry w=0).
        # N_ACC independent accumulator pairs inside the unroll break
        # the serial accumulate chain (round-5 flagship finding,
        # ops.pallas.sweep.N_ACC); summed after the loop.
        def sbody(n, carry):
            counts, msacs = list(carry[0]), list(carry[1])
            for u_i in range(UNROLL):
                row = UNROLL * n + u_i
                a = pts_ref[row, 0]
                b = pts_ref[row, 1]
                c = pts_ref[row, 2]
                d = pts_ref[row, 3]
                wp = pts_ref[row, 4]
                Fx1_0 = F[0] * a + F[1] * b + F[2]
                Fx1_1 = F[3] * a + F[4] * b + F[5]
                Fx1_2 = F[6] * a + F[7] * b + F[8]
                Ftx2_0 = F[0] * c + F[3] * d + F[6]
                Ftx2_1 = F[1] * c + F[4] * d + F[7]
                x2Fx1 = c * Fx1_0 + d * Fx1_1 + Fx1_2
                denom = (Fx1_0 * Fx1_0 + Fx1_1 * Fx1_1
                         + Ftx2_0 * Ftx2_0 + Ftx2_1 * Ftx2_1)
                # Division-deferred Sampson test (EXACT rewrite of the
                # old n2/dmax <= thr — see sweep_essential.py).
                dmax = jnp.maximum(denom, 1e-12)
                n2_ = x2Fx1 * x2Fx1
                t2_ = thr_sq * dmax
                k = u_i % N_ACC
                counts[k] = counts[k] + jnp.where(n2_ <= t2_, wp, 0.0)
                msacs[k] = msacs[k] + (jnp.minimum(n2_, t2_)
                                       * pl.reciprocal(dmax, approx=True)
                                       * wp)
            return tuple(counts), tuple(msacs)

        counts, msacs = jax.lax.fori_loop(
            0, n_rows // UNROLL, sbody,
            (tuple(zero for _ in range(N_ACC)),
             tuple(zero for _ in range(N_ACC))))
        count = counts[0]
        msac = msacs[0]
        for k in range(1, N_ACC):
            count = count + counts[k]
            msac = msac + msacs[k]

        big = jnp.float32(3.4e38)
        msac = jnp.where(valid, msac, big)
        count = jnp.where(valid, count, -1.0)

        msac_m = jnp.min(msac, axis=0, keepdims=True)
        selm = msac == msac_m
        flat_m = jnp.min(jnp.where(selm, flat, 2 ** 30),
                         axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (flat == flat_m), count, -2.0),
                          axis=0, keepdims=True)
        count_c = jnp.max(count, axis=0, keepdims=True)
        selc = count == count_c
        msac_c = jnp.min(jnp.where(selc, msac, big), axis=0, keepdims=True)
        flat_c = jnp.min(jnp.where(selc & (msac == msac_c), flat, 2 ** 30),
                         axis=0, keepdims=True)
        fout_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        iout_ref[...] = jnp.concatenate([flat_m, flat_c], axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_hyp", "interpret", "block_h"))
def essential_ransac_sweep_large(
    seed, x1: jnp.ndarray, x2: jnp.ndarray, point_mask: jnp.ndarray,
    threshold_sq, n_hyp: int, interpret: bool = False,
    block_h: int | None = None,
):
    """Run the large-N fused 8-point sweep on normalized coords.

    ``threshold_sq`` is the Sampson bound in squared normalized units.
    Returns ``(msac [2, B], counts [2, B], flat_id [2, B], aux)`` with
    B = max(n_hyp, min_blocks * block_h) / 8 (small n_hyp is rounded up
    to MIN_WINDOWED_BLOCKS independent windows when n > WINDOW);
    row 0 = min-MSAC records, row 1 = lexicographic
    (max count, min MSAC).  ``aux = (seeds, n_valid, order)`` for replay
    via ``sample_indices_for8`` + ``order`` mapping.  Requires >= 8
    valid points and N <= 1024.
    """
    n = x1.shape[0]
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
    order = _shuffle_order_hash(seeds[9], maskf)

    # Shared-scale normalization over valid points (Sampson decisions are
    # unchanged — numerator and denominator both pick up s^2, threshold
    # scaled along; see sweep_essential.py).
    wsum = jnp.maximum(maskf.sum(), 1.0)
    m1 = jnp.sum(x1 * maskf[:, None], 0) / wsum
    m2 = jnp.sum(x2 * maskf[:, None], 0) / wsum
    d = (jnp.sum(jnp.sqrt(jnp.sum((x1 - m1) ** 2, -1)) * maskf)
         + jnp.sum(jnp.sqrt(jnp.sum((x2 - m2) ** 2, -1)) * maskf))
    s = 1.4142135623730951 / jnp.maximum(d / (2 * wsum), 1e-12)
    x1_n = (x1 - m1) * s
    x2_n = (x2 - m2) * s
    thr = jnp.asarray(threshold_sq, jnp.float32).reshape(1) * s * s

    pts = jnp.concatenate(
        [x1_n, x2_n, maskf[:, None]], axis=1).astype(jnp.float32)[order]
    # Pad to a multiple of UNROLL rows (padded rows carry w = 0).
    n_rows = -(-n // UNROLL) * UNROLL
    if n_rows > n:
        pts = jnp.concatenate(
            [pts, jnp.zeros((n_rows - n, 5), jnp.float32)])
    wb = _window_bases_hash(seeds[8], n_blocks, n_valid, WINDOW)

    fout, iout = pl.pallas_call(
        _make_kernel(n, block_h, n_rows),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # point table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr (squared units)
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
            flops=n_hyp * (1400 + 40 * min(WINDOW, n_rows) + 45 * n),
            transcendentals=0, bytes_accessed=n_blocks * 24),
    )(pts, thr, seeds, n_valid.reshape(1), wb)

    inv_s2 = 1.0 / (s * s)
    msac = jnp.where(fout[jnp.array([0, 2])] >= jnp.float32(3e38),
                     jnp.float32(3.4e38),
                     fout[jnp.array([0, 2])] * inv_s2)
    return (msac, fout[jnp.array([1, 3])], iout,
            (seeds, n_valid, order, (m1, m2, s)))


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per hypothesis (SoL accounting; see
    ``sweep_essential.issue_slots_per_hyp``).  One-hot gather of 8 draws
    x 4 columns costs 8 cmp + 32 sel = 40/row over the WINDOW rows a
    block samples from; Sampson scoring ~45 per pool row."""
    return 1100 + 40 * min(WINDOW, n_points) + 45 * n_points
