"""Round-3 experiments on the N<=16 flagship homography sweep kernel.

VERDICT r2 #1: the small-N fused sweeps trail the large-N family in VPU
issue utilization; lift them.  At the chained 3.49B hyp/s the kernel is
~51% of the measured 5.93T slots/s ceiling at the analytic 870 slots/hyp
(n=13), so real gains must come from REMOVING slots, not just scheduling.
This harness measures (a) a stage decomposition of the production kernel
and (b) candidate slot-reduction variants, all with the chained
`_time_best` protocol (PERF.md methodology):

decomposition (what does each stage cost?):
  base      production kernel verbatim (4-fmix+mod sampling, tree gather,
            adjugate solve, reciprocal score)
  noscore   score loop removed (count <- sum of H coeffs; keeps data deps)
  nogather  gathered coords replaced by arithmetic on the drawn indices
  nosample  indices replaced by cheap iota-derived values (keeps gather)
  nosolve   H coeffs replaced by cheap arithmetic on gathered coords

variants (candidate production changes):
  algscore  division-deferred scoring: r2 <= thr^2*w^2 exact inlier test,
            MSAC via min(r2, t)*approx_recip(w^2) (NaN-guarded)
  fields    2 fmix draws -> 4x 16-bit fields + exact-scale float range
            reduction (replaces 4 fmix + 4 integer mod-by-constant)
  shared3   8 sublanes of a lane share a random 3-subset ([1, LAN] tiles,
            1/8 the vector work) + a per-sublane 4th point; the 4-subset
            marginal stays exactly uniform (each 4-set arises from 4
            triples x uniform 4th: P = 4/(C(n,3)*(n-3)) = 1/C(n,4))
  combo     algscore + fields + shared3

Usage: python tools/exp_small.py [names...]   (default: all)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from ransac_tpu.ops.pallas.gather import tree_gather_many
from ransac_tpu.ops.pallas.roofline import _time_best
from ransac_tpu.ops.pallas.sweep import _fmix

BLOCK_H = 4096
SUB = 8
LAN = BLOCK_H // SUB
MAX_POINTS = 16
N_HYP = 1 << 22
N_POINTS = 13


def _make_kernel(n_points, n_score, *, score_mode="recip",
                 sample_mode="fmix4", drop=None):
    """Variant kernel builder; `drop` in {score,gather,sample,solve}."""

    def kernel(src_ref, dst_ref, mask_ref, thr_ref, seed_ref, vmask_ref,
               fbest_ref, ibest_ref):
        thr_sq = thr_ref[0]
        shared3 = sample_mode == "shared3"

        # ---- sampling ----
        if shared3:
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LAN), 1)
            flat_lane = pl.program_id(0) * LAN + lane1
            flu = pltpu.bitcast(flat_lane, jnp.uint32)
            # FY 3-subset on [1, LAN] tiles; insertion network yields the
            # triple in sorted order (s0 < s1 < s2).
            tri = []
            tri_sorted = []
            for j in range(3):
                h = _fmix(flu ^ seed_ref[j])
                u16 = ((jax.lax.bitcast_convert_type(h, jnp.int32) >> 16)
                       & jnp.int32(0xFFFF)).astype(jnp.float32)
                r = (u16 * jnp.float32((n_points - j) / 65536.0)
                     ).astype(jnp.int32)
                for s in tri_sorted:
                    r = r + (r >= s).astype(jnp.int32)
                ins = r
                out = []
                for s in tri_sorted:
                    lo = jnp.minimum(s, ins)
                    hi = jnp.maximum(s, ins)
                    out.append(lo)
                    ins = hi
                out.append(ins)
                tri_sorted = out
                tri.append(r)
            # 4th point per (sub, lane): uniform over the n-3 others.
            sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
            flat = pl.program_id(0) * BLOCK_H + sub * LAN + lane
            h = _fmix(pltpu.bitcast(flat, jnp.uint32) ^ seed_ref[3])
            u16 = ((jax.lax.bitcast_convert_type(h, jnp.int32) >> 16)
                   & jnp.int32(0xFFFF)).astype(jnp.float32)
            d = (u16 * jnp.float32((n_points - 3) / 65536.0)
                 ).astype(jnp.int32)
            for s in tri_sorted:
                d = d + (d >= s).astype(jnp.int32)
            idx = [jnp.broadcast_to(t, (SUB, LAN)) for t in tri] + [d]
        else:
            sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
            flat = pl.program_id(0) * BLOCK_H + sub * LAN + lane
            flatu = pltpu.bitcast(flat, jnp.uint32)
            if drop == "sample":
                # cheap in-range indices (duplicates fine: timing only)
                idx = [(flat + j) & jnp.int32(7) for j in range(4)]
            elif sample_mode == "fields":
                h0 = _fmix(flatu ^ seed_ref[0])
                h1 = _fmix(flatu ^ seed_ref[1])
                hi = [h0, h0, h1, h1]
                sh = [16, 0, 16, 0]
                idx = []
                sorted_idx = []
                for j in range(4):
                    u16 = ((jax.lax.bitcast_convert_type(hi[j], jnp.int32)
                            >> sh[j]) & jnp.int32(0xFFFF)
                           ).astype(jnp.float32)
                    r = (u16 * jnp.float32((n_points - j) / 65536.0)
                         ).astype(jnp.int32)
                    for s in sorted_idx:
                        r = r + (r >= s).astype(jnp.int32)
                    ins = r
                    out = []
                    for s in sorted_idx:
                        lo = jnp.minimum(s, ins)
                        hi2 = jnp.maximum(s, ins)
                        out.append(lo)
                        ins = hi2
                    out.append(ins)
                    sorted_idx = out
                    idx.append(r)
            else:  # fmix4 (production)
                bits = [_fmix(flatu ^ seed_ref[j]) for j in range(4)]
                idx = []
                for j in range(4):
                    r = (bits[j] % jnp.uint32(n_points - j)).astype(
                        jnp.int32)
                    prev_sorted = []
                    for p in idx:
                        ins = p
                        out = []
                        for s in prev_sorted:
                            lo = jnp.minimum(s, ins)
                            hi2 = jnp.maximum(s, ins)
                            out.append(lo)
                            ins = hi2
                        out.append(ins)
                        prev_sorted = out
                    for s in prev_sorted:
                        r = r + (r >= s).astype(jnp.int32)
                    idx.append(r)

        vmask = vmask_ref[0]
        ok_bits = ((vmask >> idx[0]) & (vmask >> idx[1])
                   & (vmask >> idx[2]) & (vmask >> idx[3]))
        valid = (ok_bits & 1) == 1

        # ---- gather ----
        if drop == "gather":
            f = [i.astype(jnp.float32) for i in idx]
            sx = [f[j] * 0.1 for j in range(4)]
            sy = [f[j] * 0.07 + 0.01 for j in range(4)]
            dx = [f[j] * -0.05 + 0.2 for j in range(4)]
            dy = [f[j] * 0.03 - 0.1 for j in range(4)]
        else:
            cols = [[src_ref[n, 0] for n in range(n_points)],
                    [src_ref[n, 1] for n in range(n_points)],
                    [dst_ref[n, 0] for n in range(n_points)],
                    [dst_ref[n, 1] for n in range(n_points)]]
            g = [tree_gather_many(i, cols, n_points) for i in idx]
            sx = [g[j][0] for j in range(4)]
            sy = [g[j][1] for j in range(4)]
            dx = [g[j][2] for j in range(4)]
            dy = [g[j][3] for j in range(4)]

        # ---- solve ----
        if drop == "solve":
            H = [sx[0] + dy[1], sy[1] * dx[2], sx[2] - dy[3],
                 sy[0] * dx[1], sx[1] + dy[2], sy[2] * dx[3],
                 sx[3] * 1e-3, sy[3] * 1e-3,
                 dx[0] + dy[0] + jnp.float32(1.0)]
        else:
            def det3(px, py, qx, qy, rx, ry):
                return (qx - px) * (ry - py) - (rx - px) * (qy - py)

            def frame(xs, ys):
                d0 = det3(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2])
                l1 = det3(xs[3], ys[3], xs[1], ys[1], xs[2], ys[2])
                l2 = det3(xs[0], ys[0], xs[3], ys[3], xs[2], ys[2])
                l3 = det3(xs[0], ys[0], xs[1], ys[1], xs[3], ys[3])
                M = [[l1 * xs[0], l2 * xs[1], l3 * xs[2]],
                     [l1 * ys[0], l2 * ys[1], l3 * ys[2]],
                     [l1, l2, l3]]
                ok = ((jnp.abs(d0) > 1e-7) & (jnp.abs(l1) > 1e-7)
                      & (jnp.abs(l2) > 1e-7) & (jnp.abs(l3) > 1e-7))
                return M, ok

            A, ok_s = frame(sx, sy)
            B, ok_d = frame(dx, dy)
            valid = valid & ok_s & ok_d
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
                    H[3 * r + c] = (B[r][0] * adjA[0][c]
                                    + B[r][1] * adjA[1][c]
                                    + B[r][2] * adjA[2][c])

        # ---- score ----
        count = jnp.zeros((SUB, LAN), jnp.float32)
        msac = jnp.zeros((SUB, LAN), jnp.float32)
        if drop == "score":
            count = H[0] + H[4]
            msac = H[8] + H[2]
        elif score_mode == "alg":
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
                count = count + jnp.where(r2 <= t, w_pt, 0.0)
                iw2 = pl.reciprocal(w2, approx=True)
                msac = msac + jnp.minimum(r2, t) * iw2 * w_pt
        else:
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
        count = jnp.where(valid, count, -1.0)
        packed = (idx[0] + idx[1] * 16 + idx[2] * 256 + idx[3] * 4096)

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


@functools.partial(jax.jit, static_argnames=(
    "n_hyp", "n_points", "score_mode", "sample_mode", "drop"))
def run_variant(seed, src, dst, point_mask, threshold, n_hyp,
                n_points, score_mode="recip", sample_mode="fmix4",
                drop=None):
    n = src.shape[0]
    n_blocks = max(n_hyp // BLOCK_H, 1)

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
    seed_u = jnp.asarray(seed, jnp.uint32)
    seeds = _fmix(seed_u + jnp.arange(1, 5, dtype=jnp.uint32)
                  * jnp.uint32(0x9E3779B9))
    vmask = jnp.sum(
        jnp.where(mask_p > 0, jnp.int32(1) << jnp.arange(MAX_POINTS), 0)
    ).reshape(1).astype(jnp.int32)

    kernel = _make_kernel(n_points, n, score_mode=score_mode,
                          sample_mode=sample_mode, drop=drop)
    fbest, ibest = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
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
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * 870, transcendentals=0,
            bytes_accessed=n_blocks * 24),
    )(src_p, dst_p, mask_p, thr, seeds, vmask)
    return fbest, ibest


def _problem():
    rng = np.random.default_rng(0)
    H_true = np.array([[900.0, 40.0, 500.0], [-15.0, 850.0, 400.0],
                       [1e-3, 2e-3, 1.0]])
    src = rng.uniform(-1.5, 1.5, size=(N_POINTS, 2)).astype(np.float32)
    pts = np.concatenate([src, np.ones((N_POINTS, 1))], 1) @ H_true.T
    dst = (pts[:, :2] / pts[:, 2:]).astype(np.float32)
    dst += rng.normal(scale=1.0, size=dst.shape).astype(np.float32)
    dst[10:] += 300.0
    return (jnp.asarray(src), jnp.asarray(dst),
            jnp.ones(N_POINTS, jnp.float32))


VARIANTS = {
    "base": {},
    "noscore": {"drop": "score"},
    "nogather": {"drop": "gather"},
    "nosample": {"drop": "sample"},
    "nosolve": {"drop": "solve"},
    "algscore": {"score_mode": "alg"},
    "fields": {"sample_mode": "fields"},
    "shared3": {"sample_mode": "shared3"},
    "combo": {"score_mode": "alg", "sample_mode": "shared3"},
    "combo_f": {"score_mode": "alg", "sample_mode": "fields"},
}


def bench(name):
    kw = VARIANTS[name]
    src, dst, mask = _problem()

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def body(_, carry):
            s, acc = carry
            fbest, ibest = run_variant(s, src, dst, mask, 75.0, N_HYP,
                                       N_POINTS, **kw)
            cnt = fbest[3]
            return (s + jnp.int32(1) + (cnt[0] < -1.0).astype(jnp.int32),
                    acc + cnt[0])
        _, acc = jax.lax.fori_loop(0, n_rep, body,
                                   (seed0, jnp.float32(0.0)))
        return acc

    t0 = time.time()
    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3, small=1,
                    large=5)
    rate = N_HYP / dt
    # sanity: consensus found (skip for decomposition variants)
    note = ""
    if not kw.get("drop"):
        fbest, _ = jax.jit(run_variant, static_argnames=(
            "n_hyp", "n_points", "score_mode", "sample_mode", "drop"))(
            jnp.int32(7), src, dst, mask, 75.0, N_HYP, N_POINTS, **kw)
        best_count = float(jnp.max(fbest[3]))
        note = f" max_count={best_count:.0f}"
        assert best_count >= 10, (name, best_count)
    print(f"{name:10s} {dt*1e3:7.3f} ms  {rate/1e9:6.3f} B hyp/s"
          f"  (compile+run {time.time()-t0:.0f}s){note}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        try:
            bench(nm)
        except Exception as e:
            print(f"{nm:10s} FAILED: {type(e).__name__}: {e}", flush=True)
