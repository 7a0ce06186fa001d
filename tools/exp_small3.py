"""Round-5 experiments on the N<=16 flagship homography sweep kernel.

VERDICT r4 #2: the flagship runs at 44% issue while its siblings hit
79-87%.  The round-3 stage split showed the score loop is 84% of kernel
time, yet it measures ~73 slot-equivalents per point against a counted
30 — either the loop is NOT issue-bound (the prime suspect is vector
register pressure: 9 live H coefficient tiles + 2 accumulators at
LAN=512 is 44 vregs before temporaries, against a 64-vreg file) or the
audit undercounts.  Variants:

  base      production kernel verbatim (BLOCK_H=4096, LAN=512)
  lan256    BLOCK_H=2048 (every tile 2 vregs: halves live registers)
  lan128    BLOCK_H=1024 (every tile 1 vreg)
  lan1024   BLOCK_H=8192 (recheck the round-3 "bigger is slower")
  dualacc   two independent (count, msac) accumulator pairs, summed at
            the end — breaks the serial accumulate dependency chain
  nocount   MSAC-only scoring (drops cmp/sel/add per point; the engine's
            count rule recomputed on the host for the single winner)
  hyp2      2 hypotheses per (SUB, LAN) element pair... (not impl)
  mxu       u,v,w projections on the MXU: [BLOCK_H, 8] hypothesis
            matrix x [8, 3N] point matrix, elementwise tail on the
            [BLOCK_H, 3N] product (layout experiment)

Usage: python tools/exp_small3.py [names...]   (default: quick set)
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

MAX_POINTS = 16
N_HYP = 1 << 22
N_POINTS = 13
SUB = 8


def _make_kernel(n_points, n_score, lan, *, acc=1, count=True,
                 drop=None):
    LAN = lan
    BLOCK_H = SUB * LAN

    def kernel(src_ref, dst_ref, mask_ref, thr_ref, seed_ref, vmask_ref,
               fbest_ref, ibest_ref):
        thr_sq = thr_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * BLOCK_H + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        bits = [_fmix(flatu ^ seed_ref[j]) for j in range(4)]
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

        vmask = vmask_ref[0]
        ok_bits = ((vmask >> idx[0]) & (vmask >> idx[1])
                   & (vmask >> idx[2]) & (vmask >> idx[3]))
        valid = (ok_bits & 1) == 1

        cols = [[src_ref[n, 0] for n in range(n_points)],
                [src_ref[n, 1] for n in range(n_points)],
                [dst_ref[n, 0] for n in range(n_points)],
                [dst_ref[n, 1] for n in range(n_points)]]
        g = [tree_gather_many(i, cols, n_points) for i in idx]
        sx = [g[j][0] for j in range(4)]
        sy = [g[j][1] for j in range(4)]
        dx = [g[j][2] for j in range(4)]
        dy = [g[j][3] for j in range(4)]

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
                H[3 * r + c] = (B[r][0] * adjA[0][c] + B[r][1] * adjA[1][c]
                                + B[r][2] * adjA[2][c])

        counts = [jnp.zeros((SUB, LAN), jnp.float32) for _ in range(acc)]
        msacs = [jnp.zeros((SUB, LAN), jnp.float32) for _ in range(acc)]
        if drop == "score":
            counts[0] = H[0] + H[4]
            msacs[0] = H[8] + H[2]
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
                a = u - px * w
                b = v - py * w
                r2 = a * a + b * b
                w2 = jnp.maximum(w * w, jnp.float32(1e-30))
                t = thr_sq * w2
                iw2 = pl.reciprocal(w2, approx=True)
                k = n % acc
                if count:
                    counts[k] = counts[k] + jnp.where(r2 <= t, w_pt, 0.0)
                msacs[k] = msacs[k] + jnp.minimum(r2, t) * iw2 * w_pt
        cnt = counts[0]
        msac = msacs[0]
        for k in range(1, acc):
            cnt = cnt + counts[k]
            msac = msac + msacs[k]
        if not count:
            # count := -msac so the lexicographic rule degenerates to
            # min-MSAC (timing variant; host recomputes the true count).
            cnt = -msac

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        cnt = jnp.where(valid, cnt, -1.0)
        packed = (idx[0] + idx[1] * 16 + idx[2] * 256 + idx[3] * 4096)

        msac_m = jnp.min(msac, axis=0, keepdims=True)
        selm = msac == msac_m
        packed_m = jnp.min(jnp.where(selm, packed, 2 ** 30),
                           axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (packed == packed_m),
                                    cnt, -2.0), axis=0, keepdims=True)
        count_c = jnp.max(cnt, axis=0, keepdims=True)
        selc = cnt == count_c
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
    "n_hyp", "n_points", "lan", "acc", "count", "drop"))
def run_variant(seed, src, dst, point_mask, threshold, n_hyp,
                n_points, lan=512, acc=1, count=True, drop=None):
    n = src.shape[0]
    BLOCK_H = SUB * lan
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

    kernel = _make_kernel(n_points, n, lan, acc=acc, count=count,
                          drop=drop)
    fbest, ibest = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
        out_specs=(
            pl.BlockSpec((4, lan), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lan), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, n_blocks * lan), jnp.float32),
            jax.ShapeDtypeStruct((2, n_blocks * lan), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * 500, transcendentals=0,
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
    "lan256": {"lan": 256},
    "lan128": {"lan": 128},
    "lan1024": {"lan": 1024},
    "dualacc": {"acc": 2},
    "quadacc": {"acc": 4},
    "nocount": {"count": False},
    "octacc": {"acc": 8},
    "hexacc": {"acc": 16},
    "quadnocount": {"acc": 4, "count": False},
    "octacc256": {"acc": 8, "lan": 256},
    "quadacc256": {"acc": 4, "lan": 256},
    "octacc128": {"acc": 8, "lan": 128},
    "hexacc256": {"acc": 16, "lan": 256},
    "hexacc128": {"acc": 16, "lan": 128},
    "quadacc128": {"acc": 4, "lan": 128},
    "noscore256o": {"drop": "score", "lan": 256, "acc": 8},
    "noscore": {"drop": "score"},
    "noscore128": {"drop": "score", "lan": 128},
    "lan128dual": {"lan": 128, "acc": 2},
    "lan256dual": {"lan": 256, "acc": 2},
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
    note = ""
    if not kw.get("drop") and kw.get("count", True):
        fbest, _ = run_variant(jnp.int32(7), src, dst, mask, 75.0,
                               N_HYP, N_POINTS, **kw)
        best_count = float(jnp.max(fbest[3]))
        note = f" max_count={best_count:.0f}"
        assert best_count >= 10, (name, best_count)
    print(f"{name:12s} {dt*1e3:7.3f} ms  {rate/1e9:6.3f} B hyp/s"
          f"  (compile+run {time.time()-t0:.0f}s){note}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "lan256", "lan128", "lan1024",
                             "dualacc", "nocount", "noscore"]
    for nm in names:
        try:
            bench(nm)
        except Exception as e:
            print(f"{nm:12s} FAILED: {type(e).__name__}: {e}", flush=True)
