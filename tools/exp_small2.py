"""Round-3 experiments, part 2: score-loop block size + wrapper overhead.

Part-1 findings (tools/exp_small.py, chained timing, n=13, 2^22 hyp):
  base     0.716 ms  5.86 B/s   (kernel only; BENCH_r02's 3.49B includes
                                 ~0.5 ms of wrapper+argmin overhead)
  noscore  0.113 ms  -> score loop is 84% of kernel time
  algscore 0.642 ms  6.54 B/s   (division-deferred scoring wins)
  fields/shared3: slower — discarded.

This part measures:
  lan512/lan1024/lan2048  algscore kernel at BLOCK_H = 4096/8192/16384
  nomask*                 masked points poisoned at ingest (coords sent
                          far away) so the kernel scores with NO per-point
                          w_pt factor; masked points contribute exactly
                          thr^2 to every hypothesis's msac (a constant
                          rank-preserving shift the wrapper subtracts)
  stepfull                production wrapper + argmin + winner fetch (the
                          bench.py step) — isolates dispatch overhead
  steplean                wrapper with argmin on RAW records (rescale the
                          winner only; argmin is scale-invariant)
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
from ransac_tpu.ops.pallas.sweep import _fmix, homography_ransac_sweep

SUB = 8
MAX_POINTS = 16
N_HYP = 1 << 22
N_POINTS = 13


def _make_kernel(n_points, n_score, lan, nomask):
    def kernel(src_ref, dst_ref, mask_ref, thr_ref, seed_ref, vmask_ref,
               fbest_ref, ibest_ref):
        block_h = SUB * lan
        thr_sq = thr_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, lan), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, lan), 1)
        flat = pl.program_id(0) * block_h + sub * lan + lane
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

        count = jnp.zeros((SUB, lan), jnp.float32)
        msac = jnp.zeros((SUB, lan), jnp.float32)
        for n in range(n_score):
            x = src_ref[n, 0]
            y = src_ref[n, 1]
            px = dst_ref[n, 0]
            py = dst_ref[n, 1]
            u = H[0] * x + H[1] * y + H[2]
            v = H[3] * x + H[4] * y + H[5]
            w = H[6] * x + H[7] * y + H[8]
            a = u - px * w
            b = v - py * w
            r2 = a * a + b * b
            w2 = jnp.maximum(w * w, jnp.float32(1e-30))
            t = thr_sq * w2
            iw2 = pl.reciprocal(w2, approx=True)
            if nomask:
                count = count + jnp.where(r2 <= t, 1.0, 0.0)
                msac = msac + jnp.minimum(r2, t) * iw2
            else:
                w_pt = mask_ref[n]
                count = count + jnp.where(r2 <= t, w_pt, 0.0)
                msac = msac + jnp.minimum(r2, t) * iw2 * w_pt

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


@functools.partial(jax.jit, static_argnames=("n_hyp", "n_points", "lan",
                                             "nomask"))
def run_variant(seed, src, dst, point_mask, threshold, n_hyp, n_points,
                lan=512, nomask=False):
    n = src.shape[0]
    block_h = SUB * lan
    n_blocks = max(n_hyp // block_h, 1)

    def _norm_params(a):
        m = jnp.sum(a[:n_points], 0) / n_points
        d = jnp.sqrt(jnp.sum((a[:n_points] - m) ** 2, -1))
        s = 1.4142135623730951 / jnp.maximum(jnp.sum(d) / n_points, 1e-12)
        return m, s

    sm, s_src = _norm_params(src)
    dm, s_dst = _norm_params(dst)
    maskf = point_mask.astype(jnp.float32)
    src_n = (src - sm) * s_src
    dst_n = (dst - dm) * s_dst
    if nomask:
        # Poison masked/padded points: far-away dst guarantees outlier
        # status, so each contributes exactly thr^2 to every msac — a
        # constant shift the caller subtracts (rank-preserving).
        far = jnp.float32(1e6)
        src_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(src_n)
        dst_p = jnp.full((MAX_POINTS, 2), far).at[:n].set(
            jnp.where(maskf[:, None] > 0, dst_n, far))
    else:
        src_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(src_n)
        dst_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(dst_n)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(maskf)
    thr = (jnp.asarray(threshold, jnp.float32).reshape(1) * s_dst) ** 2
    seed_u = jnp.asarray(seed, jnp.uint32)
    seeds = _fmix(seed_u + jnp.arange(1, 5, dtype=jnp.uint32)
                  * jnp.uint32(0x9E3779B9))
    vmask = jnp.sum(
        jnp.where(mask_p > 0, jnp.int32(1) << jnp.arange(MAX_POINTS), 0)
    ).reshape(1).astype(jnp.int32)

    kernel = _make_kernel(n_points, n, lan, nomask)
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


def bench_kernel(name, lan, nomask):
    src, dst, mask = _problem()

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def body(_, carry):
            s, acc = carry
            fbest, ibest = run_variant(s, src, dst, mask, 75.0, N_HYP,
                                       N_POINTS, lan=lan, nomask=nomask)
            cnt = fbest[3]
            return (s + jnp.int32(1) + (cnt[0] < -1.0).astype(jnp.int32),
                    acc + cnt[0])
        _, acc = jax.lax.fori_loop(0, n_rep, body,
                                   (seed0, jnp.float32(0.0)))
        return acc

    t0 = time.time()
    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=5, small=1,
                    large=17)
    fbest, _ = run_variant(jnp.int32(7), src, dst, mask, 75.0, N_HYP,
                           N_POINTS, lan=lan, nomask=nomask)
    mx = float(jnp.max(fbest[3]))
    print(f"{name:10s} {dt*1e3:7.3f} ms  {N_HYP/dt/1e9:6.3f} B hyp/s"
          f"  (compile+run {time.time()-t0:.0f}s) max_count={mx:.0f}",
          flush=True)


def bench_step(name, lean):
    src, dst, mask = _problem()

    if lean:
        @jax.jit
        def step(seed):
            msac, counts, packed = homography_ransac_sweep(
                seed, src, dst, mask, 75.0, n_hyp=N_HYP, raw_records=True)
            best = jnp.argmin(msac[0])
            return msac[0][best], counts[0][best], packed[0][best]
    else:
        @jax.jit
        def step(seed):
            msac, counts, packed = homography_ransac_sweep(
                seed, src, dst, mask, 75.0, n_hyp=N_HYP)
            best = jnp.argmin(msac[0])
            return msac[0][best], counts[0][best], packed[0][best]

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def body(_, carry):
            s, acc = carry
            _, cnt, _ = step(s)
            return (s + jnp.int32(1) + (cnt < -1.0).astype(jnp.int32),
                    acc + cnt)
        _, acc = jax.lax.fori_loop(0, n_rep, body,
                                   (seed0, jnp.float32(0.0)))
        return acc

    t0 = time.time()
    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=5, small=1,
                    large=17)
    print(f"{name:10s} {dt*1e3:7.3f} ms  {N_HYP/dt/1e9:6.3f} B hyp/s"
          f"  (compile+run {time.time()-t0:.0f}s)", flush=True)


VARIANTS = {
    "lan512": lambda: bench_kernel("lan512", 512, False),
    "lan1024": lambda: bench_kernel("lan1024", 1024, False),
    "lan2048": lambda: bench_kernel("lan2048", 2048, False),
    "nomask512": lambda: bench_kernel("nomask512", 512, True),
    "nomask1024": lambda: bench_kernel("nomask1024", 1024, True),
    "nomask2048": lambda: bench_kernel("nomask2048", 2048, True),
    "stepfull": lambda: bench_step("stepfull", False),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        try:
            VARIANTS[nm]()
        except Exception as e:
            print(f"{nm:10s} FAILED: {type(e).__name__}: {e}", flush=True)
