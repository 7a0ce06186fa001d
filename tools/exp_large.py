"""Scratch experiment harness for the large-N sweep score-loop cliff.

Benchmarks variants of the sweep_large kernel structure in isolation to
find where the ~4x gap to VPU issue rate goes (VERDICT r1 next-steps #2).
Not part of the package; variants that win get folded into
ops/pallas/sweep_large.py.

Usage: python tools/exp_large.py [variant ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_H = 4096
SUB = 8
LAN = BLOCK_H // SUB
_INV24 = 1.0 / (1 << 24)


def _fmix(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _range_reduce(bits, n_range):
    u24 = ((jax.lax.bitcast_convert_type(bits, jnp.int32) >> 8)
           & jnp.int32(0xFFFFFF)).astype(jnp.float32)
    scale = n_range.astype(jnp.float32) * jnp.float32(_INV24)
    r = (u24 * scale).astype(jnp.int32)
    return jnp.minimum(r, n_range - 1)


def _fy_draws(flat_u32, seeds, n_valid, k: int = 4):
    idx = []
    for j in range(k):
        bits = _fmix(flat_u32 ^ seeds[j])
        r = _range_reduce(bits, n_valid - j)
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
    return idx


def _make_kernel(n_score: int, *, score_unroll=2, gather_unroll=1,
                 divfree=False, msac="div", fake_points=False,
                 skip_gather=False, skip_score=False, window=0):
    """Variant kernel. msac in {"div", "rsqrt", "none"}; window=W>0 makes
    each block sample its 4 points inside a per-block W-slot window."""

    def kernel(pts_ref, thr_ref, seed_ref, nv_ref, wb_ref, fbest_ref,
               ibest_ref):
        thr_sq = thr_ref[0]
        n_valid = nv_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * BLOCK_H + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        if window:
            # Per-block scalar window base (precomputed in XLA); draws
            # restricted to [0, min(W, n_valid)).
            wbase = wb_ref[pl.program_id(0)]
            w_eff = jnp.minimum(jnp.int32(window), n_valid)
            idx = _fy_draws(flatu, [seed_ref[j] for j in range(4)], w_eff)
            idx = [wbase + i for i in idx]
        else:
            wbase = jnp.int32(0)
            idx = _fy_draws(flatu, [seed_ref[j] for j in range(4)],
                            n_valid)

        zero = jnp.zeros((SUB, LAN), jnp.float32)

        def load_row(row):
            if fake_points:
                f = jnp.float32(row)
                return (f * 0.01, f * 0.02 + 0.1, f * 0.01 + 0.05,
                        f * 0.02, jnp.float32(1.0))
            return (pts_ref[row, 0], pts_ref[row, 1], pts_ref[row, 2],
                    pts_ref[row, 3], pts_ref[row, 4])

        if skip_gather:
            sx = [zero + 0.1 * (j + 1) for j in range(4)]
            sy = [zero + 0.2 * (j + 1) for j in range(4)]
            dx = [zero + 0.15 * (j + 1) for j in range(4)]
            dy = [zero + 0.25 * (j + 1) for j in range(4)]
        else:
            n_gather = window if window else n_score

            def gbody(n, acc):
                out = list(acc)
                for g in range(gather_unroll):
                    off = gather_unroll * n + g
                    row = (wbase + off) if window else off
                    x, y, px, py, _ = load_row(row)
                    for j in range(4):
                        sel = idx[j] == row
                        a = out[j]
                        out[j] = (jnp.where(sel, x, a[0]),
                                  jnp.where(sel, y, a[1]),
                                  jnp.where(sel, px, a[2]),
                                  jnp.where(sel, py, a[3]))
                return tuple(out)

            acc0 = tuple((zero, zero, zero, zero) for _ in range(4))
            g = jax.lax.fori_loop(0, n_gather // gather_unroll, gbody, acc0)
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
        valid = ok_s & ok_d

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

        if skip_score:
            count = H[0] * 0.0
            msac_v = H[1] * 0.0
        else:
            def spoint(row, count, msac_v):
                x, y, px, py, w_pt = load_row(row)
                u = H[0] * x + H[1] * y + H[2]
                v = H[3] * x + H[4] * y + H[5]
                w = H[6] * x + H[7] * y + H[8]
                if divfree:
                    du = u - px * w
                    dv = v - py * w
                    e2w = du * du + dv * dv
                    w2 = w * w
                    t2w = thr_sq * w2
                    count = count + jnp.where(e2w <= t2w, w_pt, 0.0)
                    if msac == "none":
                        msac_v = msac_v + e2w * w_pt
                    else:
                        if msac == "rsqrt":
                            r = jax.lax.rsqrt(jnp.maximum(w2, 1e-30))
                            inv = r * r
                        else:
                            inv = 1.0 / jnp.maximum(w2, 1e-24)
                        e2 = e2w * inv
                        msac_v = msac_v + jnp.minimum(e2, thr_sq) * w_pt
                else:
                    inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
                    du = u * inv_w - px
                    dv = v * inv_w - py
                    e2 = du * du + dv * dv
                    count = count + jnp.where(e2 <= thr_sq, w_pt, 0.0)
                    msac_v = msac_v + jnp.minimum(e2, thr_sq) * w_pt
                return count, msac_v

            def sbody(n, carry):
                count, msac_v = carry
                for half in range(score_unroll):
                    count, msac_v = spoint(
                        score_unroll * n + half, count, msac_v)
                return count, msac_v

            count, msac_v = jax.lax.fori_loop(
                0, n_score // score_unroll, sbody, (zero, zero))

        msac_v = jnp.where(valid, msac_v, jnp.float32(3.4e38))
        count = jnp.where(valid, count, -1.0)

        msac_m = jnp.min(msac_v, axis=0, keepdims=True)
        selm = msac_v == msac_m
        flat_m = jnp.min(jnp.where(selm, flat, 2 ** 30),
                         axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (flat == flat_m), count, -2.0),
                          axis=0, keepdims=True)
        count_c = jnp.max(count, axis=0, keepdims=True)
        selc = count == count_c
        msac_c = jnp.min(jnp.where(selc, msac_v, jnp.float32(3.4e38)),
                         axis=0, keepdims=True)
        flat_c = jnp.min(jnp.where(selc & (msac_v == msac_c), flat, 2 ** 30),
                         axis=0, keepdims=True)
        fbest_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        ibest_ref[...] = jnp.concatenate([flat_m, flat_c], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_hyp", "n", "kw_items",
                                             "n_rep"))
def run_variant(seed, pts, n_valid, n_hyp, n, kw_items, n_rep=1):
    """n_rep dependency-chained sweeps inside one jitted program (each
    seed perturbed by the previous output, so repeats cannot overlap or
    complete out of order through the tunnel)."""
    kw = dict(kw_items)
    n_blocks = max(n_hyp // BLOCK_H, 1)
    thr = jnp.asarray([0.02], jnp.float32)

    def call_one(s):
        seeds = _fmix(s + jnp.arange(1, 6, dtype=jnp.uint32)
                      * jnp.uint32(0x9E3779B9))
        window = kw.get("window", 0)
        w_eff = jnp.minimum(jnp.int32(window), n_valid)
        wbits = _fmix(jnp.arange(n_blocks, dtype=jnp.uint32) ^ seeds[4])
        wb = _range_reduce(wbits, n_valid - w_eff + 1) if window else \
            jnp.zeros(n_blocks, jnp.int32)
        fbest, ibest = pl.pallas_call(
            _make_kernel(n, **kw),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5,
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
        )(pts, thr, seeds, n_valid.reshape(1), wb)
        return jnp.min(ibest[0])

    def body(_, carry):
        s, acc = carry
        v = call_one(s)
        # Genuine data dependency (flat ids are >= 0, so the term is 0 at
        # runtime but the compiler cannot hoist the next call).
        return s + jnp.uint32(1) + (v == -7).astype(jnp.uint32), acc + v

    _, acc = jax.lax.fori_loop(
        0, n_rep, body, (jnp.asarray(seed, jnp.uint32), jnp.int32(0)))
    return acc


def bench(name, n=256, n_hyp=1 << 22, **kw):
    from ransac_tpu.ops.pallas.roofline import _time_best

    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        np.concatenate([rng.standard_normal((n, 4)),
                        np.ones((n, 1))], axis=1), jnp.float32)
    n_valid = jnp.int32(n)
    kw_items = tuple(sorted(kw.items()))
    dt = _time_best(
        lambda k, r: run_variant(k, pts, n_valid, n_hyp, n, kw_items, r),
        reps=3, small=1, large=5)
    rate = n_hyp / dt
    print(f"{name:32s} N={n:4d} {dt*1e3:8.3f} ms  {rate/1e6:8.1f} M hyp/s",
          flush=True)
    return rate


VARIANTS = {
    "baseline": dict(),
    "unroll4": dict(score_unroll=4),
    "unroll8": dict(score_unroll=8),
    "divfree_div": dict(divfree=True, msac="div"),
    "divfree_nr": dict(divfree=True, msac="nr"),
    "divfree_approx": dict(divfree=True, msac="approx"),
    "divfree_none": dict(divfree=True, msac="none"),
    "divfree_nr_u4": dict(divfree=True, msac="nr", score_unroll=4),
    "divfree_nr_u8": dict(divfree=True, msac="nr", score_unroll=8),
    "gather2": dict(gather_unroll=2),
    "gather4": dict(gather_unroll=4),
    "fake_points": dict(fake_points=True),
    "skip_gather": dict(skip_gather=True),
    "skip_score": dict(skip_score=True),
    "skip_both": dict(skip_gather=True, skip_score=True),
    "best_combo": dict(divfree=True, msac="nr", score_unroll=4,
                       gather_unroll=2),
    "g8s8": dict(gather_unroll=8, score_unroll=8),
    "g16s16": dict(gather_unroll=16, score_unroll=16),
    "g32s32": dict(gather_unroll=32, score_unroll=32),
    "g16s16_divfree": dict(gather_unroll=16, score_unroll=16,
                           divfree=True, msac="rsqrt"),
    "g32s32_divfree": dict(gather_unroll=32, score_unroll=32,
                           divfree=True, msac="rsqrt"),
    "full_unroll": dict(gather_unroll=256, score_unroll=256),
    "win64": dict(window=64, gather_unroll=16, score_unroll=16),
    "win64_divfree": dict(window=64, gather_unroll=16, score_unroll=16,
                          divfree=True, msac="rsqrt"),
    "win64_divfree_s32": dict(window=64, gather_unroll=32,
                              score_unroll=32, divfree=True,
                              msac="rsqrt"),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["baseline"]
    if names == ["all"]:
        names = list(VARIANTS)
    for nm in names:
        bench(nm, **VARIANTS[nm])
