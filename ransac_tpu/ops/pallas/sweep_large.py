"""Large-N fully-fused homography-RANSAC sweep (counter-replay variant).

The 16-point sweep (``ops.pallas.sweep``) gathers minimal samples with a
log2 selection tree and packs the winner's indices in 4-bit fields — both
stop scaling past ~16 points.  This variant extends the fused path to
pools of hundreds of points (two-view matching scale, SURVEY.md §7.2(5) /
BASELINE configs[2]) while keeping EVERYTHING in one kernel:

- **In-kernel counter sampling over a dynamic pool size**: the murmur3
  counter hash feeds a 24-bit float range reduction
  ``idx = floor((bits >> 8) * (n_valid - j) * 2^-24)`` (exact-scale f32
  multiply, deterministic and replayable in XLA with the same ops) +
  Fisher-Yates shifts.  ``n_valid`` arrives as an SMEM scalar, so masked
  points are excluded from sampling without any host-side recompile.
- **In-kernel one-hot gather**: one ``fori_loop`` over the SMEM point
  table accumulates the 4 sampled coordinate pairs per lane
  (4 compares + 16 selects per point across the [SUB, LAN] tile).  An
  earlier XLA-side gather of [H, 4] samples measured 65 ms at H=2^20 —
  35x the cost of the whole kernel; TPU gathers over tiny tables are
  serial.  The in-kernel loop is pure VPU work.
- **Solve + score fused** as in ``sweep.py``: division-free
  projective-frame (adjugate) 4-point solve, then a second ``fori_loop``
  scores all N SMEM points against the hypothesis tile.
- **Counter replay instead of packed indices**: winner records carry the
  flat hypothesis id; ``sample_indices_for`` replays the identical hash +
  float reduction in XLA to recover the sample at any pool size.

The point table enters in valid-first order (wrapper permutes via a
stable argsort of the mask); pool slot k < n_valid is the k-th valid
input row.  Replaces cv2.findHomography's hypothesize-and-verify for
large correspondence sets (reference main_v1.py:312 semantics at
matching scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
BLOCK_H = 2048     # LAN 256: N_ACC accumulators + 9 H tiles fit the vreg file
LAN = BLOCK_H // SUB
MAX_POINTS = 1024  # SMEM point table: N * 5 * 4 B (<= 20 KB)
N_ACC = 4          # independent accumulator pairs (ops.pallas.sweep)
#: Per-block sampling window (see ``window_bases``): each block draws its
#: minimal samples inside a WINDOW-slot span of the shuffled pool, cutting
#: the one-hot gather from O(N) to O(WINDOW) rows.  Marginal sampling
#: stays uniform over 4-subsets because the pool order is re-shuffled per
#: sweep; only hypotheses within one block are correlated.
WINDOW = 64
#: Minimum grid blocks whenever n > WINDOW, so a run always draws from
#: several independent windows (same-block window failures are fully
#: correlated; see the wrapper comment).
MIN_WINDOWED_BLOCKS = 4
#: Point-loop unroll: a Mosaic ``fori_loop`` costs ~70 ns per trip
#: REGARDLESS of body size (measured via tools/exp_large.py — the round-1
#: "large-N cliff" was loop-trip overhead, not vector work), so the
#: gather/score loops process UNROLL rows per trip.
UNROLL = 16
_INV24 = 1.0 / (1 << 24)


def _fmix(x):
    """murmur3 32-bit finalizer (must match ops.pallas.sweep._fmix)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _draw_seeds_n(seed, k: int):
    seed_u = jnp.asarray(seed, jnp.uint32)
    return _fmix(seed_u + jnp.arange(1, k + 1, dtype=jnp.uint32)
                 * jnp.uint32(0x9E3779B9))


def _draw_seeds(seed):
    """6 per-sweep seeds: 4 Fisher-Yates draws + window bases + shuffle."""
    return _draw_seeds_n(seed, 6)


def _window_bases_hash(seed_u32, n_blocks: int, n_valid, window: int):
    wbits = _fmix(jnp.arange(n_blocks, dtype=jnp.uint32) ^ seed_u32)
    base_range = jnp.where(n_valid > jnp.int32(window), n_valid,
                           jnp.int32(1))
    return _range_reduce(wbits, base_range)


def _shuffle_order_hash(seed_u32, point_mask_f):
    n = point_mask_f.shape[0]
    iota = jnp.arange(n, dtype=jnp.uint32)
    keys = _fmix(iota ^ seed_u32) & jnp.uint32(0x7FFFFFFF)
    invalid = jnp.uint32(0x80000000) + iota  # always after any valid key
    sortkey = jnp.where(point_mask_f > 0, keys, invalid)
    return jnp.argsort(sortkey)


def _wrap_mod(x, n):
    """x - n if x >= n (single circular wrap; inputs are < 2n)."""
    return jnp.where(x >= n, x - n, x)


def window_bases(seeds, n_blocks: int, n_valid, window: int = WINDOW):
    """Per-block window base slots, computed in XLA (shared verbatim by
    the kernel wrapper and the replay path).  Block b samples inside the
    CIRCULAR span ``[wb[b], wb[b] + min(window, n_valid)) mod n_valid``
    — circular so every pool slot lies in exactly ``window`` possible
    windows (a non-wrapping base range undersamples the edge slots).
    When ``n_valid <= window`` every base is 0 and sampling is identical
    to the unwindowed sampler."""
    return _window_bases_hash(seeds[4], n_blocks, n_valid, window)


def shuffle_order(seeds, point_mask_f):
    """Valid-first pool permutation with the valid rows SHUFFLED (counter
    PRNG keyed by ``seeds[5]``), so every block window is a uniform random
    subset of the valid points.  Returns ``order``: pool slot -> input
    row; slot k < n_valid is a (random) valid row."""
    return _shuffle_order_hash(seeds[5], point_mask_f)


def _range_reduce(bits, n_range):
    """floor(top-24-bits / 2^24 * n_range) with an exact-scale f32 multiply.

    Bit-identical between XLA and Mosaic: (n_range * 2^-24) is exact
    (small int times a power of two), so the only rounding is the final
    fmul, IEEE round-to-nearest on both compilers.  Clamped because
    u24 ~ 2^24 - 1 can round up to n_range exactly.
    """
    # Mosaic has no uint32 -> f32 cast: bitcast to i32 and mask to the
    # top 24 bits (always positive) before the int -> float convert.
    u24 = ((jax.lax.bitcast_convert_type(bits, jnp.int32) >> 8)
           & jnp.int32(0xFFFFFF)).astype(jnp.float32)
    scale = n_range.astype(jnp.float32) * jnp.float32(_INV24)
    r = (u24 * scale).astype(jnp.int32)
    return jnp.minimum(r, n_range - 1)


def _fy_draws(flat_u32, seeds, n_valid, k: int = 4):
    """Fisher-Yates k-subset of [0, n_valid): shared by kernel and replay."""
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


def sample_indices_for(flat, seeds, n_valid, window: int = WINDOW):
    """[..., 4] pool-slot samples for flat hypothesis ids (XLA replay of
    the in-kernel sampler; identical results by construction).  Window
    bases are re-derived from ``flat // BLOCK_H`` with the same hash the
    wrapper feeds the kernel."""
    flat = jnp.asarray(flat)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    w_eff = jnp.minimum(jnp.int32(window), n_valid)
    block = (flat // BLOCK_H).astype(jnp.uint32)
    base_range = jnp.where(n_valid > jnp.int32(window), n_valid,
                           jnp.int32(1))
    wbase = _range_reduce(_fmix(block ^ seeds[4]), base_range)
    draws = _fy_draws(flat.astype(jnp.uint32), seeds, w_eff)
    out = []
    for d in draws:
        s = wbase + d
        out.append(jnp.where(s >= n_valid, s - n_valid, s))
    return jnp.stack(out, axis=-1)


def _make_kernel(n_score: int, n_rows: int):
    """``n_score``: real pool rows scored; ``n_rows``: padded SMEM rows
    (multiple of UNROLL; padded rows carry weight 0)."""
    gather_rows = min(WINDOW, n_rows)

    def kernel(pts_ref, thr_ref, seed_ref, nv_ref, wb_ref, fbest_ref,
               ibest_ref):
        thr_sq = thr_ref[0]
        n_valid = nv_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * BLOCK_H + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        # Draws live in the block's window [wbase, wbase + w_eff) of the
        # shuffled pool (wbase = 0 whenever n_valid <= WINDOW, making the
        # sampler identical to the unwindowed one).
        wbase = wb_ref[pl.program_id(0)]
        w_eff = jnp.minimum(jnp.int32(WINDOW), n_valid)
        idx = _fy_draws(flatu, [seed_ref[j] for j in range(4)], w_eff)
        idx = [jnp.where(wbase + i >= n_valid, wbase + i - n_valid,
                         wbase + i) for i in idx]

        # One-hot gather of the 4 sampled (src, dst) pairs from the SMEM
        # point table — only the WINDOW rows a block can sample from
        # (valid-first order, so idx < n_valid only ever matches valid
        # rows).  UNROLL rows per trip: fori_loop trip overhead would
        # otherwise dominate (~70 ns/trip measured).
        def gbody(n, acc):
            acc = list(acc)
            for u in range(UNROLL):
                row = wbase + (UNROLL * n + u)
                # Circular window: wrap once past n_valid (offsets beyond
                # a small pool revisit early rows, harmlessly re-writing
                # the same gathered values).
                row = jnp.where(row >= n_valid, row - n_valid, row)
                x = pts_ref[row, 0]
                y = pts_ref[row, 1]
                px = pts_ref[row, 2]
                py = pts_ref[row, 3]
                for j in range(4):
                    sel = idx[j] == row
                    a = acc[j]
                    acc[j] = (jnp.where(sel, x, a[0]),
                              jnp.where(sel, y, a[1]),
                              jnp.where(sel, px, a[2]),
                              jnp.where(sel, py, a[3]))
            return tuple(acc)

        zero = jnp.zeros((SUB, LAN), jnp.float32)
        acc0 = tuple((zero, zero, zero, zero) for _ in range(4))
        g = jax.lax.fori_loop(0, gather_rows // UNROLL, gbody, acc0)
        sx = [g[j][0] for j in range(4)]
        sy = [g[j][1] for j in range(4)]
        dx = [g[j][2] for j in range(4)]
        dy = [g[j][3] for j in range(4)]

        # Projective-frame 4-point solve (division-free; see sweep.py).
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

        # Score the full SMEM point table: rows are (x, y, px, py, w).
        # UNROLL points per trip (padded rows carry w=0); the loop body
        # is VPU-issue-bound, the unroll amortizes the trip overhead.
        # N_ACC independent accumulator pairs inside the unroll break
        # the serial accumulate chain (round-5 flagship finding,
        # ops.pallas.sweep.N_ACC); summed after the loop.
        def sbody(n, carry):
            counts, msacs = list(carry[0]), list(carry[1])
            for u_i in range(UNROLL):
                row = UNROLL * n + u_i
                x = pts_ref[row, 0]
                y = pts_ref[row, 1]
                px = pts_ref[row, 2]
                py = pts_ref[row, 3]
                w_pt = pts_ref[row, 4]
                u = H[0] * x + H[1] * y + H[2]
                v = H[3] * x + H[4] * y + H[5]
                w = H[6] * x + H[7] * y + H[8]
                # Division-deferred scoring (see ops.pallas.sweep): exact
                # inlier test in algebraic form, MSAC via one approx
                # reciprocal; degenerate w contributes exactly thr^2.
                a = u - px * w
                b = v - py * w
                r2 = a * a + b * b
                w2 = jnp.maximum(w * w, jnp.float32(1e-30))
                t = thr_sq * w2
                iw2 = pl.reciprocal(w2, approx=True)
                k = u_i % N_ACC
                counts[k] = counts[k] + jnp.where(r2 <= t, w_pt, 0.0)
                msacs[k] = msacs[k] + jnp.minimum(r2, t) * iw2 * w_pt
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

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        count = jnp.where(valid, count, -1.0)

        # Sublane reduction to one record per lane per selection rule
        # (min-MSAC and lexicographic max-count), ties by smallest flat id.
        msac_m = jnp.min(msac, axis=0, keepdims=True)
        selm = msac == msac_m
        flat_m = jnp.min(jnp.where(selm, flat, 2 ** 30),
                         axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (flat == flat_m), count, -2.0),
                          axis=0, keepdims=True)
        count_c = jnp.max(count, axis=0, keepdims=True)
        selc = count == count_c
        msac_c = jnp.min(jnp.where(selc, msac, jnp.float32(3.4e38)),
                         axis=0, keepdims=True)
        flat_c = jnp.min(jnp.where(selc & (msac == msac_c), flat, 2 ** 30),
                         axis=0, keepdims=True)
        fbest_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        ibest_ref[...] = jnp.concatenate([flat_m, flat_c], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_hyp", "interpret"))
def homography_ransac_sweep_large(
    seed, src: jnp.ndarray, dst: jnp.ndarray, point_mask: jnp.ndarray,
    threshold, n_hyp: int, interpret: bool = False,
):
    """Run the large-N fused sweep.

    Returns sublane-reduced records ``(msac [2, B], counts [2, B],
    flat_id [2, B], aux)`` with B = max(n_hyp, min_blocks * BLOCK_H) / 8
    (min_blocks = MIN_WINDOWED_BLOCKS when n > WINDOW, else 1 — a small
    n_hyp is rounded up so no single unlucky window can doom a run);
    row 0 selects by min MSAC,
    row 1 by lexicographic (max count, min MSAC).  ``aux = (seeds,
    n_valid, order)`` lets the caller replay any flat id's sample with
    ``sample_indices_for`` (pool slots) and map slots to input rows via
    ``order``.

    Sampling draws only from points with ``point_mask > 0`` (the engine's
    sample-validity semantics); scoring covers all points weighted by
    ``point_mask``.  Requires >= 4 valid points and N <= 1024.

    Each block samples inside a WINDOW-slot span of the shuffled pool
    (``window_bases``): the gather loop touches O(WINDOW) rows instead of
    O(N) while scoring stays exhaustive, which with the UNROLL-deep loops
    took this kernel 121.9 -> ~458 M hyp/s at N=256 on v5e (the VERDICT
    r1 "large-N cliff"; measured via tools/exp_large.py).  Marginal
    sample distribution is unchanged — a window of a freshly shuffled
    pool is a uniform random subset — only same-block hypotheses are
    correlated, and the winner replay (``sample_indices_for``) re-derives
    window bases from the flat id.
    """
    n = src.shape[0]
    assert n <= MAX_POINTS, n
    # Window failures are fully correlated WITHIN a block (one 64-slot
    # window per block): with a single block, one unlucky window that
    # holds < 4 inliers would doom the whole run.  Whenever the pool can
    # exceed one window, run at least MIN_WINDOWED_BLOCKS independent
    # windows (ADVICE r2; cheap at the measured ~450 M hyp/s).
    min_blocks = MIN_WINDOWED_BLOCKS if n > WINDOW else 1
    n_blocks = max(n_hyp // BLOCK_H, min_blocks)

    maskf = point_mask.astype(jnp.float32)
    valid_b = maskf > 0
    n_valid = valid_b.sum().astype(jnp.int32)
    seeds = _draw_seeds(seed)
    # Valid-first permutation with shuffled valid rows: pool slot
    # k < n_valid is a random valid input row (fresh per sweep).
    order = shuffle_order(seeds, maskf)

    # Global O(1) normalization over valid points (threshold scales with
    # dst; msac rescaled back below — inlier decisions unchanged).
    def _norm_params(a):
        m = jnp.sum(a * maskf[:, None], 0) / jnp.maximum(maskf.sum(), 1.0)
        d = jnp.sqrt(jnp.sum((a - m) ** 2, -1)) * maskf
        s = 1.4142135623730951 / jnp.maximum(
            jnp.sum(d) / jnp.maximum(maskf.sum(), 1.0), 1e-12)
        return m, s

    sm, s_src = _norm_params(src)
    dm, s_dst = _norm_params(dst)
    src_n = (src - sm) * s_src
    dst_n = (dst - dm) * s_dst
    thr = (jnp.asarray(threshold, jnp.float32).reshape(1) * s_dst) ** 2

    pts = jnp.concatenate(
        [src_n, dst_n, maskf[:, None]], axis=1).astype(jnp.float32)[order]
    # Pad to a multiple of UNROLL rows (padded rows carry w = 0 and are
    # never sampled: idx < n_valid <= n).
    n_rows = -(-n // UNROLL) * UNROLL
    if n_rows > n:
        pts = jnp.concatenate(
            [pts, jnp.zeros((n_rows - n, 5), jnp.float32)])
    wb = window_bases(seeds, n_blocks, n_valid)

    fbest, ibest = pl.pallas_call(
        _make_kernel(n, n_rows),
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
            flops=n_hyp * (250 + 20 * min(WINDOW, n_rows) + 29 * n),
            transcendentals=0, bytes_accessed=n_blocks * 24),
    )(pts, thr, seeds, n_valid.reshape(1), wb)

    inv_s2 = 1.0 / (s_dst * s_dst)
    msac = jnp.where(fbest[jnp.array([0, 2])] >= jnp.float32(3e38),
                     jnp.float32(3.4e38),
                     fbest[jnp.array([0, 2])] * inv_s2)
    return msac, fbest[jnp.array([1, 3])], ibest, (seeds, n_valid, order)


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per hypothesis (SoL accounting; see
    ``sweep.issue_slots_per_hyp`` for conventions).  The one-hot gather
    costs 4 compares + 16 selects per row over the WINDOW rows a block
    samples from; the score loop ~29 slots per pool row (6 FMA u,v,w +
    reciprocal + residual FMAs + two records)."""
    return 285 + 20 * min(WINDOW, n_points) + 29 * n_points
