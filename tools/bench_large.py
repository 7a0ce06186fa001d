"""Chained-timing benchmark of the production large-N sweeps on TPU."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from ransac_tpu.ops.pallas.roofline import _time_best


def chain(call_one, n_rep):
    def body(_, carry):
        s, acc = carry
        v = call_one(s)
        return s + jnp.int32(1) + (v == -7).astype(jnp.int32), acc + v
    _, acc = jax.lax.fori_loop(0, n_rep, body,
                               (jnp.int32(0), jnp.int32(0)))
    return acc


def bench_homography(n=256, n_hyp=1 << 22):
    from ransac_tpu.ops.pallas.sweep_large import (
        homography_ransac_sweep_large)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    dst = jnp.asarray(rng.standard_normal((n, 2)) * 400 + 500, jnp.float32)
    mask = jnp.ones(n, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def one(s):
            msac, counts, ibest, aux = homography_ransac_sweep_large(
                seed0 + s, src, dst, mask, 75.0, n_hyp=n_hyp)
            return jnp.min(ibest[0])
        return chain(one, n_rep)

    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3, small=1,
                    large=5)
    print(f"homography_large N={n}: {dt*1e3:.3f} ms "
          f"{n_hyp/dt/1e6:.1f} M hyp/s", flush=True)


def bench_essential(n=256, n_hyp=1 << 22):
    from ransac_tpu.ops.pallas.sweep_essential_large import (
        essential_ransac_sweep_large)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 2)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 2)), jnp.float32)
    mask = jnp.ones(n, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def one(s):
            msac, counts, ibest, aux = essential_ransac_sweep_large(
                seed0 + s, x1, x2, mask, (2.0 / 600.0) ** 2, n_hyp=n_hyp)
            return jnp.min(ibest[0])
        return chain(one, n_rep)

    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3, small=1,
                    large=5)
    print(f"essential_large N={n}: {dt*1e3:.3f} ms "
          f"{n_hyp/dt/1e6:.1f} M hyp/s", flush=True)


def bench_pnp(n=256, n_hyp=1 << 21):
    from ransac_tpu.ops.pallas.sweep_pnp_large import pnp_ransac_sweep_large
    rng = np.random.default_rng(0)
    Xw = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    pix = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 2)), jnp.float32)
    mask = jnp.ones(n, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def one(s):
            msac, counts, ibest, aux = pnp_ransac_sweep_large(
                seed0 + s, Xw, pix, mask, 30.0 / 900.0, n_hyp=n_hyp)
            return jnp.min(ibest[0])
        return chain(one, n_rep)

    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3, small=1,
                    large=5)
    print(f"pnp_large N={n}: {dt*1e3:.3f} ms {n_hyp/dt/1e6:.1f} M "
          f"samples/s ({4*n_hyp/dt/1e6:.1f} M poses/s)", flush=True)


def bench_small(n=13, n_hyp=1 << 22):
    """Chained timing of the 16-point fused homography sweep (the
    bench.py headline kernel) — ground truth vs pipelined numbers."""
    from ransac_tpu.ops.pallas.sweep import homography_ransac_sweep
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 2)), jnp.float32)
    dst = jnp.asarray(rng.uniform(0, 1000, (n, 2)), jnp.float32)
    mask = jnp.ones(n, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def one(s):
            msac, counts, packed = homography_ransac_sweep(
                seed0 + s, src, dst, mask, 75.0, n_hyp=n_hyp)
            return jnp.min(packed[0])
        return chain(one, n_rep)

    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3, small=1,
                    large=5)
    print(f"small_sweep N={n}: {dt*1e3:.3f} ms {n_hyp/dt/1e6:.1f} M hyp/s",
          flush=True)


def bench_twoview(hw=1024):
    """Chained timing of the WHOLE two-view frame step (detect x2 +
    describe x2 + match + essential RANSAC + pose + LM)."""
    from ransac_tpu.features.detect import detect_harris
    from ransac_tpu.features.match import mutual_nn_match, patch_descriptors
    from ransac_tpu.models import ransac as ransac_mod
    from ransac_tpu.ops import epipolar
    from ransac_tpu.ops import projection as oproj
    from ransac_tpu.utils.config import RansacConfig

    Kc = jnp.asarray([[600.0, 0, hw // 2], [0, 600.0, hw // 2],
                      [0, 0, 1.0]], jnp.float32)
    e_cfg = RansacConfig(threshold=(2.0 / 600.0) ** 2, num_hypotheses=4096,
                         exhaustive=False)

    def frame(seed):
        k1, k2 = jax.random.split(jax.random.key(seed))
        img1 = jax.random.uniform(k1, (hw, hw), jnp.float32)
        img2 = jax.random.uniform(k2, (hw, hw), jnp.float32)
        kp1 = detect_harris(img1, 1024)
        kp2 = detect_harris(img2, 1024)
        d1 = patch_descriptors(img1, kp1.xy, kp1.valid)
        d2 = patch_descriptors(img2, kp2.xy, kp2.valid)
        m = mutual_nn_match(d1, d2, kp1.valid, kp2.valid)
        x1 = oproj.normalize_pixels(kp1.xy[m.idx1], Kc)
        x2 = oproj.normalize_pixels(kp2.xy[m.idx2], Kc)
        mask = m.valid.astype(jnp.float32)
        res = ransac_mod.ransac_essential_sweep(x1, x2, mask, e_cfg, seed)
        inl_w = res.inlier_mask.astype(jnp.float32)
        R0, t0, _, _ = epipolar.recover_pose(res.model, x1, x2, inl_w)
        R, t, _ = epipolar.refine_relative_pose(R0, t0, x1, x2, inl_w)
        return res.num_inliers

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def one(s):
            return frame(seed0 + s).astype(jnp.int32)
        return chain(one, n_rep)

    # large=17: (large-small) x frame time must dwarf multi-ms tunnel
    # jitter, and frame time is only a few ms.
    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=5, small=1,
                    large=17)
    print(f"twoview_frame {hw}: {dt*1e3:.3f} ms {1.0/dt:.1f} frames/s",
          flush=True)


def bench_harris(hw=1024):
    from ransac_tpu.features.detect import harris_response

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        def one(s):
            img = jax.random.uniform(jax.random.key(s), (hw, hw),
                                     jnp.float32)
            # Data dependency that cannot be folded away (sum is finite
            # at runtime, but the compiler must compute it).
            return (jnp.sum(harris_response(img)) > 1e30).astype(jnp.int32) \
                + s.astype(jnp.int32) * 0
        return chain(one, n_rep)

    dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3, small=1,
                    large=9)
    print(f"harris_response {hw}: {dt*1e3:.3f} ms", flush=True)


def bench_twoview_parts(hw=1024):
    """Chained timing of each two-view frame stage, to locate the 17 ms."""
    from ransac_tpu.features.detect import detect_harris
    from ransac_tpu.features.match import mutual_nn_match, patch_descriptors
    from ransac_tpu.models import ransac as ransac_mod
    from ransac_tpu.ops import epipolar
    from ransac_tpu.ops import projection as oproj
    from ransac_tpu.utils.config import RansacConfig

    Kc = jnp.asarray([[600.0, 0, hw // 2], [0, 600.0, hw // 2],
                      [0, 0, 1.0]], jnp.float32)
    e_cfg = RansacConfig(threshold=(2.0 / 600.0) ** 2, num_hypotheses=4096,
                         exhaustive=False)

    def dep(x):
        return (jnp.sum(x.astype(jnp.float32)) > 1e30).astype(jnp.int32)

    def img_of(s):
        return jax.random.uniform(jax.random.key(s), (hw, hw), jnp.float32)

    def detect_stage(s):
        kp = detect_harris(img_of(s), 1024)
        return dep(kp.xy)

    def desc_stage(s):
        img = img_of(s)
        kp = detect_harris(img, 1024)
        d = patch_descriptors(img, kp.xy, kp.valid)
        return dep(d) - detect_cost_marker(s)

    def detect_cost_marker(s):
        return jnp.int32(0)

    def match_stage(s):
        k1, k2 = jax.random.split(jax.random.key(s))
        d1 = jax.random.normal(k1, (1024, 64), jnp.float32)
        d2 = jax.random.normal(k2, (1024, 64), jnp.float32)
        v = jnp.ones(1024, bool)
        m = mutual_nn_match(d1, d2, v, v)
        return dep(m.idx2)

    def ransac_stage(s):
        k1, k2 = jax.random.split(jax.random.key(s))
        x1 = jax.random.uniform(k1, (1024, 2), jnp.float32) - 0.5
        x2 = jax.random.uniform(k2, (1024, 2), jnp.float32) - 0.5
        mask = jnp.ones(1024, jnp.float32)
        res = ransac_mod.ransac_essential_sweep(x1, x2, mask, e_cfg, s)
        return dep(res.model)

    def pose_stage(s):
        k1, k2 = jax.random.split(jax.random.key(s))
        x1 = jax.random.uniform(k1, (1024, 2), jnp.float32) - 0.5
        x2 = jax.random.uniform(k2, (1024, 2), jnp.float32) - 0.5
        w = jnp.ones(1024, jnp.float32)
        E = jnp.eye(3, dtype=jnp.float32)
        E = E.at[0, 0].set(0.0).at[2, 2].set(0.5)
        R0, t0, _, _ = epipolar.recover_pose(E, x1, x2, w)
        R, t, _ = epipolar.refine_relative_pose(R0, t0, x1, x2, w)
        return dep(R) + dep(t)

    for name, fn, reps in (("detect", detect_stage, 9),
                           ("detect+desc", desc_stage, 9),
                           ("match", match_stage, 9),
                           ("essential_ransac", ransac_stage, 4),
                           ("recover+refine", pose_stage, 4)):
        @functools.partial(jax.jit, static_argnames=("n_rep",))
        def run(seed0, n_rep, fn=fn):
            def one(s):
                return fn(s)
            return chain(one, n_rep)

        dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3,
                        small=1, large=1 + reps)
        print(f"twoview part {name:18s}: {dt*1e3:8.3f} ms", flush=True)


def bench_twoview_bisect(hw=1024):
    """Cumulative frame variants to find the unaccounted ~12 ms."""
    from ransac_tpu.features.detect import detect_harris
    from ransac_tpu.features.match import mutual_nn_match, patch_descriptors
    from ransac_tpu.models import ransac as ransac_mod
    from ransac_tpu.ops import epipolar
    from ransac_tpu.ops import projection as oproj
    from ransac_tpu.utils.config import RansacConfig

    Kc = jnp.asarray([[600.0, 0, hw // 2], [0, 600.0, hw // 2],
                      [0, 0, 1.0]], jnp.float32)
    e_cfg = RansacConfig(threshold=(2.0 / 600.0) ** 2, num_hypotheses=4096,
                         exhaustive=False)

    def dep(x):
        return (jnp.sum(x.astype(jnp.float32)) > 1e30).astype(jnp.int32)

    def stage_upto(kind, s):
        k1, k2 = jax.random.split(jax.random.key(s))
        img1 = jax.random.uniform(k1, (hw, hw), jnp.float32)
        img2 = jax.random.uniform(k2, (hw, hw), jnp.float32)
        kp1 = detect_harris(img1, 1024)
        kp2 = detect_harris(img2, 1024)
        d1 = patch_descriptors(img1, kp1.xy, kp1.valid)
        d2 = patch_descriptors(img2, kp2.xy, kp2.valid)
        m = mutual_nn_match(d1, d2, kp1.valid, kp2.valid)
        x1 = oproj.normalize_pixels(kp1.xy[m.idx1], Kc)
        x2 = oproj.normalize_pixels(kp2.xy[m.idx2], Kc)
        mask = m.valid.astype(jnp.float32)
        if kind == "match":
            return dep(x1) + dep(x2) + dep(mask)
        res = ransac_mod.ransac_essential_sweep(x1, x2, mask, e_cfg, s)
        if kind == "ransac":
            return dep(res.model) + dep(res.inlier_mask)
        inl_w = res.inlier_mask.astype(jnp.float32)
        R0, t0, _, _ = epipolar.recover_pose(res.model, x1, x2, inl_w)
        if kind == "recover":
            return dep(R0) + dep(t0)
        R, t, _ = epipolar.refine_relative_pose(R0, t0, x1, x2, inl_w)
        return dep(R) + dep(t)

    for kind, reps in (("match", 9), ("ransac", 4), ("recover", 4),
                       ("refine", 4)):
        @functools.partial(jax.jit, static_argnames=("n_rep",))
        def run(seed0, n_rep, kind=kind):
            return chain(lambda s: stage_upto(kind, s), n_rep)

        dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3,
                        small=1, large=1 + reps)
        print(f"frame upto {kind:8s}: {dt*1e3:8.3f} ms", flush=True)


def bench_detect_variants(hw=1024):
    """Detect-stage optimization candidates: separable NMS, approx top-k."""
    from ransac_tpu.features.detect import harris_response

    def dep(x):
        return (jnp.sum(x.astype(jnp.float32)) > 1e30).astype(jnp.int32)

    def detect_core(s, separable, approx, max_kp=1024, nms_radius=4,
                    border=8):
        img = jax.random.uniform(jax.random.key(s), (hw, hw), jnp.float32)
        resp = harris_response(img)
        H, W = resp.shape
        win = 2 * nms_radius + 1
        if separable:
            m = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                                      (win, 1), (1, 1), "SAME")
            local_max = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                              (1, win), (1, 1), "SAME")
        else:
            local_max = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                                              (win, win), (1, 1), "SAME")
        is_peak = resp >= local_max
        yy = jnp.arange(H)[:, None]
        xx = jnp.arange(W)[None, :]
        in_border = ((yy >= border) & (yy < H - border)
                     & (xx >= border) & (xx < W - border))
        score = jnp.where(is_peak & in_border & (resp > 0), resp, -jnp.inf)
        flat = score.reshape(-1)
        if approx:
            top_scores, top_idx = jax.lax.approx_max_k(flat, max_kp)
        else:
            top_scores, top_idx = jax.lax.top_k(flat, max_kp)
        return dep(top_scores) + dep(top_idx)

    for name, sep, ap in (("exact", False, False),
                          ("sep_nms", True, False),
                          ("approx_topk", False, True),
                          ("both", True, True)):
        @functools.partial(jax.jit, static_argnames=("n_rep",))
        def run(seed0, n_rep, sep=sep, ap=ap):
            return chain(lambda s: detect_core(s, sep, ap), n_rep)

        dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3,
                        small=1, large=10)
        print(f"detect {name:12s}: {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["homography", "essential", "pnp"]:
        dict(homography=bench_homography, essential=bench_essential,
             pnp=bench_pnp, small=bench_small, twoview=bench_twoview,
             harris=bench_harris,
             twoview_parts=bench_twoview_parts,
             twoview_bisect=bench_twoview_bisect,
             detect_variants=bench_detect_variants)[name]()