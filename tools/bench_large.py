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


if __name__ == "__main__":
    for name in sys.argv[1:] or ["homography", "essential", "pnp"]:
        dict(homography=bench_homography, essential=bench_essential,
             pnp=bench_pnp)[name]()
