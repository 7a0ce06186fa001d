"""Probe the axon-tunnel slow-state granularity (round-5 variance note).

Question: is the 2-4x slow state per PROCESS, per COMPILED PROGRAM, or
per INVOCATION?  Times the same octacc256 sweep chained program several
times in one process, then as distinct executables (a dummy +0.0*k
constant folded into the seed path forces a fresh program hash), and
prints every reading.  If distinct executables re-roll the state,
bench.py can sample K executables in-process and report the best
window's median.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ransac_tpu.ops.pallas.roofline import _time_best
from ransac_tpu.ops.pallas.sweep import homography_ransac_sweep

sys.path.insert(0, "/root/repo/tools")
from exp_small3 import _problem

N_HYP = 1 << 22


def make_run(salt):
    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def run(seed0, n_rep):
        src, dst, mask = _problem()

        def body(_, carry):
            s, acc = carry
            msac, counts, packed = homography_ransac_sweep(
                s + jnp.int32(salt) * jnp.int32(0), src, dst, mask,
                75.0, n_hyp=N_HYP)
            cnt = counts[0][0]
            return (s + jnp.int32(1) + (cnt < -1.0).astype(jnp.int32),
                    acc + cnt)
        _, acc = jax.lax.fori_loop(0, n_rep, body,
                                   (seed0, jnp.float32(0.0)))
        return acc + jnp.float32(salt) * jnp.float32(1e-30)
    return run


def main():
    print("same executable, 5 repeats:")
    run = make_run(0)
    for i in range(5):
        dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3,
                        small=1, large=5)
        print(f"  rep {i}: {dt*1e3:7.3f} ms  {N_HYP/dt/1e9:6.3f} B/s",
              flush=True)
    print("distinct executables (fresh program each):")
    for salt in range(1, 5):
        run = make_run(salt)
        t0 = time.time()
        dt = _time_best(lambda k, r: run(jnp.int32(k), r), reps=3,
                        small=1, large=5)
        print(f"  salt {salt}: {dt*1e3:7.3f} ms  {N_HYP/dt/1e9:6.3f} B/s"
              f"  (compile+run {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
