"""Measured hardware rooflines for the speed-of-light report.

Round-1's SoL report divided kernel FLOPs by a datasheet MXU number
(125 TFLOP/s) even for pure-VPU kernels, making every utilization figure
meaningless (VERDICT r1, "What's weak" #1).  This module measures the
peaks that actually bind our kernels, on the attached chip, with Pallas
microbenchmarks:

- ``vpu_fma_peak``: sustained f32 fused-multiply-add throughput (the unit
  that bounds the fused RANSAC sweeps — solve + score are ~all VPU FMAs,
  compares and selects on [8, LAN] tiles).
- ``vpu_op_peak``: sustained generic vector-op issue rate (mixed
  add/mul/select — what compare/min/where chains run at).
- ``mxu_peak``: sustained f32 matmul throughput at the [8k, 512] x
  [512, 512] shape class our MXU-tiled scoring uses.
- ``hbm_bw``: streaming copy bandwidth (bounds the stage-wise paths).

Each benchmark runs a compute chain with zero HBM traffic inside one
kernel (inputs are scalars; outputs one tile), with enough independent
dependency chains to cover VPU latency, so the measurement is an
issue-rate ceiling, not a latency artifact.

Utilization of kernel X against unit U = (X's issued U-ops/s) /
(measured U peak).  ``utils.profiling`` consumes these numbers.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LAN = 512          # same tile class as the sweep kernels
CHAINS = 8         # independent dependency chains (covers VPU latency)
UNROLL = 32        # FMAs per chain per loop trip


def _lane_pattern(scale, offset):
    """Non-uniform [SUB, LAN] tile: uniform (jnp.full) benchmark inputs
    are algebraically collapsible (a broadcast operand turns a dot into a
    row-sum; a value-uniform chain could legally be scalarized), which
    would benchmark the optimizer, not the hardware."""
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
    return (r * LAN + c).astype(jnp.float32) * scale + offset


def _fma_kernel(n_iters: int):
    def kernel(seed_ref, out_ref):
        s = seed_ref[0]
        a = _lane_pattern(1e-9, 1.0 + s * 1e-9)
        b = _lane_pattern(1e-12, 1e-9)
        xs = [_lane_pattern(1e-6, 0.1 * (c + 1)) for c in range(CHAINS)]

        def body(_, xs):
            out = list(xs)
            for _ in range(UNROLL):
                for c in range(CHAINS):
                    out[c] = out[c] * a + b
            return tuple(out)

        xs = jax.lax.fori_loop(0, n_iters, body, tuple(xs))
        acc = xs[0]
        for c in range(1, CHAINS):
            acc = acc + xs[c]
        out_ref[...] = acc

    return kernel


def _mixed_kernel(n_iters: int):
    """Compare/select/min/add mix — the scoring loop's op diet."""

    def kernel(seed_ref, out_ref):
        s = seed_ref[0]
        thr = _lane_pattern(1e-9, 0.5 + s * 1e-9)
        one = _lane_pattern(1e-12, 1.000001)
        xs = [_lane_pattern(1e-6, 0.1 * (c + 1)) for c in range(CHAINS)]

        def body(_, carry):
            xs = list(carry)
            for _ in range(UNROLL // 4):
                for c in range(CHAINS):
                    x = xs[c]
                    m = x <= thr              # compare
                    x = jnp.where(m, x * one, x + thr)  # select + mul/add
                    x = jnp.minimum(x, thr * 4.0)       # min (+1 shared mul)
                    xs[c] = x
            return tuple(xs)

        xs = jax.lax.fori_loop(0, n_iters, body, tuple(xs))
        acc = xs[0]
        for c in range(1, CHAINS):
            acc = acc + xs[c]
        out_ref[...] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("n_iters", "kind", "n_rep"))
def _run_chain(seed, n_iters: int, kind: str, n_rep: int = 1):
    kern = _fma_kernel(n_iters) if kind == "fma" else _mixed_kernel(n_iters)

    def call_one(s):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, LAN), jnp.float32),
        )(s.reshape(1))

    return _serial_repeat(call_one, seed, n_rep)


import numpy as np


def _time_best(fn, reps: int = 5, small: int = 1, large: int = 9):
    """Single-program delta timing with a FORCED host readback.

    Two measurement hazards through the axon tunnel, both reproduced:
    ``jax.block_until_ready`` can return without waiting (35 us on
    multi-ms kernels), and INDEPENDENT pipelined calls can overlap on the
    backend, inflating apparent throughput several-fold.  So: ``fn(k,
    n_rep)`` must run its workload n_rep times serially INSIDE one jitted
    program (dependency-chained), the timed region ends with
    ``np.asarray`` of the (tiny) output, and the tunnel round-trip
    (~25 ms) is subtracted by differencing a small- and a large-n_rep
    call.  Returns seconds per single workload repetition.
    """
    k = [0]

    def run(n_rep):
        t0 = time.perf_counter()
        out = fn(k[0], n_rep)
        k[0] += 1
        np.asarray(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    run(small)   # compile small
    run(large)   # compile large
    run(small)   # tunnel first-loop artifact
    # Median of deltas: tunnel RTT jitter is multi-ms, so callers must
    # size (large - small) * workload >> jitter; the median rejects
    # outlier round-trips, and non-positive deltas are discarded.
    deltas = []
    for _ in range(reps):
        t_small = run(small)
        t_large = run(large)
        d = (t_large - t_small) / (large - small)
        if d > 0:
            deltas.append(d)
    assert deltas, "all timing deltas non-positive: workload too small " \
                   "vs tunnel jitter — raise n_iters/n_rep"
    deltas.sort()
    return deltas[len(deltas) // 2]


def _serial_repeat(call_one, seed, n_rep: int):
    """Run ``call_one(seed) -> [8, LAN] f32`` n_rep times with a forced
    serial dependency (each seed perturbed by the previous output)."""

    def body(_, carry):
        seed_f, acc = carry
        out = call_one(seed_f)
        # Data dependency: next seed depends on this output's value.
        return seed_f + out[0, 0] * 1e-20 + 1.0, acc + out[0, 0]

    _, acc = jax.lax.fori_loop(
        0, n_rep, body, (jnp.asarray(seed, jnp.float32), jnp.float32(0.0)))
    return acc


def measure_vpu_fma_peak(n_iters: int = 131072) -> float:
    """Sustained f32 FLOP/s (FMA = 2 FLOPs) on [8, 512] tiles."""
    dt = _time_best(lambda k, r: _run_chain(k, n_iters, "fma", r))
    flops = 2.0 * n_iters * UNROLL * CHAINS * SUB * LAN
    return flops / dt


def measure_vpu_op_peak(n_iters: int = 131072) -> float:
    """Sustained generic vector element-ops/s (cmp/select/min/mul/add)."""
    dt = _time_best(lambda k, r: _run_chain(k, n_iters, "mixed", r))
    # ops per trip per chain: UNROLL//4 groups x 5 ops (cmp, mul, add,
    # select, min) + 1 shared mul -> count the 5 dependent ones.
    ops = n_iters * (UNROLL // 4) * 5 * CHAINS * SUB * LAN
    return ops / dt


def _mxu_kernel(n_iters: int, m: int, k: int, n: int):
    def kernel(seed_ref, out_ref):
        s = seed_ref[0]
        ar = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0)
        ac = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
        a = (ar - ac).astype(jnp.float32) * 1e-6 + 1e-3 + s * 1e-12
        br = jax.lax.broadcasted_iota(jnp.int32, (k, n), 0)
        bc = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
        b = (bc - br).astype(jnp.float32) * 1e-6 + 1e-3

        def body(_, a):
            c = jnp.dot(a, b, preferred_element_type=jnp.float32)
            return c[:, :k] * 1e-3
        a = jax.lax.fori_loop(0, n_iters, body, a)
        out_ref[...] = a[:SUB, :LAN]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_iters", "m", "k", "n",
                                             "n_rep"))
def _run_mxu(seed, n_iters: int, m: int = 512, k: int = 512, n: int = 512,
             n_rep: int = 1):
    def call_one(s):
        return pl.pallas_call(
            _mxu_kernel(n_iters, m, k, n),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, LAN), jnp.float32),
        )(s.reshape(1))

    return _serial_repeat(call_one, seed, n_rep)


def measure_mxu_peak(n_iters: int = 4096, m: int = 512, k: int = 512,
                     n: int = 512) -> float:
    """Sustained f32 matmul FLOP/s at [m,k]x[k,n] resident in VMEM."""
    dt = _time_best(lambda s, r: _run_mxu(s, n_iters, m, k, n, r))
    return 2.0 * m * k * n * n_iters / dt


def measure_hbm_bw(mb: int = 512) -> float:
    """Streaming READ bandwidth (bytes/s): a full-array reduction forces
    one HBM pass per repetition; repetitions are dependency-chained
    inside one jit so they cannot overlap.  (A copy benchmark would need
    the full output read back through the tunnel; read BW is the figure
    our HBM-bound stage-wise paths ride.)"""
    n = mb * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def f(x, s, n_rep):
        def body(_, carry):
            s, acc = carry
            v = jnp.sum(x * s)
            return s + v * 1e-30 + 1.0, acc + v
        _, acc = jax.lax.fori_loop(0, n_rep, body, (s, jnp.float32(0.0)))
        return acc

    dt = _time_best(lambda k, r: f(x, jnp.float32(k + 1), r),
                    small=2, large=34)
    return n * 4 / dt


def measure_all() -> dict:
    """All rooflines on the attached chip; used by ``cli profile --sol``."""
    return {
        "vpu_fma_flops": measure_vpu_fma_peak(),
        "vpu_ops": measure_vpu_op_peak(),
        "mxu_flops": measure_mxu_peak(),
        "hbm_bytes": measure_hbm_bw(),
    }


if __name__ == "__main__":
    import json

    print(json.dumps({k: f"{v:.4g}" for k, v in measure_all().items()}))
