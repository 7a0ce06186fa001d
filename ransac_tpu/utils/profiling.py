"""Profiling hooks + speed-of-light utilization reporting.

The reference's only performance signal is log-timestamp deltas in
``debug.log`` (SURVEY.md §5).  Here: ``jax.profiler`` trace capture helpers
and a roofline-style speed-of-light model for the framework's hot kernels —
each kernel reports achieved FLOP/s and bytes/s against the chip's peaks,
the BASELINE.md "SoL utilization per chip" deliverable.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

# Peak numbers per chip generation (f32 vector FLOP/s, HBM B/s).  The
# compute path is VPU-bound elementwise math (the MXU peak applies only to
# matmul-shaped work like descriptor matching).
CHIP_PEAKS = {
    # name: (vpu_f32_flops, mxu_bf16_flops, hbm_bytes_per_s)
    "v5e": (0.25e15 / 2, 394e12, 819e9),   # ~197 Tf bf16 MXU, 819 GB/s
    "v5p": (0.459e15 / 2, 918e12, 2765e9),
    "cpu": (1e11, 1e11, 5e10),
}


def detect_chip() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "") or ""
    if "v5 lite" in kind.lower() or "v5e" in kind.lower():
        return "v5e"
    if "v5p" in kind.lower() or "v5" in kind.lower():
        return "v5p"
    if d.platform == "tpu":
        return "v5e"
    return "cpu"


@dataclass
class KernelReport:
    name: str
    seconds: float
    flops: float
    bytes_moved: float
    chip: str

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds

    @property
    def achieved_bw(self) -> float:
        return self.bytes_moved / self.seconds

    @property
    def sol_compute(self) -> float:
        return self.achieved_flops / CHIP_PEAKS[self.chip][0]

    @property
    def sol_memory(self) -> float:
        return self.achieved_bw / CHIP_PEAKS[self.chip][2]

    @property
    def sol(self) -> float:
        """Utilization against the binding resource (roofline)."""
        return max(self.sol_compute, self.sol_memory)

    def row(self) -> dict:
        return {
            "kernel": self.name, "ms": self.seconds * 1e3,
            "gflops": self.achieved_flops / 1e9,
            "gbps": self.achieved_bw / 1e9,
            "sol_compute": self.sol_compute, "sol_memory": self.sol_memory,
            "sol": self.sol, "chip": self.chip,
        }


@dataclass
class SolProfiler:
    reports: list = field(default_factory=list)
    chip: str = ""

    def __post_init__(self):
        if not self.chip:
            self.chip = detect_chip()

    def measure(self, name: str, fn, *args, flops: float = 0.0,
                bytes_moved: float = 0.0, iters: int = 10, vary=None,
                reps: int = 3):
        """Time a jitted callable (excluding compile) and record SoL.

        Dispatch is pipelined (block once after ``iters`` launches) so
        tunnel round-trip latency is excluded; the best of ``reps``
        repetitions is kept because the first timed loop of a fresh
        process through the axon tunnel absorbs a one-time ~13-26 ms cost
        even after the jit warmup call (PERF.md measurement note).  Pass
        ``vary`` (i -> args tuple) to change the input each iteration —
        repeat-calling with identical inputs through the axon tunnel can
        be served from a result cache and report impossible throughput.
        """
        out = fn(*(vary(0) if vary else args))
        jax.block_until_ready(out)
        dt = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            outs = [fn(*(vary(rep * iters + i + 1) if vary else args))
                    for i in range(iters)]
            jax.block_until_ready(outs)
            dt = min(dt, (time.perf_counter() - t0) / iters)
        out = outs[-1]
        rep = KernelReport(name=name, seconds=dt, flops=flops,
                           bytes_moved=bytes_moved, chip=self.chip)
        self.reports.append(rep)
        return out, rep

    def table(self) -> str:
        lines = [f"{'kernel':28s} {'ms':>9s} {'GF/s':>9s} {'GB/s':>8s} "
                 f"{'SoL%':>6s}"]
        for r in self.reports:
            lines.append(
                f"{r.name:28s} {r.seconds*1e3:9.3f} "
                f"{r.achieved_flops/1e9:9.1f} {r.achieved_bw/1e9:8.1f} "
                f"{100*r.sol:6.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)
