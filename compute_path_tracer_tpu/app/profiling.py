"""Profiling hooks and roofline accounting.

The reference's only profiling is the GUI FPS meter and ad-hoc Instant
prints (SURVEY.md §5); the TPU build adds device traces (jax.profiler) and
an analytic cost model of the renderer for roofline comparisons: how many
VPU flops a frame fundamentally costs, and what fraction of peak a measured
frame time achieves.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace around a block (view with TensorBoard
    or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Approximate per-primitive vector-op cost of one map() evaluation:
# transform (scale+move+rot3d ~21) + sdf (~8) + scale fix + CSG combine (~7).
_OPS_PER_PRIM_EVAL = 36
# map taps per bounce: march steps + 6 normal taps + 1 implicit bounds pass.
_NORMAL_TAPS = 6


@dataclasses.dataclass
class FrameCost:
    """Analytic flop estimate for one progressive frame."""

    width: int
    height: int
    n_prims: int
    bounces: int
    march_steps: int = 80

    @property
    def map_evals_per_bounce(self) -> int:
        return self.march_steps + _NORMAL_TAPS

    @property
    def flops(self) -> float:
        rays = self.width * self.height * (self.bounces + 1)
        return float(rays) * self.map_evals_per_bounce * self.n_prims * _OPS_PER_PRIM_EVAL

    def achieved_tflops(self, frame_seconds: float) -> float:
        return self.flops / frame_seconds / 1e12

    def utilization(self, frame_seconds: float, peak_tflops: float = 8.0) -> float:
        """Fraction of (default: v5e-ish f32 VPU) peak the frame achieved,
        assuming zero early-exit - real kernels do less work than the model,
        so >1.0 means culling/early-exit is winning."""
        return self.achieved_tflops(frame_seconds) / peak_tflops


def measure_frame_time(frame_fn, *args, warmup: int = 1, iters: int = 3, **kwargs) -> float:
    """Median wall time of frame_fn, synced via a device->host read (the
    axon platform's block_until_ready can return early; a D2H copy cannot)."""
    import numpy as np

    def sync(x):
        np.asarray(x)[:1]
        return x

    for i in range(warmup):
        sync(frame_fn(*args, **kwargs))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        sync(frame_fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
