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


# Per shape-evaluation vector-op cost of the BAKED map (leaf affine already
# folded): sphere ~10, cube ~27, octahedron ~25, combine+guard ~4.  A single
# blended constant keeps the measured-work conversion simple.
_OPS_PER_BAKED_EVAL = 20
# Nominal v5e f32 VPU peak (8x128 lanes x 4 ALU slots x ~0.94 GHz).  The
# measured attainable rate on dependent elementwise chains is far lower
# (benchmarks/vpu_peak.py); utilization against the nominal peak separates
# scheduling losses from algorithmic ones, per round-2 plan.
PEAK_VPU_TFLOPS = 3.9
# MEASURED attainable elementwise-f32 rate on this chip: the saturation
# point of benchmarks/vpu_peak.py's independent-fma-chain sweep (1.56 Tf/s
# at 64 chains; benchmarks/artifacts/vpu_peak_r03.txt).  This, not the
# nominal datasheet number, is the honest roofline for the march's
# dependent scalar chains; bench.py reports utilization against both.
ATTAINABLE_VPU_TFLOPS = 1.56


def measured_frame_cost(spec, params, *, width, height, bounces,
                        geometry="baked", t_cull=True, tile=(64, 128),
                        frame=1):
    """MEASURED per-frame work of the megakernel via its in-kernel stats
    mode (debug=4): per tile, the march's total steps and summed tile-active
    shape counts plus the aux (normal/final-id) tap counts - the true
    post-culling evaluation count, not a zero-early-exit model.

    Returns a dict with executed shape-evaluations, estimated executed
    flops, and per-ray averages; combine with a measured frame time for
    honest achieved-vs-peak numbers (bench.py).
    """
    import numpy as np

    from ..kernels.megakernel import render_frame_pallas

    img = np.asarray(
        render_frame_pallas(
            spec, params, width=width, height=height, debug=4,
            bounces=bounces, frame=frame, last_clear=frame,
            geometry=geometry, t_cull=t_cull, tile=tile,
        )
    )
    th, tw = tile
    tiles = img[::th, ::tw, :]
    lanes = th * tw
    steps = float(tiles[..., 0].sum())
    march_evals = float(tiles[..., 1].sum()) * lanes
    aux_evals = float(tiles[..., 2].sum()) * lanes
    total = march_evals + aux_evals
    rays = width * height * (bounces + 1)
    return {
        "march_steps_total": steps,
        "shape_evals_executed": total,
        "shape_evals_per_ray": total / rays,
        "flops_executed": total * _OPS_PER_BAKED_EVAL,
    }


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
