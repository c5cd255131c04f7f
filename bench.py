"""Headline benchmark: forward path-tracing throughput on one chip.

Measures rays/s (one ray per bounce segment per pixel per frame) for the
Pallas megakernel at 1080p on the 64-primitive CSG benchmark scene with the
reference's default 8-bounce budget - the north-star configuration from
BASELINE.json.  Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}
vs_baseline is value / 1e9 (the reference publishes no numbers; 1e9 rays/s
per chip is the BASELINE.json target).
"""

import json
import sys
import time

WIDTH, HEIGHT, BOUNCES = 1920, 1080, 8
N_PRIMS = 64
WARMUP_FRAMES = 1
TIMED_FRAMES = 3


def main():
    import jax
    import numpy as np

    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    cs = compile_scene(benchmark_scene(N_PRIMS))
    backend = "pallas"
    try:
        from compute_path_tracer_tpu.kernels import render_frame_pallas as frame_fn
    except Exception:
        from compute_path_tracer_tpu.render import render_frame as frame_fn
        backend = "xla"

    # Leaf-baked geometry (render/baked.py): same images as the faithful
    # transform-chain map up to fp rounding (tests/test_baked.py), ~2.5x
    # faster on v5e; the XLA fallback accepts the same kwarg.  t-interval
    # culling (kernels/megakernel.py:_march_while_tcull) is an eps-level
    # approximation (<0.1% of pixels, tests/test_baked.py:test_tcull_*)
    # worth ~12% of frame time; dropped again if we fall back to XLA.
    geometry = "baked"
    kernel_kw = {"geometry": geometry}
    if backend == "pallas":
        kernel_kw["t_cull"] = True

    def run(n_frames, accum, frame0):
        for f in range(n_frames):
            accum = frame_fn(
                cs.spec,
                cs.params,
                accum=accum,
                frame=frame0 + f,
                last_clear=frame0 + f,
                width=WIDTH,
                height=HEIGHT,
                debug=0,
                bounces=BOUNCES,
                **kernel_kw,
            )
        # Force completion with a device-to-host copy: on the axon platform
        # block_until_ready can return before queued work executes, which
        # fabricates absurd frame times; a D2H read cannot lie.
        np.asarray(accum[:2, :2]).sum()
        return accum

    try:
        accum = run(WARMUP_FRAMES, None, 0)  # compile + warm
        t0 = time.perf_counter()
        accum = run(TIMED_FRAMES, accum, WARMUP_FRAMES)
        dt = time.perf_counter() - t0
    except Exception as e:  # pallas path failed: fall back to pure XLA
        if backend == "pallas":
            from compute_path_tracer_tpu.render import render_frame as frame_fn_xla
            frame_fn = frame_fn_xla  # noqa: F841
            backend = "xla-fallback"
            kernel_kw.pop("t_cull", None)
            accum = run(WARMUP_FRAMES, None, 0)
            t0 = time.perf_counter()
            accum = run(TIMED_FRAMES, accum, WARMUP_FRAMES)
            dt = time.perf_counter() - t0
        else:
            raise

    rays = WIDTH * HEIGHT * (BOUNCES + 1) * TIMED_FRAMES
    value = rays / dt
    print(
        json.dumps(
            {
                "metric": f"fwd path-trace rays/s/chip @ {WIDTH}x{HEIGHT}, "
                f"{N_PRIMS}-prim CSG, {BOUNCES} bounces",
                "value": value,
                "unit": "rays/s",
                "vs_baseline": value / 1e9,
                "backend": backend,
                "geometry": geometry,
                "frame_ms": dt / TIMED_FRAMES * 1e3,
                "device": str(jax.devices()[0]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
