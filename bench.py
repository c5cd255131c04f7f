"""Headline benchmarks: forward and fwd+bwd path-tracing throughput, 1 chip.

Measures rays/s (one ray per bounce segment per pixel per frame) at 1080p on
the 64-primitive CSG benchmark scene with the reference's default 8-bounce
budget - the north-star configuration from BASELINE.json.  Prints one JSON
line per metric:

  fwd+bwd training step, three configurations: the faithful XLA reverse
          sweep with the on-chip march (kernels/march.py), the in-kernel
          detached-normals variant, and the FUSED kernel (kernels/train.py:
          forward + per-pixel backward in one Pallas kernel - the fast
          training configuration, 6.9x the XLA sweep in round 3);
  faithful forward render (Pallas megakernel, baked geometry, t-interval
          culling), with MEASURED roofline accounting - executed
          shape-evaluations from the kernel's stats mode (debug=4), the
          achieved f32 Tflop/s they imply, and utilization against BOTH
          the nominal VPU peak and the measured attainable rate
          (app/profiling.py, vpu_peak artifact) - so scheduling losses
          are separable from algorithmic ones;
  LAST (the headline the driver records): the round-5 FULL-ANALYTIC
          forward render (analytic_all): every leaf intersected in closed
          form, no march - 6.4x the faithful row at 99.95% pixel
          agreement (divergence classes documented in
          kernels/megakernel.py).

vs_baseline is value / 1e9 (the reference publishes no numbers; 1e9 rays/s
per chip is the BASELINE.json target).
"""

import json
import os
import sys
import time

# Persistent compilation cache: cuts warm-up compiles on repeat runs without
# touching timed regions (all timings are post-warmup).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

WIDTH, HEIGHT, BOUNCES = 1920, 1080, 8
N_PRIMS = 64
WARMUP_FRAMES = 1
TIMED_FRAMES = 3
BWD_TIMED_STEPS = 2


def bench_forward(cs):
    import jax
    import numpy as np

    backend = "pallas"
    try:
        from compute_path_tracer_tpu.kernels import render_frame_pallas as frame_fn
    except Exception:
        from compute_path_tracer_tpu.render import render_frame as frame_fn
        backend = "xla"

    # Leaf-baked geometry (render/baked.py): same images as the faithful
    # transform-chain map up to fp rounding (tests/test_baked.py).  t-interval
    # culling (kernels/megakernel.py:_march_while_tcull) is an eps-level
    # approximation (<0.1% of pixels, tests/test_baked.py:test_tcull_*).
    geometry = "baked"
    kernel_kw = {"geometry": geometry}
    if backend == "pallas":
        kernel_kw["t_cull"] = True

    def run(n_frames, accum, frame0):
        for f in range(n_frames):
            accum = frame_fn(
                cs.spec, cs.params, accum=accum, frame=frame0 + f,
                last_clear=frame0 + f, width=WIDTH, height=HEIGHT,
                debug=0, bounces=BOUNCES, **kernel_kw,
            )
        # Force completion with a device-to-host copy: on the axon platform
        # block_until_ready can return before queued work executes; a D2H
        # read cannot lie.
        np.asarray(accum[:2, :2]).sum()
        return accum

    try:
        accum = run(WARMUP_FRAMES, None, 0)  # compile + warm
        t0 = time.perf_counter()
        accum = run(TIMED_FRAMES, accum, WARMUP_FRAMES)
        dt = time.perf_counter() - t0
    except Exception:  # pallas path failed: fall back to pure XLA
        if backend != "pallas":
            raise
        from compute_path_tracer_tpu.render import render_frame as frame_fn_xla
        frame_fn = frame_fn_xla  # noqa: F841
        backend = "xla-fallback"
        kernel_kw.pop("t_cull", None)
        accum = run(WARMUP_FRAMES, None, 0)
        t0 = time.perf_counter()
        accum = run(TIMED_FRAMES, accum, WARMUP_FRAMES)
        dt = time.perf_counter() - t0

    frame_s = dt / TIMED_FRAMES
    rays = WIDTH * HEIGHT * (BOUNCES + 1) * TIMED_FRAMES
    value = rays / dt
    out = {
        "metric": f"fwd path-trace rays/s/chip @ {WIDTH}x{HEIGHT}, "
        f"{N_PRIMS}-prim CSG, {BOUNCES} bounces",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "backend": backend,
        "geometry": geometry,
        "frame_ms": frame_s * 1e3,
        "device": str(jax.devices()[0]),
    }
    if backend == "pallas":
        try:
            from compute_path_tracer_tpu.app.profiling import (
                ATTAINABLE_VPU_TFLOPS,
                PEAK_VPU_TFLOPS,
                measured_frame_cost,
            )

            cost = measured_frame_cost(
                cs.spec, cs.params, width=WIDTH, height=HEIGHT,
                bounces=BOUNCES, geometry=geometry, t_cull=True,
            )
            achieved = cost["flops_executed"] / frame_s / 1e12
            out["shape_evals_per_ray"] = cost["shape_evals_per_ray"]
            out["achieved_tflops"] = achieved
            out["vpu_utilization"] = achieved / PEAK_VPU_TFLOPS
            # Against the MEASURED attainable elementwise rate
            # (benchmarks/vpu_peak.py artifact), the honest roofline.
            out["attainable_tflops"] = ATTAINABLE_VPU_TFLOPS
            out["attainable_utilization"] = achieved / ATTAINABLE_VPU_TFLOPS
        except Exception as e:
            out["roofline_error"] = f"{type(e).__name__}: {e}"
    return out


def bench_fwd_bwd(cs, normals="central"):
    import jax
    import numpy as np

    from compute_path_tracer_tpu.diff import make_loss

    target = np.zeros((HEIGHT, WIDTH, 3), np.float32)
    march = "pallas"
    try:
        loss = make_loss(
            cs.spec, target, width=WIDTH, height=HEIGHT, bounces=BOUNCES,
            geometry="baked", march=march, normals=normals,
        )
        vg = jax.jit(jax.value_and_grad(loss))
        _, g = vg(cs.params)
        np.asarray(g[:2]).sum()  # compile + warm (D2H sync)
    except Exception:
        march = "xla"
        if normals == "kernel":  # needs the pallas march; no xla fallback
            raise
        loss = make_loss(
            cs.spec, target, width=WIDTH, height=HEIGHT, bounces=BOUNCES,
            geometry="baked", march=march, normals=normals,
        )
        vg = jax.jit(jax.value_and_grad(loss))
        _, g = vg(cs.params)
        np.asarray(g[:2]).sum()

    t0 = time.perf_counter()
    for _ in range(BWD_TIMED_STEPS):
        _, g = vg(cs.params)
    np.asarray(g[:2]).sum()
    dt = (time.perf_counter() - t0) / BWD_TIMED_STEPS

    rays = WIDTH * HEIGHT * (BOUNCES + 1)
    value = rays / dt
    label = "" if normals == "central" else f", normals={normals}"
    return {
        "metric": f"fwd+bwd train-step rays/s/chip @ {WIDTH}x{HEIGHT}, "
        f"{N_PRIMS}-prim CSG, {BOUNCES} bounces{label}",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "march": march,
        "normals": normals,
        "step_ms": dt * 1e3,
        "grad_finite": bool(np.isfinite(np.asarray(g)).all()),
        "device": str(jax.devices()[0]),
    }


def bench_forward_analytic(cs):
    """Opt-in semantic-trade forward row: closed-form intersection of the
    guard-less shapes (analytic_unboxed).  Round-3 measurement: 251 ms =
    74.3 Mrays/s vs the 288-293 ms faithful headline, ~2.5% of tonemapped
    pixels >1% delta at 7 accumulated frames (divergence classes in
    kernels/megakernel.py docstring)."""
    import jax
    import numpy as np

    from compute_path_tracer_tpu.kernels import render_frame_pallas

    def run(n_frames, accum, frame0):
        for f in range(n_frames):
            accum = render_frame_pallas(
                cs.spec, cs.params, accum=accum, frame=frame0 + f,
                last_clear=frame0 + f, width=WIDTH, height=HEIGHT,
                debug=0, bounces=BOUNCES, geometry="baked", t_cull=True,
                analytic_unboxed=True,
            )
        np.asarray(accum[:2, :2]).sum()
        return accum

    accum = run(WARMUP_FRAMES, None, 0)
    t0 = time.perf_counter()
    run(TIMED_FRAMES, accum, WARMUP_FRAMES)
    dt = time.perf_counter() - t0
    value = WIDTH * HEIGHT * (BOUNCES + 1) * TIMED_FRAMES / dt
    return {
        "metric": f"fwd path-trace rays/s/chip @ {WIDTH}x{HEIGHT}, "
        f"{N_PRIMS}-prim CSG, {BOUNCES} bounces, analytic_unboxed "
        "(opt-in semantic trade)",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "frame_ms": dt / TIMED_FRAMES * 1e3,
        "device": str(jax.devices()[0]),
    }


def bench_forward_analytic_all(cs):
    """The round-5 HEADLINE forward row: FULL-analytic bounce
    (kernels/megakernel.py ``analytic_all``) - union-only scenes intersect
    every leaf kind in closed form (sphere quadratic, cube 3-slab,
    octahedron 4-slab polytope, plane linear), so the 80-step march, the
    6 normal taps and the final-id re-tap disappear.  Reference map
    membership (per-ray check[] incl. the first-shape clobber quirk) is
    exactly preserved; hits land ON surfaces instead of the |d| < MHD
    shell and the budget-exit creep class resolves exactly - the same
    documented divergence classes as analytic_unboxed, now whole-scene
    (interpret agreement 99.95% of pixels at 1e-2,
    benchmarks/artifacts/distgrid_r05.jsonl)."""
    import jax
    import numpy as np

    from compute_path_tracer_tpu.kernels import render_frame_pallas

    def run(n_frames, accum, frame0):
        for f in range(n_frames):
            accum = render_frame_pallas(
                cs.spec, cs.params, accum=accum, frame=frame0 + f,
                last_clear=frame0 + f, width=WIDTH, height=HEIGHT,
                debug=0, bounces=BOUNCES, geometry="baked",
                analytic_all=True,
            )
        np.asarray(accum[:2, :2]).sum()
        return accum

    accum = run(WARMUP_FRAMES, None, 0)
    t0 = time.perf_counter()
    run(TIMED_FRAMES, accum, WARMUP_FRAMES)
    dt = time.perf_counter() - t0
    value = WIDTH * HEIGHT * (BOUNCES + 1) * TIMED_FRAMES / dt
    return {
        "metric": f"fwd path-trace rays/s/chip @ {WIDTH}x{HEIGHT}, "
        f"{N_PRIMS}-prim CSG, {BOUNCES} bounces, analytic_all "
        "(closed-form intersections, union-only scenes)",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "backend": "pallas",
        "geometry": "baked",
        "frame_ms": dt / TIMED_FRAMES * 1e3,
        "device": str(jax.devices()[0]),
    }


def bench_forward_soa(n_prims=256):
    """Scaling-path forward row (round 5): the Pallas SoA analytic kernel
    (kernels/megakernel.py ``analytic_soa``: in-kernel fori_loop over
    packed SMEM shape tables, render/soa.py:build_soa_smem_layout) at a
    prim count the trace-unrolled kernels cannot reach (256-prim faithful
    compile took tens of minutes and the 256-prim fused kernel failed to
    Mosaic-compile, prim_scaling_r05.jsonl).  Compile time bounded in n
    (prim_scaling_soa_r05.jsonl); bit-exact with analytic_all where both
    compile (tests/test_soa.py)."""
    import jax
    import numpy as np

    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene.compile import compile_scene
    from compute_path_tracer_tpu.scene.library import benchmark_scene

    cs = compile_scene(benchmark_scene(n_prims))

    def run(n_frames, frame0):
        for f in range(n_frames):
            out = render_frame_pallas(cs.spec, cs.params, frame=frame0 + f,
                                      last_clear=frame0 + f, width=WIDTH,
                                      height=HEIGHT, bounces=BOUNCES,
                                      geometry="baked", analytic_soa=True)
        np.asarray(out[:2, :2]).sum()  # force remote materialization
        return out

    t0 = time.perf_counter()
    run(WARMUP_FRAMES, 0)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(TIMED_FRAMES, WARMUP_FRAMES)
    dt = time.perf_counter() - t0
    value = WIDTH * HEIGHT * (BOUNCES + 1) * TIMED_FRAMES / dt
    return {
        "metric": f"fwd path-trace rays/s/chip @ {WIDTH}x{HEIGHT}, "
        f"{n_prims}-prim CSG, {BOUNCES} bounces, SoA scaling path "
        "(in-kernel shape loop; compile bounded in prim count)",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "backend": "pallas-soa",
        "compile_s": round(compile_s, 1),
        "frame_ms": dt / TIMED_FRAMES * 1e3,
        "device": str(jax.devices()[0]),
    }


def bench_fused(cs, analytic=False, edge=False, secondary=False,
                analytic_all=False):
    """The fused train step (kernels/train.py): forward render + per-pixel
    backward in one Pallas kernel, parameter scatters in XLA.  Gradient
    semantics = normals="detached" (the fast-training configuration).
    ``analytic=True`` additionally applies the analytic_unboxed semantic
    trade (round 3: 475 -> 385 ms).  ``edge=True`` adds the fused
    PRIMARY-silhouette edge gradient (round 4) - the configuration that can
    actually learn geometry."""
    import jax
    import numpy as np

    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad

    target = np.zeros((HEIGHT, WIDTH, 3), np.float32)
    step = make_fused_value_and_grad(
        cs.spec, target, width=WIDTH, height=HEIGHT, bounces=BOUNCES,
        analytic_unboxed=analytic, edge_grad=edge, edge_secondary=secondary,
        analytic_all=analytic_all,
    )
    _, g = step(cs.params)
    np.asarray(g[:2]).sum()  # compile + warm (D2H sync)

    t0 = time.perf_counter()
    for _ in range(BWD_TIMED_STEPS):
        _, g = step(cs.params)
    np.asarray(g[:2]).sum()
    dt = (time.perf_counter() - t0) / BWD_TIMED_STEPS

    rays = WIDTH * HEIGHT * (BOUNCES + 1)
    value = rays / dt
    label = ", analytic_unboxed" if analytic else ""
    if analytic_all:
        label += ", analytic_all"
    if edge:
        label += ", edge_grad"
    if secondary:
        label += "+secondary"
    return {
        "metric": f"fwd+bwd train-step rays/s/chip @ {WIDTH}x{HEIGHT}, "
        f"{N_PRIMS}-prim CSG, {BOUNCES} bounces, fused kernel "
        f"(normals=detached{label})",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "march": "fused-pallas",
        "step_ms": dt * 1e3,
        "grad_finite": bool(np.isfinite(np.asarray(g)).all()),
        "device": str(jax.devices()[0]),
    }


def main():
    import jax  # noqa: F401

    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    import jax.numpy as jnp

    with tpu_lock():
        return _main_locked(jnp, compile_scene, benchmark_scene)


def _main_locked(jnp, compile_scene, benchmark_scene):
    compiled = compile_scene(benchmark_scene(N_PRIMS))

    class _CS:  # both benches share the spec + device-resident params
        spec = compiled.spec
        params = jnp.asarray(compiled.params, jnp.float32)

    # fwd+bwd first (faithful gradient, then the fast-gradient training
    # config with in-kernel detached normals); the HEADLINE forward metric
    # prints LAST so a tail-parsing driver records it.
    try:
        print(json.dumps(bench_fwd_bwd(_CS)), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd+bwd train-step rays/s/chip",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    if not os.environ.get("BENCH_SKIP_FASTGRAD"):
        try:
            print(json.dumps(bench_fwd_bwd(_CS, normals="kernel")), flush=True)
        except Exception as e:
            print(json.dumps({
                "metric": "fwd+bwd train-step rays/s/chip, normals=kernel",
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
    try:
        print(json.dumps(bench_fused(_CS)), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd+bwd train-step rays/s/chip, fused kernel",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    # Round 4: the fused step WITH geometry (edge) gradients - the
    # configuration inverse rendering actually needs; its delta vs the
    # plain fused row is the cost of the in-march closest-approach
    # tracking + the extra reduction segment.
    try:
        print(json.dumps(bench_fused(_CS, edge=True)), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd+bwd train-step rays/s/chip, fused + edge_grad",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    # FULL geometry fidelity: + secondary-bounce visibility edges (the
    # adversarial-dominant term); runs on half-height tiles for VMEM.
    try:
        print(json.dumps(bench_fused(_CS, edge=True, secondary=True)),
              flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd+bwd train-step, fused + edge_grad+secondary",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    if not os.environ.get("BENCH_SKIP_ANALYTIC"):
        try:
            print(json.dumps(bench_fused(_CS, analytic=True)), flush=True)
        except Exception as e:
            print(json.dumps({
                "metric": "fwd+bwd train-step, fused + analytic_unboxed",
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
        # Opt-in semantic trade (NOT the headline): guard-less shapes
        # intersected in closed form (kernels/megakernel.py
        # analytic_unboxed; measured divergence classes documented there).
        try:
            print(json.dumps(bench_forward_analytic(_CS)), flush=True)
        except Exception as e:
            print(json.dumps({
                "metric": "fwd path-trace rays/s/chip, analytic_unboxed",
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
    # Round-5 fast trainer: fused step with the FULL-analytic phase 1 +
    # primary edge gradients (508 -> 240 ms with geometry learning;
    # 165 ms geometry-blind, fused_analytic_all_r05.jsonl).
    try:
        print(json.dumps(bench_fused(_CS, analytic_all=True, edge=True)),
              flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd+bwd train-step, fused + analytic_all + edge",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    # Round-5 scaling path: SoA analytic forward at 256 prims (a count
    # the unrolled kernels cannot compile).
    try:
        print(json.dumps(bench_forward_soa(256)), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd path-trace rays/s/chip, SoA scaling path",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    print(json.dumps(bench_forward(_CS)), flush=True)
    # Round-5 HEADLINE (printed LAST so the driver records it): the
    # full-analytic bounce.  The faithful marching row above remains the
    # reference-semantics baseline with roofline accounting.
    try:
        print(json.dumps(bench_forward_analytic_all(_CS)), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "fwd path-trace rays/s/chip, analytic_all",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
