"""Attribute the fused train step's wall time between its stages.

Round-4 outlook item 2 (ROADMAP.md): before optimizing any stage of the
385-480 ms fused step, measure where it goes.  Three timings at the bench
configuration (1920x1080, 64-prim, 8 bounces):

  kernel_only  - bake + the fused Pallas kernel (phase-1 forward march +
                 phase-2 per-pixel backward), outputs materialized, but
                 NONE of the XLA-side parameter reductions.
  full_step    - make_fused_value_and_grad (kernel + segment matmuls +
                 bake/table vjps).
  forward_ref  - the forward megakernel frame (render_frame_pallas) as a
                 phase-1 analog (it additionally accumulates + tonemaps,
                 and does not store per-bounce segment scratch).

Derived: xla_reductions = full_step - kernel_only;
phase2_backward ~= kernel_only - forward_ref (approximate: the two
kernels' phase-1s differ slightly, see forward_ref note).

Timing: >= 2 warmup + 7 timed reps per point, median reported (axon
per-launch jitter; these are ~300-500 ms ops so small rep counts are
stable - see ROADMAP timing-methodology note).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compute_path_tracer_tpu.app.tpulock import tpu_lock  # noqa: E402

W, H, BOUNCES, N_PRIMS = 1920, 1080, 8, 64
REPS = 7


def _sync(out):
    # Force completion with a D2H copy: on the axon platform
    # block_until_ready can return before queued work executes (see the
    # identical note in bench.py).
    import jax

    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:2]).sum()


def _median_time(fn, *args):
    for _ in range(2):
        _sync(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.kernels.train import (
        DEFAULT_TILE,
        _fused_planes,
        _pad_planes,
        _union_only,
        make_fused_value_and_grad,
    )
    from compute_path_tracer_tpu.render.baked import bake
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    from compute_path_tracer_tpu.constants import DEFAULT_FOV

    cs = compile_scene(benchmark_scene(N_PRIMS))
    spec = cs.spec
    assert _union_only(spec)
    params = jnp.asarray(cs.params)
    rng = np.random.default_rng(0)
    target = (rng.random((H, W, 3)) * 0.2).astype(np.float32)
    th, tw = DEFAULT_TILE
    planes = _pad_planes(jnp.transpose(jnp.asarray(target), (2, 0, 1)), th, tw)
    fov, aspect = DEFAULT_FOV, W / H
    rows = []

    for analytic in (False, True):
        tag = "analytic" if analytic else "faithful"

        @jax.jit
        def kernel_only(pp, pl, analytic=analytic):
            bv = bake(spec, pp)
            return _fused_planes(
                spec, pp, bv, pl, jnp.int32(0), jnp.float32(fov),
                jnp.float32(aspect), jnp.int32(0), H,
                width=W, height=H, bounces=BOUNCES, tile_h=th, tile_w=tw,
                interpret=False, winner_geom=True, analytic_unboxed=analytic,
            )

        t_kernel = _median_time(kernel_only, params, planes)

        step = make_fused_value_and_grad(
            spec, target, width=W, height=H, bounces=BOUNCES,
            analytic_unboxed=analytic,
        )
        t_full = _median_time(step, params)

        @jax.jit
        def fwd(pp, analytic=analytic):
            return render_frame_pallas(
                spec, pp, width=W, height=H, frame=0,
                bounces=BOUNCES, geometry="baked", t_cull=True,
                analytic_unboxed=analytic,
            )

        t_fwd = _median_time(fwd, params)

        row = {
            "config": tag,
            "kernel_only_ms": round(t_kernel * 1e3, 2),
            "full_step_ms": round(t_full * 1e3, 2),
            "forward_ref_ms": round(t_fwd * 1e3, 2),
            "xla_reductions_ms": round((t_full - t_kernel) * 1e3, 2),
            "phase2_backward_ms_approx": round((t_kernel - t_fwd) * 1e3, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    with tpu_lock():
        rows = main()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "fused_attrib_r03.jsonl")
    with open(out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
