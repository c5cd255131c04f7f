"""Round-5 verdict item: the 64 -> 512 prim scaling curve.

Measures the forward frame (faithful t_cull march AND the full-analytic
bounce) and the fused train step at 64/128/256/512 primitives on real
hardware - the round-4 weak item was that the O(n_shapes) material select
chain (megakernel._make_smem_gather_mat) and the SMEM param footprint were
untested past 64 prims.  Writes benchmarks/artifacts/prim_scaling_r05.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, B = 1920, 1080, 8


def sync(x):
    np.asarray(x[:2, :2] if x.ndim >= 2 else x[:2]).sum()


def time_forward(spec, params, reps=3, **kw):
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

    fn = lambda: render_frame_pallas(spec, params, width=W, height=H,
                                     bounces=B, geometry="baked", **kw)
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def time_fused(spec, params, target, reps=2):
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad

    step = make_fused_value_and_grad(spec, target, width=W, height=H,
                                     bounces=B)
    _, g = step(params)
    sync(g)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, g = step(params)
        sync(g)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts), bool(np.isfinite(np.asarray(g)).all())


def main():
    import jax.numpy as jnp

    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    rays = W * H * (B + 1)
    rows = []
    target = np.zeros((H, W, 3), np.float32)
    with tpu_lock():
        for n in (64, 128, 256, 512):
            cs = compile_scene(benchmark_scene(n))
            spec = cs.spec
            params = jnp.asarray(cs.params, jnp.float32)
            row = {"n_prims": n, "n_params": int(cs.params.shape[0])}
            try:
                ms = time_forward(spec, params, t_cull=True)
                row["faithful_ms"] = ms
                row["faithful_mrays"] = rays / ms / 1e3
            except Exception as e:  # noqa: BLE001
                row["faithful_error"] = repr(e)[:300]
            try:
                ms = time_forward(spec, params, analytic_all=True)
                row["analytic_all_ms"] = ms
                row["analytic_all_mrays"] = rays / ms / 1e3
            except Exception as e:  # noqa: BLE001
                row["analytic_all_error"] = repr(e)[:300]
            try:
                ms, finite = time_fused(spec, params, target)
                row["fused_ms"] = ms
                row["fused_grad_finite"] = finite
            except Exception as e:  # noqa: BLE001
                row["fused_error"] = repr(e)[:300]
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open("benchmarks/artifacts/prim_scaling_r05.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
