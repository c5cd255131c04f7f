"""Measure the fused trainer's spp>1 mode: gradient-variance reduction and
per-step cost (round-5 verdict item 4).

Variance: per-parameter-slot variance of the fused gradient across K
disjoint frame windows, spp=1 vs spp=4 - the across-window variance of an
spp-average of iid per-frame gradients should drop ~4x.  Cost: warm
per-step wall time at both settings, 1080p benchmark config.  Writes
benchmarks/artifacts/fused_spp_r05.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, B = 1920, 1080, 8
K = 8


def main():
    import jax.numpy as jnp

    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels.train import make_fused_value_and_grad
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    cs = compile_scene(benchmark_scene(64))
    params = jnp.asarray(cs.params, jnp.float32)
    target = np.zeros((H, W, 3), np.float32)
    rows = []

    with tpu_lock():
        for spp in (1, 4):
            step = make_fused_value_and_grad(
                cs.spec, target, width=W, height=H, bounces=B,
                edge_grad=True, spp=spp)
            _, g = step(params, frame=0)
            np.asarray(g[:2]).sum()  # compile + warm (D2H sync)
            t0 = time.perf_counter()
            grads = []
            for k in range(K):
                _, g = step(params, frame=k + 1)
                grads.append(np.asarray(g))
            dt = (time.perf_counter() - t0) / K
            gs = np.stack(grads)  # (K, n_params)
            var = gs.var(axis=0)
            rows.append({
                "spp": spp, "step_ms": dt * 1e3,
                "grad_var_mean": float(var.mean()),
                "grad_var_sum": float(var.sum()),
                "grad_finite": bool(np.isfinite(gs).all()),
            })
            print(json.dumps(rows[-1]), flush=True)

    r1 = next(r for r in rows if r["spp"] == 1)
    r4 = next(r for r in rows if r["spp"] == 4)
    summary = {
        "variance_reduction": r1["grad_var_sum"] / max(r4["grad_var_sum"],
                                                       1e-30),
        "cost_ratio": r4["step_ms"] / r1["step_ms"],
        "config": f"{W}x{H}, 64-prim, {B} bounces, edge_grad, K={K}",
    }
    rows.append(summary)
    print(json.dumps(summary))
    with open("benchmarks/artifacts/fused_spp_r05.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
