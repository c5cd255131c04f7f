"""Ablation: where the fwd+bwd training step's time goes, and what the
fast-gradient configurations buy.

Configs at 1080p / 64-prim / 8 bounces (the BASELINE.json north-star shape):

  central   - faithful gradient: 6-tap XLA normals, full reverse sweep
              (bench.py's fwd+bwd line; round-2 baseline 3.34 s/step)
  detached  - normals stop-gradiented, taps still execute in XLA forward:
              isolates the cost of the normal taps' REVERSE sweep
  kernel    - normals computed inside the march kernel and detached
              (kernels/march.py:make_pallas_cast_with_normal): no normal tap
              executes in XLA in either direction

Prints one JSON line per config: step_ms, rays/s, grad_finite.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from compute_path_tracer_tpu.diff import make_loss
from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

W, H, BOUNCES, N_PRIMS = 1920, 1080, 8, 64
STEPS = 2


def main():
    compiled = compile_scene(benchmark_scene(N_PRIMS))
    params = jnp.asarray(compiled.params, jnp.float32)
    target = np.zeros((H, W, 3), np.float32)

    configs = [
        {"normals": "central", "remat": True},
        {"normals": "kernel", "remat": True},
        {"normals": "kernel", "remat": False},
        {"normals": "detached", "remat": False},
        {"normals": "central", "remat": False},
    ]
    for cfg in configs:
        loss = make_loss(
            compiled.spec, target, width=W, height=H, bounces=BOUNCES,
            geometry="baked", march="pallas", **cfg,
        )
        vg = jax.jit(jax.value_and_grad(loss))
        t0 = time.perf_counter()
        _, g = vg(params)
        np.asarray(g[:2]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(STEPS):
            _, g = vg(params)
        np.asarray(g[:2]).sum()
        dt = (time.perf_counter() - t0) / STEPS
        rays = W * H * (BOUNCES + 1)
        print(json.dumps({
            "config": str(cfg),
            "step_ms": dt * 1e3,
            "rays_per_s": rays / dt,
            "compile_s": compile_s,
            "grad_finite": bool(np.isfinite(np.asarray(g)).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
