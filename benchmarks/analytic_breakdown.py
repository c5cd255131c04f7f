"""Where do the analytic_all frame's milliseconds go? (round-6 outlook #1)

Times component-isolating variants of the 1080p/64-prim/8-bounce frame:

  full          - the shipped analytic_all frame;
  bounces=0     - primary-only (isolates the per-bounce slope);
  no_guards     - same scene with every AABB guard DISABLED (semantic
                  change: membership slab tests vanish, every shape always
                  in the map AND always intersected - separates the
                  bounds_fn + per-shape cond cost from the intersection
                  math itself);
  prim_only_1b  - bounces=0 with no guards: the bare cost of 64 closed-form
                  intersections + shading once.

Writes benchmarks/artifacts/analytic_breakdown_r05.jsonl.
"""

import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 1920, 1080


def timeit(spec, params, bounces, reps=3):
    import jax.numpy as jnp

    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas

    pv = jnp.asarray(params, jnp.float32)
    fn = lambda: render_frame_pallas(spec, pv, width=W, height=H,
                                     bounces=bounces, geometry="baked",
                                     analytic_all=True)
    np.asarray(fn()[:2, :2]).sum()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn()[:2, :2]).sum()
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    scene = benchmark_scene(64)
    cs = compile_scene(scene)

    scene_ng = benchmark_scene(64)
    for root in scene_ng.roots:
        for sh in root.children_shapes:
            sh.transform.aabb = False
    cs_ng = compile_scene(scene_ng)

    rows = []
    with tpu_lock():
        for label, c, b in (("full b8", cs, 8), ("b0", cs, 0),
                            ("no_guards b8", cs_ng, 8),
                            ("no_guards b0", cs_ng, 0)):
            try:
                ms = timeit(c.spec, c.params, b)
                rows.append({"config": label, "ms": ms})
            except Exception as e:  # noqa: BLE001
                rows.append({"config": label, "error": repr(e)[:300]})
            print(json.dumps(rows[-1]), flush=True)

    with open("benchmarks/artifacts/analytic_breakdown_r05.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
