"""Hardware A/B of the baked distance-grid march (round-5 lever #1).

Times the full 1920x1080 8-bounce 64-prim frame: faithful t_cull baseline
vs dist_grid at several resolutions/taus, plus the analytic_unboxed
composition.  Writes benchmarks/artifacts/distgrid_r05.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas
from compute_path_tracer_tpu.scene.compile import compile_scene
from compute_path_tracer_tpu.scene.library import benchmark_scene

W, H, BOUNCES = 1920, 1080, 8


def time_frame(spec, params, reps=5, **kw):
    fn = lambda: render_frame_pallas(
        spec, params, width=W, height=H, bounces=BOUNCES,
        geometry="baked", t_cull=True, **kw)
    img = fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        img = fn()
    img.block_until_ready()
    ms = (time.perf_counter() - t0) / reps * 1e3
    return ms, np.asarray(img)


def main():
    cs = compile_scene(benchmark_scene(64))
    spec, params = cs.spec, cs.params
    rows = []
    rays = W * H * (BOUNCES + 1)

    base_ms, base_img = time_frame(spec, params)
    rows.append({"config": "faithful t_cull", "ms": base_ms,
                 "mrays": rays / base_ms / 1e3})

    for res, tau_mult in [((8, 8, 8), 4.0), ((16, 16, 16), 4.0),
                          ((16, 16, 16), 16.0), ((24, 24, 24), 4.0),
                          ((32, 32, 32), 4.0)]:
        from compute_path_tracer_tpu.constants import MHD
        try:
            ms, img = time_frame(spec, params, dist_grid=True, grid_res=res,
                                 grid_tau=tau_mult * MHD)
            diff = np.abs(img - base_img).max(axis=-1)
            rows.append({
                "config": f"dist_grid res={res} tau={tau_mult}*MHD",
                "ms": ms, "mrays": rays / ms / 1e3,
                "speedup": base_ms / ms,
                "pix_gt_1e2": float((diff > 1e-2).mean()),
            })
        except Exception as e:  # noqa: BLE001
            rows.append({"config": f"dist_grid res={res}", "error": repr(e)[:400]})
        print(json.dumps(rows[-1]))

    # composition with analytic_unboxed
    try:
        an_ms, an_img = time_frame(spec, params, analytic_unboxed=True)
        rows.append({"config": "analytic_unboxed", "ms": an_ms,
                     "mrays": rays / an_ms / 1e3})
        print(json.dumps(rows[-1]))
        ms, img = time_frame(spec, params, dist_grid=True,
                             analytic_unboxed=True)
        diff = np.abs(img - an_img).max(axis=-1)
        rows.append({"config": "dist_grid+analytic res=16", "ms": ms,
                     "mrays": rays / ms / 1e3, "speedup_vs_analytic": an_ms / ms,
                     "pix_gt_1e2_vs_analytic": float((diff > 1e-2).mean())})
    except Exception as e:  # noqa: BLE001
        rows.append({"config": "dist_grid+analytic", "error": repr(e)[:400]})
    print(json.dumps(rows[-1]))

    with open("benchmarks/artifacts/distgrid_r05.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("baseline:", json.dumps(rows[0]))


if __name__ == "__main__":
    main()
