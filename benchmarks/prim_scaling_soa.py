"""Prim-count scaling of the SoA analytic renderer (round 5).

The round-5 prim-scaling probe (prim_scaling_r05.jsonl) measured the
trace-unrolled kernels' real scaling limit: the 256-prim faithful forward
compiles for tens of minutes, the 256-prim fused kernel fails to
Mosaic-compile, and 512-prim configs never finished the probe budget.
render/soa.py bounds compile time with a chunked-scan shape fold; this
probe measures, on the real chip, its (a) trace+compile wall time and
(b) steady-state frame time at 64/128/256/512 prims, next to the
unrolled analytic_all kernel where that is still tractable.

Writes benchmarks/artifacts/prim_scaling_soa_r05.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, BOUNCES = 1920, 1080, 8


def _time_steady(fn, n=3):
    # A 2x2-slice D2H read forces completion without timing a full-frame
    # transfer over the axon tunnel (same methodology as bench.py rows;
    # a full np.asarray(frame) adds ~200 ms/frame of pure readback and
    # was what the first artifact revision measured).
    np.asarray(fn()[:2, :2]).sum()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out[:2, :2]).sum()
    return (time.perf_counter() - t0) / n


def main():
    from compute_path_tracer_tpu.kernels.megakernel import render_frame_pallas
    from compute_path_tracer_tpu.render.soa import render_frame_soa
    from compute_path_tracer_tpu.scene.compile import compile_scene
    from compute_path_tracer_tpu.scene.library import benchmark_scene

    rays = W * H * (BOUNCES + 1)
    rows = []
    for n in (64, 128, 256, 512):
        cs = compile_scene(benchmark_scene(n))
        # Pallas SoA kernel (kernels/megakernel.py analytic_soa): the
        # packed tables walked by an in-kernel fori_loop, VMEM-resident.
        t0 = time.perf_counter()
        first_k = render_frame_pallas(cs.spec, cs.params, width=W,
                                      height=H, bounces=BOUNCES,
                                      geometry="baked", analytic_soa=True)
        np.asarray(first_k[:2, :2]).sum()
        kcompile_s = time.perf_counter() - t0
        kms = _time_steady(lambda: render_frame_pallas(
            cs.spec, cs.params, width=W, height=H, bounces=BOUNCES,
            geometry="baked", analytic_soa=True)) * 1e3
        row = {
            "n_prims": n,
            "pallas_soa_compile_s": round(kcompile_s, 1),
            "pallas_soa_ms": round(kms, 2),
            "pallas_soa_mrays": round(rays / kms / 1e3, 1),
            "finite": bool(np.isfinite(np.asarray(first_k)).all()),  # one full read, outside timing
        }
        # XLA SoA fallback lane (render/soa.py): bandwidth-bound, kept as
        # the no-Mosaic path.
        t0 = time.perf_counter()
        first = render_frame_soa(cs.spec, cs.params, width=W, height=H,
                                 bounces=BOUNCES, fov=1.0)
        np.asarray(first[:2, :2]).sum()
        row["xla_soa_compile_s"] = round(time.perf_counter() - t0, 1)
        ms = _time_steady(lambda: render_frame_soa(
            cs.spec, cs.params, width=W, height=H, bounces=BOUNCES,
            fov=1.0)) * 1e3
        row["xla_soa_ms"] = round(ms, 2)
        row["xla_soa_mrays"] = round(rays / ms / 1e3, 1)
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

    rows.append({"note": (
        "Two SoA lanes, both compile-bounded in n (one trace; the "
        "unrolled kernels grew superlinearly and died at 256, "
        "prim_scaling_r05.jsonl). The Pallas analytic_soa kernel walks "
        "the packed SMEM tables with an in-kernel fori_loop (U=8 inner "
        "unroll + per-trip tile-uniform skip): 413 Mrays/s at 64 prims "
        "(65% of the 631 M unrolled headline), and it MATCHES the "
        "unrolled analytic_all runtime at 128/256 prims (190/82.7 M vs "
        "prim_scaling_r05's 171/81 M) while compiling in 42/85 s where "
        "the unrolled 256 took tens of minutes; 512 prims = 37.3 M, a "
        "count no unrolled kernel ever compiled. Runtime ~doubles per "
        "prim doubling (the per-trip skip recovers some sublinearity "
        "on sparse tiles). The XLA render_frame_soa lane pays HBM for "
        "every (chunk, lanes) intermediate (~2 orders slower) and is "
        "kept as the no-Mosaic/CPU fallback and differentiable stopgap."
    )})
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "prim_scaling_soa_r05.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
