"""Quick hardware A/B harness for megakernel variants.

Usage: python benchmarks/variants.py [variant ...]
Each variant is a comma-separated kwarg list, e.g. "t_cull=True,omega=1.4".
Prints one line per variant with honest D2H-synced frame times.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT, BOUNCES = 1920, 1080, 8
N_PRIMS = 64
WARMUP, TIMED = 1, 3


def parse(v):
    kw = {}
    if not v:
        return kw
    for part in v.split(","):
        k, val = part.split("=")
        if k == "tile":
            kw[k] = tuple(int(x) for x in val.split("x"))
        elif val in ("True", "False"):
            kw[k] = val == "True"
        elif val.replace(".", "").replace("-", "").isdigit():
            kw[k] = float(val) if "." in val else int(val)
        else:
            kw[k] = val
    return kw


def main():
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    cs = compile_scene(benchmark_scene(N_PRIMS))
    variants = sys.argv[1:] or [
        "geometry=baked,t_cull=True",
        "geometry=baked,t_cull=True,omega=1.4",
    ]
    for v in variants:
        kw = parse(v)
        debug = kw.pop("debug", 0)
        bounces = kw.pop("bounces", BOUNCES)
        try:
            def run(n, accum, f0):
                for f in range(n):
                    accum = render_frame_pallas(
                        cs.spec, cs.params, accum=accum, frame=f0 + f,
                        last_clear=f0 + f, width=WIDTH, height=HEIGHT,
                        debug=debug, bounces=bounces, **kw)
                np.asarray(accum[:2, :2]).sum()
                return accum

            t0 = time.perf_counter()
            accum = run(WARMUP, None, 0)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(TIMED, accum, WARMUP)
            dt = (time.perf_counter() - t0) / TIMED
            rays = WIDTH * HEIGHT * (BOUNCES + 1) / dt
            print(f"{v:60s} {dt*1e3:8.1f} ms/frame {rays/1e6:8.1f} Mrays/s"
                  f"  (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{v:60s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
