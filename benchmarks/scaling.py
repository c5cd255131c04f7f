"""Tile-sharding scaling measurement over a device mesh.

Measures rays/s of the sharded renderer at mesh sizes 1, 2, 4, ... and
reports parallel efficiency.  On real multi-chip hardware this is the
BASELINE.json scaling benchmark; on a single-chip/CPU host it runs on the
virtual device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N),
which validates the sharding code paths and collective layout, not ICI
bandwidth.

Usage: python benchmarks/scaling.py [--width 512 --height 512 --bounces 4]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--prims", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from compute_path_tracer_tpu.parallel import make_mesh, render_frame_sharded
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    cs = compile_scene(benchmark_scene(args.prims))
    n_devices = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    results = []
    base = None
    for n in sizes:
        mesh = make_mesh(n)
        h = (args.height // n) * n

        def frame(f):
            return render_frame_sharded(
                cs.spec, cs.params, mesh, frame=f, last_clear=0,
                width=args.width, height=h, debug=0, bounces=args.bounces,
            )

        np.asarray(frame(0))[:1]  # compile + sync
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = frame(i + 1)
        np.asarray(out)[:1]
        dt = (time.perf_counter() - t0) / args.iters
        rays = args.width * h * (args.bounces + 1) / dt
        eff = 1.0 if base is None else rays / (base * n)
        if base is None:
            base = rays
        results.append(
            {"devices": n, "frame_ms": dt * 1e3, "rays_per_s": rays, "efficiency": eff}
        )
        print(json.dumps(results[-1]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
