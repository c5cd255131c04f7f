"""Tile-sharding scaling measurement over a device mesh.

Measures rays/s of the sharded renderer at mesh sizes 1, 2, 4, ... and
reports parallel efficiency.  On real multi-chip hardware this is the
BASELINE.json scaling benchmark; on a single-chip/CPU host it runs on the
virtual device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N),
which validates the sharding code paths and collective layout, not ICI
bandwidth.

The sharded layer distributes the Pallas MEGAKERNEL (each shard renders its
row band with the same whole-screen-dispatch kernel the single-chip bench
uses); ``--backend oracle`` falls back to the jnp reference path.

Usage: python benchmarks/scaling.py [--width 512 --height 512 --bounces 4]
       [--backend pallas|oracle] [--out SCALING.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--prims", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="pallas", choices=("pallas", "oracle"))
    ap.add_argument("--out", default=None, help="write results to this JSON file")
    args = ap.parse_args()

    import jax

    # The environment's startup hooks may rewrite jax_platforms to prefer the
    # TPU plugin even when JAX_PLATFORMS=cpu asks for the virtual CPU mesh.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from compute_path_tracer_tpu.parallel import make_mesh, render_frame_sharded
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    on_tpu = jax.devices()[0].platform == "tpu"
    cs = compile_scene(benchmark_scene(args.prims))
    n_devices = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    kw = {}
    if args.backend == "pallas":
        # The single-chip bench configuration (bench.py), sharded.
        kw = dict(backend="pallas", geometry="baked", t_cull=True,
                  interpret=not on_tpu)
    else:
        kw = dict(backend="oracle")
    results = []
    base = None
    for n in sizes:
        mesh = make_mesh(n)
        h = (args.height // n) * n

        def frame(f):
            return render_frame_sharded(
                cs.spec, cs.params, mesh, frame=f, last_clear=0,
                width=args.width, height=h, debug=0, bounces=args.bounces,
                **kw,
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
            {"devices": n, "frame_ms": dt * 1e3, "rays_per_s": rays,
             "efficiency": eff, "backend": args.backend,
             "platform": jax.devices()[0].platform}
        )
        print(json.dumps(results[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {
                    "config": vars(args),
                    "note": (
                        "virtual CPU mesh validates sharding code paths, "
                        "not ICI bandwidth" if not on_tpu else "real TPU"
                    ),
                    "results": results,
                },
                f, indent=1,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
