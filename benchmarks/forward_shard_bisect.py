"""Bisect the sharded-FORWARD overhead (round-3 verdict weak #1).

SCALING_r03.json measured render_frame_sharded on a 1-device TPU mesh at
3830 ms vs 528 ms direct (6.25x) while the train and fused paths show ~0%
shard_map overhead - so something specific to parallel/mesh.py's
run_pallas band path is pathological.  This script isolates the layers:

  direct          render_frame_pallas (the 528 ms baseline)
  planes          _pallas_frame_planes alone under plain jit (no wrapper)
  jit_wrap        plain jit of the EXACT run_pallas body (transpose + pad +
                  kernel + crop/transpose) with y0 = 0 - shard_map removed
  shard_noidx     shard_map region, y0 = 0 constant (axis_index removed)
  shard_full      the shipped render_frame_sharded path

Whichever step introduces the jump is the culprit.  Writes one JSON line
per variant.  Run: python benchmarks/forward_shard_bisect.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

W, H, BOUNCES, N_PRIMS = 1920, 1088, 8, 64
REPS = 3
TH, TW = 64, 128


def _timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:2].sum()
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:2].sum()
    return (time.perf_counter() - t0) / REPS


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.kernels.megakernel import (
        _pad_to, _pallas_frame_planes,
    )
    from compute_path_tracer_tpu.parallel import make_mesh, render_frame_sharded

    assert jax.devices()[0].platform == "tpu", jax.devices()
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    cs = compile_scene(benchmark_scene(N_PRIMS))
    pv = jnp.asarray(cs.params, jnp.float32)
    spec = cs.spec
    mesh = make_mesh(1)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    planes0 = jnp.zeros((3, H, W), jnp.float32)

    results = {}

    def report(name, t):
        results[name] = t * 1e3
        print(json.dumps({"variant": name, "ms": t * 1e3}), flush=True)

    kw = dict(width=W, height=H, debug=0, tile_h=TH, tile_w=TW,
              geometry="baked", t_cull=True, interpret=False)

    with tpu_lock():
        t = _timed(lambda: render_frame_pallas(
            spec, pv, width=W, height=H, debug=0, bounces=BOUNCES,
            geometry="baked", t_cull=True))
        report("direct", t)

        planes_fn = jax.jit(lambda p, pl: _pallas_frame_planes(
            spec, p, pl, 0, 0, BOUNCES, jnp.float32(3.0),
            jnp.float32(W / H), 0, **kw))
        t = _timed(planes_fn, pv, planes0)
        report("planes", t)

        @jax.jit
        def jit_wrap(params, accum_band, frame, last_clear, bounces, fov,
                     aspect):
            planes = _pad_to(jnp.transpose(accum_band, (2, 0, 1)), TH, TW)
            out = _pallas_frame_planes(
                spec, params, planes, frame, last_clear, bounces, fov,
                aspect, 0, **kw)
            return jnp.transpose(out[:, :H, :W], (1, 2, 0))

        args = (pv, accum, jnp.int32(0), jnp.int32(0), jnp.int32(BOUNCES),
                jnp.float32(3.0), jnp.float32(W / H))
        t = _timed(jit_wrap, *args)
        report("jit_wrap", t)

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("tiles"), P(), P(), P(), P(), P()),
                 out_specs=P("tiles"), check_vma=False)
        def shard_noidx(params, accum_band, frame, last_clear, bounces, fov,
                        aspect):
            planes = _pad_to(jnp.transpose(accum_band, (2, 0, 1)), TH, TW)
            out = _pallas_frame_planes(
                spec, params, planes, frame, last_clear, bounces, fov,
                aspect, 0, **kw)
            return jnp.transpose(out[:, :H, :W], (1, 2, 0))

        t = _timed(shard_noidx, *args)
        report("shard_noidx", t)

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("tiles"), P(), P(), P(), P(), P()),
                 out_specs=P("tiles"), check_vma=False)
        def shard_axidx(params, accum_band, frame, last_clear, bounces, fov,
                        aspect):
            y0 = lax.axis_index("tiles") * H
            planes = _pad_to(jnp.transpose(accum_band, (2, 0, 1)), TH, TW)
            out = _pallas_frame_planes(
                spec, params, planes, frame, last_clear, bounces, fov,
                aspect, y0, **kw)
            return jnp.transpose(out[:, :H, :W], (1, 2, 0))

        t = _timed(shard_axidx, *args)
        report("shard_axidx", t)

        t = _timed(lambda: render_frame_sharded(
            spec, pv, mesh, width=W, height=H, debug=0, bounces=BOUNCES,
            geometry="baked", t_cull=True, interpret=False))
        report("shard_full", t)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "forward_shard_bisect_r04.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
