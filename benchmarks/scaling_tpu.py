"""Real-chip sharding-overhead measurement + analytic communication model.

Round 2's SCALING artifact only exercised oversubscribed virtual CPU devices
(no scaling signal).  What CAN be measured honestly on the one available
chip is the cost of the sharding MACHINERY itself: `render_frame_sharded`
and the sharded train step on a 1-device TPU mesh run the exact multi-chip
code path (shard_map, band coordinates, padding, transposes, psum over a
singleton axis) at zero communication - so (sharded - direct) isolates the
per-chip overhead a real pod would pay on top of compute.

The communication side is modeled analytically and recorded alongside: the
only cross-chip traffic in the design is the per-step parameter-gradient
psum (params are replicated; tiles never exchange halos), whose payload is
n_params * 4 bytes - microseconds against v5e's ~1.6 TB/s aggregate ICI -
so the >=90%-to-2-hosts BASELINE target hinges on the overhead measured
here, not on bandwidth.

Writes SCALING_r04.json.  Run: python benchmarks/scaling_tpu.py

Round-4 note: round 3 recorded a 6.25x sharded-FORWARD overhead here
(SCALING_r03.json).  Round 4 could not reproduce it - a dedicated bisect
(benchmarks/forward_shard_bisect.py, artifact
benchmarks/artifacts/forward_shard_bisect_r04.json) measures every layer
(plain planes call, jit wrapper, shard_map with/without axis_index, the
shipped path) within noise of the direct call.  Best explanation:
transient chip contention during the round-3 run (the same time-sharing
failure mode conftest.py documents); the code path is unchanged.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

# 1088 rows: divisible by the (64,128) kernel tile for every mesh size
# used here (the sharded path requires band_h % tile_h == 0).
W, H, BOUNCES, N_PRIMS = 1920, 1088, 8, 64
REPS = 3

# v5e ICI: 4 links/chip x ~100 GB/s/link full-duplex (public v5e specs);
# a 1-D ring psum of S bytes costs ~2S/link_bw + per-hop latency.
ICI_LINK_GBPS = 100.0
PSUM_LATENCY_US = 5.0


def _timed(fn, *args, **kw):
    def sync(o):
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:2].sum()

    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / REPS


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.parallel import (
        make_mesh, make_sharded_train_step, render_frame_sharded,
    )
    from compute_path_tracer_tpu.diff import make_loss
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    assert jax.devices()[0].platform == "tpu", jax.devices()
    cs = compile_scene(benchmark_scene(N_PRIMS))
    pv = jnp.asarray(cs.params, jnp.float32)
    n_params = int(pv.size)
    mesh = make_mesh(1)
    target = np.zeros((H, W, 3), np.float32)

    with tpu_lock():
        t_direct = _timed(
            render_frame_pallas, cs.spec, pv, width=W, height=H, debug=0,
            bounces=BOUNCES, geometry="baked", t_cull=True,
        )
        t_shard = _timed(
            render_frame_sharded, cs.spec, pv, mesh, width=W, height=H,
            debug=0, bounces=BOUNCES, geometry="baked", t_cull=True,
            interpret=False,
        )
        step = make_sharded_train_step(
            cs.spec, mesh, width=W, height=H, bounces=BOUNCES,
            march="pallas", geometry="baked", march_interpret=False,
        )
        tgt_dev = jnp.asarray(target)
        t_train_shard = _timed(step, pv, tgt_dev, jnp.int32(0))

        loss = make_loss(cs.spec, target, width=W, height=H, bounces=BOUNCES,
                         geometry="baked", march="pallas")
        vg = jax.jit(jax.value_and_grad(loss))
        t_train_direct = _timed(vg, pv)

        from compute_path_tracer_tpu.kernels.train import (
            make_fused_value_and_grad,
        )
        from compute_path_tracer_tpu.parallel import (
            make_fused_sharded_train_step,
        )

        fstep = make_fused_value_and_grad(
            cs.spec, target, width=W, height=H, bounces=BOUNCES,
        )
        t_fused_direct = _timed(fstep, pv)
        fss = make_fused_sharded_train_step(
            cs.spec, mesh, width=W, height=H, bounces=BOUNCES,
        )
        t_fused_shard = _timed(fss, pv, tgt_dev, jnp.int32(0))

    psum_bytes = n_params * 4
    t_psum_s = 2 * psum_bytes / (ICI_LINK_GBPS * 1e9) + PSUM_LATENCY_US * 1e-6
    fwd_overhead = t_shard / t_direct - 1.0
    train_overhead = t_train_shard / t_train_direct - 1.0
    fused_overhead = t_fused_shard / t_fused_direct - 1.0

    def eff(n, step_s, overhead):
        per_chip = step_s * (1 + overhead) / n + t_psum_s
        return step_s / (n * per_chip)

    out = {
        "note": (
            "1-device TPU mesh: the sharded code path (shard_map + band "
            "coords + singleton psum) vs the direct megakernel call - "
            "machinery overhead at zero communication, measured on real "
            "hardware.  Efficiency projections combine this overhead with "
            "the analytic psum model below."
        ),
        "device": str(jax.devices()[0]),
        "config": {"width": W, "height": H, "bounces": BOUNCES,
                   "n_prims": N_PRIMS, "n_params": n_params},
        "forward": {
            "direct_ms": t_direct * 1e3,
            "sharded_1dev_ms": t_shard * 1e3,
            "overhead_frac": fwd_overhead,
        },
        "train_step": {
            "direct_ms": t_train_direct * 1e3,
            "sharded_1dev_ms": t_train_shard * 1e3,
            "overhead_frac": train_overhead,
        },
        "fused_train_step": {
            "direct_ms": t_fused_direct * 1e3,
            "sharded_1dev_ms": t_fused_shard * 1e3,
            "overhead_frac": fused_overhead,
        },
        "comm_model": {
            "psum_payload_bytes": psum_bytes,
            "ici_link_gbps_assumed": ICI_LINK_GBPS,
            "psum_latency_us_assumed": PSUM_LATENCY_US,
            "psum_time_us_est": t_psum_s * 1e6,
        },
        "projected_efficiency": {
            f"n={n}": {
                "forward": eff(n, t_direct, fwd_overhead),
                "train": eff(n, t_train_direct, train_overhead),
                "fused_train": eff(n, t_fused_direct, fused_overhead),
            }
            for n in (2, 4, 8)
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
