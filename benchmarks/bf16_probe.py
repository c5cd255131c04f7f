"""Hardware probe: does bf16 map arithmetic buy the march anything?

The round-3/4 rejection of bf16 was analysis-only ("the v5e VPU executes
bf16 elementwise at the f32 rate; bf16 eps puts hits in a 0.04 shell") -
the round-4 verdict asked for a measured number either way.  This probe
marches a synthetic 12-sphere union map in a standalone Pallas kernel:

  A. f32 map, f32 accumulation (the production configuration);
  B. bf16 map arithmetic (distances, min-folds), f32 t-accumulation and
     f32 hit test - the only mixed layout that could plausibly win;
  C. bf16 end-to-end (bf16 t as well) - the upper bound of any packing
     gain, regardless of accuracy.

Reports per-variant march time over a (256, 128) ray tile x 64 steps and
the landing-t error of B/C vs A.  Writes
benchmarks/artifacts/bf16_probe_r05.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 128
STEPS = 64
N_SPH = 12
REPS = 64  # marches per kernel launch


def make_kernel(dtype):
    def kernel(ro_ref, rd_ref, sph_ref, out_ref):
        rox, roy, roz = ro_ref[0], ro_ref[1], ro_ref[2]
        rdx, rdy, rdz = rd_ref[0], rd_ref[1], rd_ref[2]

        def map_d(px, py, pz):
            px = px.astype(dtype)
            py = py.astype(dtype)
            pz = pz.astype(dtype)
            d = jnp.full(px.shape, jnp.asarray(100.0, dtype), dtype)
            for s in range(N_SPH):
                dx = px - sph_ref[s, 0].astype(dtype)
                dy = py - sph_ref[s, 1].astype(dtype)
                dz = pz - sph_ref[s, 2].astype(dtype)
                ds = jnp.sqrt(dx * dx + dy * dy + dz * dz) \
                    - sph_ref[s, 3].astype(dtype)
                d = jnp.minimum(d, ds)
            return d

        acc = jnp.zeros((H, W), jnp.float32)
        for r in range(REPS):
            t = jnp.zeros((H, W), jnp.float32) + 0.01 * r

            def body(_i, t):
                d = map_d(rox + rdx * t, roy + rdy * t, roz + rdz * t)
                step = jnp.abs(d).astype(jnp.float32)
                # f32 accumulation + hit clamp (march semantics: stop by
                # not advancing once converged)
                return t + jnp.where(step < 1e-3, 0.0, step)

            t = lax.fori_loop(0, STEPS, body, t)
            acc = acc + t
        out_ref[:] = acc / REPS

    return kernel


def make_kernel_bf16_t():
    def kernel(ro_ref, rd_ref, sph_ref, out_ref):
        bf = jnp.bfloat16
        rox = ro_ref[0].astype(bf)
        roy = ro_ref[1].astype(bf)
        roz = ro_ref[2].astype(bf)
        rdx = rd_ref[0].astype(bf)
        rdy = rd_ref[1].astype(bf)
        rdz = rd_ref[2].astype(bf)

        acc = jnp.zeros((H, W), jnp.float32)
        for r in range(REPS):
            t = jnp.zeros((H, W), bf) + jnp.asarray(0.01 * r, bf)

            def body(_i, t):
                px = rox + rdx * t
                py = roy + rdy * t
                pz = roz + rdz * t
                d = jnp.full(px.shape, jnp.asarray(100.0, bf), bf)
                for s in range(N_SPH):
                    dx = px - sph_ref[s, 0].astype(bf)
                    dy = py - sph_ref[s, 1].astype(bf)
                    dz = pz - sph_ref[s, 2].astype(bf)
                    ds = jnp.sqrt(dx * dx + dy * dy + dz * dz) \
                        - sph_ref[s, 3].astype(bf)
                    d = jnp.minimum(d, ds)
                step = jnp.abs(d)
                return t + jnp.where(step < jnp.asarray(1e-3, bf),
                                     jnp.asarray(0.0, bf), step)

            t = lax.fori_loop(0, STEPS, body, t)
            acc = acc + t.astype(jnp.float32)
        out_ref[:] = acc / REPS

    return kernel


def run(kernel, ro, rd, sph):
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = jax.jit(lambda a, b, c: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[vm, vm, vm],
        out_specs=vm,
    )(a, b, c))
    out = fn(ro, rd, sph)
    np.asarray(out[:2, :2]).sum()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(ro, rd, sph)
        np.asarray(out[:2, :2]).sum()
        ts.append(time.perf_counter() - t0)
    return min(ts), np.asarray(out)


def main():
    r = np.random.default_rng(0)
    ro = jnp.asarray(np.broadcast_to(
        np.array([0.0, 0.0, -3.0], np.float32).reshape(3, 1, 1), (3, H, W)))
    d = r.normal(size=(3, H, W)).astype(np.float32)
    d[2] = np.abs(d[2]) + 0.5
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    rd = jnp.asarray(d)
    sph = np.zeros((N_SPH, 4), np.float32)
    sph[:, :3] = r.uniform(-4, 4, (N_SPH, 3))
    sph[:, 2] += 4.0
    sph[:, 3] = r.uniform(0.4, 1.0, N_SPH)
    sph = jnp.asarray(sph)

    t_f32, out_f32 = run(make_kernel(jnp.float32), ro, rd, sph)
    rows = [{"variant": "f32 map, f32 t", "s": t_f32}]
    try:
        t_b, out_b = run(make_kernel(jnp.bfloat16), ro, rd, sph)
        err = np.abs(out_b - out_f32)
        rows.append({"variant": "bf16 map, f32 t", "s": t_b,
                     "speedup_vs_f32": t_f32 / t_b,
                     "landing_t_err_p50": float(np.percentile(err, 50)),
                     "landing_t_err_p99": float(np.percentile(err, 99)),
                     "landing_t_err_max": float(err.max())})
    except Exception as e:  # noqa: BLE001
        rows.append({"variant": "bf16 map, f32 t", "error": repr(e)[:300]})
    try:
        t_bb, out_bb = run(make_kernel_bf16_t(), ro, rd, sph)
        err = np.abs(out_bb - out_f32)
        rows.append({"variant": "bf16 end-to-end", "s": t_bb,
                     "speedup_vs_f32": t_f32 / t_bb,
                     "landing_t_err_p50": float(np.percentile(err, 50)),
                     "landing_t_err_p99": float(np.percentile(err, 99)),
                     "landing_t_err_max": float(err.max())})
    except Exception as e:  # noqa: BLE001
        rows.append({"variant": "bf16 end-to-end", "error": repr(e)[:300]})

    with open("benchmarks/artifacts/bf16_probe_r05.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
