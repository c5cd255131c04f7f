"""Over-relaxed sphere tracing: the opt-in semantic trade, measured.

ROADMAP's faithful-ceiling analysis caps the reference-exact march at
~103 Mrays/s on v5e; over-relaxation (omega > 1 stretched steps with the
sphere-overlap revert, kernels/megakernel.py:_march_while_tcull) trades the
reference's exact tap sequence for fewer steps.  This records BOTH sides of
the trade at the bench configuration: frame time AND the image delta vs the
faithful render (same RNG, 4 accumulated frames), so the mode ships as a
documented decision instead of a silent speedup.

Run: python benchmarks/overrelax_bench.py
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

W, H, BOUNCES, N_PRIMS = 1920, 1080, 8, 64
FRAMES = 4
REPS = 3


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.ops.tonemap import color_correction
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene
    from compute_path_tracer_tpu.vecmath import Vec3

    def aces_srgb(img):
        v = color_correction(Vec3(img[..., 0], img[..., 1], img[..., 2]))
        return jnp.stack([v.x, v.y, v.z], axis=-1)

    cs = compile_scene(benchmark_scene(N_PRIMS))
    pv = jnp.asarray(cs.params, jnp.float32)

    def render(omega):
        accum = None
        for f in range(FRAMES):
            accum = render_frame_pallas(
                cs.spec, pv, accum=accum, frame=f, last_clear=f,
                width=W, height=H, debug=0, bounces=BOUNCES,
                geometry="baked", t_cull=True, omega=omega,
            )
        return np.asarray(accum)

    def timed_frame(omega):
        def one():
            return render_frame_pallas(
                cs.spec, pv, width=W, height=H, debug=0, bounces=BOUNCES,
                geometry="baked", t_cull=True, omega=omega,
            )

        np.asarray(one()[:2, :2]).sum()
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = one()
        np.asarray(out[:2, :2]).sum()
        return (time.perf_counter() - t0) / REPS * 1e3

    with tpu_lock():
        base_ms = timed_frame(1.0)
        base_img = render(1.0)
        base_tm = np.asarray(aces_srgb(jnp.asarray(base_img)))
        print(json.dumps({"omega": 1.0, "frame_ms": base_ms,
                          "speedup": 1.0}), flush=True)
        for omega in (1.2, 1.4, 1.6):
            ms = timed_frame(omega)
            img = render(omega)
            tm = np.asarray(aces_srgb(jnp.asarray(img)))
            d = np.abs(tm - base_tm)
            print(json.dumps({
                "omega": omega, "frame_ms": ms, "speedup": base_ms / ms,
                "tonemapped_delta_mean": float(d.mean()),
                "tonemapped_delta_p999": float(np.quantile(d, 0.999)),
                "pixels_over_1pct": float((d.max(axis=2) > 0.01).mean()),
            }), flush=True)


if __name__ == "__main__":
    main()
