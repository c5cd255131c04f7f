"""Keep-or-kill benchmark for the opt-in march variants.

Round 2 measured `p_cull`, `clusters` and `cond_group` SLOWER on the dense
64-prim benchmark scene but kept them opt-in "for sparse scenes" without a
sparse-scene measurement.  Round 3 supplied it (artifact optin_r03.jsonl):
every variant ALSO lost on the sparse scene (p_cull -1.8% noise, clusters
+25%, cond_group +3.6%), so per the decision rule (a variant earns its flag
by beating t_cull by >10% on either scene) all three were PRUNED from the
megakernel, along with `sub_rows` subtiling and the frozen wavefront
backend (quarantined to benchmarks/frozen_wavefront.py).

The benchmark itself remains as the dense/sparse A/B harness for any future
variant; today's variant set is the default march vs the over-relaxation
semantic trade.

Run: python benchmarks/optin_benchmark.py
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

W, H, BOUNCES = 1920, 1080, 8
REPS = 3


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    scenes = {
        "dense (spacing 1.6)": compile_scene(benchmark_scene(64)),
        "sparse (spacing 6.4)": compile_scene(benchmark_scene(64, spacing=6.4)),
    }
    variants = [
        ("t_cull (default)", dict(t_cull=True)),
        ("omega=1.4 (semantic trade)", dict(t_cull=True, omega=1.4)),
    ]

    with tpu_lock():
        for sname, cs in scenes.items():
            pv = jnp.asarray(cs.params, jnp.float32)
            base_ms = None
            for vname, kw in variants:
                try:
                    def run():
                        return render_frame_pallas(
                            cs.spec, pv, width=W, height=H, debug=0,
                            bounces=BOUNCES, geometry="baked", **kw,
                        )

                    np.asarray(run()[:2, :2]).sum()
                    t0 = time.perf_counter()
                    for _ in range(REPS):
                        out = run()
                    np.asarray(out[:2, :2]).sum()
                    ms = (time.perf_counter() - t0) / REPS * 1e3
                    if vname.startswith("t_cull (default)"):
                        base_ms = ms
                    print(json.dumps({
                        "scene": sname, "variant": vname, "frame_ms": ms,
                        "vs_default": (ms / base_ms) if base_ms else None,
                    }), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "scene": sname, "variant": vname,
                        "error": f"{type(e).__name__}: {e}"[:200],
                    }), flush=True)


if __name__ == "__main__":
    main()
