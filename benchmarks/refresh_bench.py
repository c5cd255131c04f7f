"""A/B the activation-refresh march (refresh_every=K) + tile re-sweep.

Round-3 verdict item #5: the last faithful lever on the forward headline is
the 0.97 -> 1.56 Tflop/s scheduling gap, and the one untried cheap idea is
refreshing the per-step activation machinery (t-front reductions, predicate
chains, pending fold) every K steps with the frozen pending clamp keeping
safety (megakernel.py:_march_while_tcull refresh_every contract).  Measures
frame time at the bench config for K in {1, 2, 4, 8} and re-sweeps tile
shapes under the leanest K; also records the full-frame image divergence vs
K=1 on the benchmark scene.

Writes benchmarks/artifacts/refresh_r04.jsonl.
Run: python benchmarks/refresh_bench.py
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
REPS = 3


def _timed(fn):
    out = fn()
    np.asarray(out[:2, :2]).sum()
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    np.asarray(out[:2, :2]).sum()
    return (time.perf_counter() - t0) / REPS, out


def main():
    from compute_path_tracer_tpu.app.tpulock import tpu_lock
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    assert jax.devices()[0].platform == "tpu", jax.devices()
    cs = compile_scene(benchmark_scene(N_PRIMS))
    pv = jnp.asarray(cs.params, jnp.float32)
    rows = []

    def frame(k, tile):
        return render_frame_pallas(
            cs.spec, pv, width=W, height=H, debug=0, bounces=BOUNCES,
            geometry="baked", t_cull=True, refresh_every=k, tile=tile,
        )

    with tpu_lock():
        base_t, base_img = _timed(lambda: frame(1, (64, 128)))
        base = np.asarray(base_img)
        rows.append({"k": 1, "tile": [64, 128], "ms": base_t * 1e3,
                     "speedup": 1.0})
        print(json.dumps(rows[-1]), flush=True)
        best_k, best_t = 1, base_t
        for k in (2, 4, 8):
            t, img = _timed(lambda k=k: frame(k, (64, 128)))
            diff = np.abs(np.asarray(img) - base).max(-1)
            rows.append({
                "k": k, "tile": [64, 128], "ms": t * 1e3,
                "speedup": base_t / t,
                "frac_pixels_gt_1e3": float((diff > 1e-3).mean()),
            })
            print(json.dumps(rows[-1]), flush=True)
            if t < best_t:
                best_k, best_t = k, t
        for tile in ((32, 128), (128, 128), (64, 256)):
            try:
                t, _ = _timed(lambda tile=tile: frame(best_k, tile))
                rows.append({"k": best_k, "tile": list(tile), "ms": t * 1e3,
                             "speedup": base_t / t})
            except Exception as e:
                rows.append({"k": best_k, "tile": list(tile),
                             "error": f"{type(e).__name__}: {e}"[:200]})
            print(json.dumps(rows[-1]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "refresh_r04.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
