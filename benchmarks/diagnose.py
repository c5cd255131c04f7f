"""March diagnostics: where do the megakernel's cycles go?

Renders the benchmark scene with debug=4 (tile-uniform stats: total march
steps, summed active-shape counts, mean exit bounce) for a range of bounce
budgets, and prints per-tile distributions.  Informs culling work: cost of a
tile ~ sum over steps of the tile-active shape count.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 1920, 1080
TILE = (64, 128)
N_PRIMS = 64


def main():
    from compute_path_tracer_tpu.kernels import render_frame_pallas
    from compute_path_tracer_tpu.scene import benchmark_scene, compile_scene

    cs = compile_scene(benchmark_scene(N_PRIMS))
    prev = None
    for bounces in (0, 1, 2, 4, 8):
        img = np.asarray(
            render_frame_pallas(
                cs.spec, cs.params, width=WIDTH, height=HEIGHT, debug=4,
                bounces=bounces, frame=1, last_clear=1,
                geometry="baked", t_cull=True, tile=TILE,
            )
        )
        tiles = img[:: TILE[0], :: TILE[1], :]
        steps = tiles[..., 0].ravel()
        acts = tiles[..., 1].ravel()
        aux = tiles[..., 2].ravel()
        per_step = np.where(steps > 0, acts / np.maximum(steps, 1), 0.0)
        print(
            f"bounces={bounces}: steps/tile mean={steps.mean():6.1f} "
            f"p90={np.percentile(steps, 90):6.1f} max={steps.max():6.1f} | "
            f"act/step mean={per_step.mean():5.1f} "
            f"p90={np.percentile(per_step, 90):5.1f} | "
            f"march work={acts.mean():7.0f} aux work={aux.mean():7.0f}",
            flush=True,
        )
        if prev is not None:
            d = acts.mean() + aux.mean() - prev
            print(f"    marginal work for added bounces: {d:8.0f}")
        prev = acts.mean() + aux.mean()


if __name__ == "__main__":
    main()
