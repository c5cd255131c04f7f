"""Edge-gradient calibration: estimator magnitude vs the ground truth.

The soft-coverage silhouette estimator (diff/vjp.py, ``edge_grad=True``)
models the derivative of the EXPECTED (AA-jitter-averaged) loss.  The ground
truth is therefore the finite difference of a many-sample loss: FD over a
position step on a loss averaged across ``spp`` independent RNG frames -
the same quantity the estimator's sigmoid-coverage model approximates.

Sweeps the target offset and ``edge_beta`` on the flat-lit-sphere scene
(tests/test_edge.py's fixture: radiance is piecewise-constant, so ALL
positional signal is the silhouette) and prints one JSON line per cell with
``ratio = grad_estimator / grad_fd``.  Feeds the calibrated band asserted in
tests/test_edge.py::test_edge_grad_calibrated_magnitude.

Run on CPU: JAX_PLATFORMS=cpu python benchmarks/edge_calibration.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from compute_path_tracer_tpu.diff import make_loss, render_image_diff
    from compute_path_tracer_tpu.scene import (
        KIND_SPHERE, Scene, Shape, Union, compile_scene,
    )

    W = H = 64
    SPP = 16

    root = Union(name="Root")
    ball = root.add_shape(Shape(KIND_SPHERE, name="Ball"))
    ball.size.set(0.8)
    ball.material.color.set(0.0, 0.0, 0.0)
    ball.material.brightness.set(2.0)
    ball.material.light_col.set(1.0, 1.0, 1.0)
    cs = compile_scene(Scene([root]))
    slot = cs.spec.roots[0].children_shapes[0].transform.pos[0]
    pv = jnp.asarray(cs.params, jnp.float32)

    def shifted_target(dx):
        p = np.asarray(cs.params, np.float32).copy()
        p[slot] += dx
        return render_image_diff(cs.spec, jnp.asarray(p), width=W, height=H,
                                 bounces=0, spp=SPP)

    for offset in (0.1, 0.2, 0.3):
        target = shifted_target(offset)
        # Ground truth: centered FD of the spp-averaged loss.  eps must move
        # the silhouette by ~a pixel for the jitter average to resolve it:
        # one pixel subtends ~2/(H*fov) in NDC at unit depth.
        loss_spp = make_loss(cs.spec, target, width=W, height=H, bounces=0,
                             spp=SPP, edge_grad=False)
        eps = 0.05
        dp = np.zeros_like(np.asarray(pv))
        dp[slot] = eps
        fd = (float(loss_spp(pv + jnp.asarray(dp)))
              - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * eps)
        for beta in (0.5, 1.0, 1.5, 2.0, 3.0):
            loss_e = make_loss(cs.spec, target, width=W, height=H, bounces=0,
                               spp=SPP, edge_grad=True, edge_beta=beta)
            g = float(jax.grad(loss_e)(pv)[slot])
            print(json.dumps({
                "offset": offset, "edge_beta": beta, "spp": SPP,
                "grad_estimator": g, "grad_fd": fd,
                "ratio": g / fd if fd else float("nan"),
            }), flush=True)


if __name__ == "__main__":
    main()
