"""Secondary-bounce visibility gradients: measuring what the primary-edge
estimator does NOT capture.

Adversarial scene: the camera sees only a diffuse wall; an emissive sphere
and an occluding cube sit OUTSIDE the camera frustum, so the only light is
one diffuse bounce wall -> emitter, partially blocked by the occluder.
Moving the occluder sweeps a SECONDARY silhouette (the emitter's visibility
edge as seen from wall points); its primary silhouette never enters the
image, so:

* smooth autodiff and the primary-edge estimator (diff/vjp.py edge_grad)
  should both report ~zero gradient w.r.t. the occluder position;
* the finite difference of a many-sample (spp-averaged, common random
  numbers) loss reports the TRUE effect.

Prints one JSON line per quantity, plus the same measurement for a PRIMARY
silhouette (the wall's own edge) as the scale anchor - the ROADMAP claim
"secondary visibility terms are an order smaller than primary silhouettes in
this shading model" becomes a recorded ratio instead of an adjective.

Run on CPU: JAX_PLATFORMS=cpu python benchmarks/secondary_edge.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _scene():
    from compute_path_tracer_tpu.scene import (
        KIND_CUBE, KIND_SPHERE, Scene, Shape, Union,
    )

    root = Union(name="Root")
    wall = root.add_shape(Shape(KIND_CUBE, name="Wall"))
    wall.size3.set(1.5, 1.5, 0.05)
    wall.transform.position.set(0.0, 0.0, 1.5)
    wall.material.color.set(0.7, 0.7, 0.7)

    # The bench renders with fov=3 (narrow frustum, half-angle ~18 deg), so
    # both the emitter and the occluder below sit far outside the image -
    # nothing of either silhouette ever reaches a primary ray.
    emit = root.add_shape(Shape(KIND_SPHERE, name="Emitter"))
    emit.size.set(1.0)
    emit.transform.position.set(-3.5, 0.0, 0.3)
    emit.material.color.set(0.0, 0.0, 0.0)
    emit.material.brightness.set(40.0)
    emit.material.light_col.set(1.0, 1.0, 1.0)

    # Occluder between wall and emitter, off-center in +y so its shadow
    # boundary cuts the emitter's visibility from the wall roughly in half:
    # moving it in y sweeps the SECONDARY silhouette.
    occ = root.add_shape(Shape(KIND_CUBE, name="Occluder"))
    occ.size3.set(0.05, 0.75, 1.5)
    occ.transform.position.set(-2.0, 0.75, 0.75)
    occ.material.color.set(0.02, 0.02, 0.02)
    return Scene([root])


def main():
    import jax
    import jax.numpy as jnp

    from compute_path_tracer_tpu.diff import make_loss, render_image_diff
    from compute_path_tracer_tpu.scene import compile_scene

    W = H = 48
    SPP = 16
    BOUNCES = 1
    FOV = 3.0

    cs = compile_scene(_scene())
    pv = jnp.asarray(cs.params, jnp.float32)
    shapes = cs.spec.roots[0].children_shapes
    slot_occ_y = shapes[2].transform.pos[1]  # occluder vertical position
    slot_wall_x = shapes[0].transform.pos[0]  # wall x: a primary silhouette

    target = render_image_diff(cs.spec, pv, width=W, height=H,
                               bounces=BOUNCES, spp=SPP, fov=FOV) * 0.0
    loss_spp = make_loss(cs.spec, np.asarray(target), width=W, height=H,
                         bounces=BOUNCES, spp=SPP, fov=FOV, edge_grad=False)
    loss_edge = make_loss(cs.spec, np.asarray(target), width=W, height=H,
                          bounces=BOUNCES, spp=SPP, fov=FOV, edge_grad=True)
    loss_sec = make_loss(cs.spec, np.asarray(target), width=W, height=H,
                         bounces=BOUNCES, spp=SPP, fov=FOV, edge_grad=True,
                         edge_secondary=True)

    def fd(slot, eps):
        dp = np.zeros_like(np.asarray(pv))
        dp[slot] = eps
        return (float(loss_spp(pv + jnp.asarray(dp)))
                - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * eps)

    g_smooth = jax.grad(loss_spp)(pv)
    g_edge = jax.grad(loss_edge)(pv)
    g_sec = jax.grad(loss_sec)(pv)

    rows = [
        ("secondary: occluder y", slot_occ_y, 0.1),
        ("primary: wall x", slot_wall_x, 0.05),
    ]
    base = float(loss_spp(pv))
    for name, slot, eps in rows:
        print(json.dumps({
            "edge": name,
            "grad_fd_spp": fd(slot, eps),
            "grad_smooth_autodiff": float(g_smooth[slot]),
            "grad_edge_estimator": float(g_edge[slot]),
            "grad_edge_secondary_estimator": float(g_sec[slot]),
            "loss": base, "spp": SPP,
        }), flush=True)


if __name__ == "__main__":
    main()
