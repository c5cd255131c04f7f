"""PRIMARY edge-gradient calibration, EXTENDED sweeps: rotated and scaled
anisotropic silhouettes (round-3 judge critique: the base calibration's
sphere is rotation-invariant and single-scale, so one global beta was never
tested where it could plausibly break).

Scene: a flat-lit (emissive-only) CUBE on black - radiance is
piecewise-constant, so ALL positional signal is the silhouette, and the
silhouette is anisotropic (edges + corners) so rotation and scale actually
change its geometry.  Per cell: ratio = grad_estimator / grad_fd at the
calibrated default beta = 0.5, FD over the spp-averaged loss with common
random numbers (same truth definition as benchmarks/edge_calibration.py).

Families:
* ``rotated`` - cube rotated about z by 0 / 0.4 / 0.8 rad, gradient w.r.t.
  x position (the silhouette edge the estimator integrates tilts);
* ``rot_grad`` - gradient w.r.t. the rotation slot itself at a tilted pose
  (silhouette sweep velocity varies along the edge);
* ``scaled``  - cube uniformly scaled 0.5x / 2x via transform scale
  (silhouette length and the 1/scale distance correction both change).

Run on CPU: JAX_PLATFORMS=cpu python benchmarks/edge_calibration_ext.py
Writes benchmarks/artifacts/edge_calibration_ext_r05.jsonl.
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
        KIND_CUBE, Scene, Shape, Union, compile_scene,
    )

    W = H = 64
    SPP = 16
    OFFSET = 0.2  # target shift that the gradient should chase

    root = Union(name="Root")
    box = root.add_shape(Shape(KIND_CUBE, name="Box"))
    box.size3.set(0.55, 0.35, 0.55)
    box.material.color.set(0.0, 0.0, 0.0)
    box.material.brightness.set(2.0)
    box.material.light_col.set(1.0, 1.0, 1.0)
    cs = compile_scene(Scene([root]))
    sh = cs.spec.roots[0].children_shapes[0]
    slot_x = sh.transform.pos[0]
    slot_rz = sh.transform.rot[2]
    slot_sc = sh.transform.scale
    base = np.asarray(cs.params, np.float32)

    def cell(family, setting, p, slot, eps):
        tgt_p = p.copy()
        tgt_p[slot_x] += OFFSET
        target = render_image_diff(cs.spec, jnp.asarray(tgt_p), width=W,
                                   height=H, bounces=0, spp=SPP)
        loss_spp = make_loss(cs.spec, target, width=W, height=H, bounces=0,
                             spp=SPP, edge_grad=False)
        loss_e = make_loss(cs.spec, target, width=W, height=H, bounces=0,
                           spp=SPP, edge_grad=True, edge_beta=0.5)
        pv = jnp.asarray(p)
        dp = np.zeros_like(p)
        dp[slot] = eps
        fd = (float(loss_spp(pv + jnp.asarray(dp)))
              - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * eps)
        est = float(jax.grad(loss_e)(pv)[slot])
        row = {
            "family": family, "setting": setting, "edge_beta": 0.5,
            "grad_fd_spp": fd, "grad_estimator": est,
            "ratio": est / fd if abs(fd) > 1e-9 else None,
            "spp": SPP, "res": W,
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []
    for rz in (0.0, 0.4, 0.8):
        p = base.copy()
        p[slot_rz] = rz
        rows.append(cell("rotated", rz, p, slot_x, 0.05))
    for rz in (0.4, 0.8):
        p = base.copy()
        p[slot_rz] = rz
        rows.append(cell("rot_grad", rz, p, slot_rz, 0.05))
    for sc in (0.5, 2.0):
        p = base.copy()
        p[slot_sc] = sc
        rows.append(cell("scaled", sc, p, slot_x, 0.05))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "edge_calibration_ext_r05.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
