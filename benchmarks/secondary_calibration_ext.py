"""Secondary-edge calibration, EXTENDED sweeps: rotation-heavy and
multi-scale occluders (round-5-outlook item 2, executed in round 4).

The base calibration (benchmarks/secondary_calibration.py) sweeps only the
occluder's translation - the round-3 critique of the PRIMARY band (one
global beta, untested under rotation or scale changes) applies equally to
the secondary estimator.  This harness re-measures ``ratio = est / FD`` on
the same adversarial indirect-lighting scene (benchmarks/secondary_edge.py)
under three new families:

* ``rotated``   - occluder rotated about z, gradient w.r.t. occluder y
                  (the shadow boundary tilts; translation gradient ratio
                  should stay in band if beta is geometry-agnostic);
* ``rot_grad``  - gradient w.r.t. the occluder's ROTATION slot itself
                  (a gradient direction the translation sweep never tests);
* ``scaled``    - occluder uniformly scaled 0.5x / 2x via its transform
                  scale (multi-scale: the silhouette length and the
                  distance-scale correction both change).

FD truth uses the spp-averaged loss with common random numbers, same as the
base harness.  Writes benchmarks/artifacts/secondary_calibration_ext_r05.jsonl.
Run on CPU: JAX_PLATFORMS=cpu python benchmarks/secondary_calibration_ext.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from secondary_edge import _scene  # noqa: E402  (benchmarks/ sibling)


def main():
    import jax
    import jax.numpy as jnp

    from compute_path_tracer_tpu.diff import make_loss
    from compute_path_tracer_tpu.scene import compile_scene

    W = H = 40
    SPP = 8
    BOUNCES = 1
    FOV = 3.0

    cs = compile_scene(_scene())
    occ = cs.spec.roots[0].children_shapes[2]
    slot_y = occ.transform.pos[1]
    slot_rz = occ.transform.rot[2]
    slot_sc = occ.transform.scale
    base = np.asarray(cs.params, np.float32)
    tgt = np.zeros((H, W, 3), np.float32)

    loss_spp = make_loss(cs.spec, tgt, width=W, height=H, bounces=BOUNCES,
                         spp=SPP, fov=FOV)
    loss_sec = make_loss(cs.spec, tgt, width=W, height=H, bounces=BOUNCES,
                         spp=SPP, fov=FOV, edge_grad=True,
                         edge_secondary=True)
    g_sec = jax.jit(jax.grad(loss_sec))

    def cell(family, setting, p, slot, eps):
        pv = jnp.asarray(p)
        dp = np.zeros_like(p)
        dp[slot] = eps
        fd = (float(loss_spp(pv + jnp.asarray(dp)))
              - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * eps)
        est = float(g_sec(pv)[slot])
        row = {
            "family": family, "setting": setting,
            "grad_fd_spp": fd, "grad_est_secondary": est,
            "ratio": est / fd if abs(fd) > 1e-9 else None,
            "spp": SPP, "res": W,
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []
    # Rotation-heavy: tilt the occluder, keep measuring the y gradient.
    for rz in (0.3, 0.6, 0.9):
        p = base.copy()
        p[slot_rz] = rz
        rows.append(cell("rotated", rz, p, slot_y, 0.1))
    # Rotation GRADIENT: d loss / d rot_z at a tilted pose.
    for rz in (0.0, 0.4):
        p = base.copy()
        p[slot_rz] = rz
        rows.append(cell("rot_grad", rz, p, slot_rz, 0.05))
    # Multi-scale: uniform occluder scale (slab thins/thickens, silhouette
    # sweep length changes, the 1/scale distance correction engages).
    for sc in (0.5, 2.0):
        p = base.copy()
        p[slot_sc] = sc
        rows.append(cell("scaled", sc, p, slot_y, 0.1))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "secondary_calibration_ext_r05.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
