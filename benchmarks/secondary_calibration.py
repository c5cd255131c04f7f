"""Secondary-edge calibration: estimator magnitude vs FD across occluder
positions (the round-4 analog of benchmarks/edge_calibration.py for the
``edge_secondary=True`` estimator).

Sweeps the occluder's vertical position on the adversarial indirect-lighting
scene (benchmarks/secondary_edge.py: wall lit only through the occluder's
shadow boundary) and, per position, compares the secondary estimator's
gradient against the centered finite difference of the spp-averaged loss
(common random numbers).  One JSON line per cell with
``ratio = grad_estimator / grad_fd``; feeds the band asserted in
tests/test_edge.py::test_edge_secondary_recovers_occluder_gradient.

Writes benchmarks/artifacts/secondary_calibration_r05.jsonl.
Run on CPU: JAX_PLATFORMS=cpu python benchmarks/secondary_calibration.py
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
    EPS = 0.1

    cs = compile_scene(_scene())
    slot = cs.spec.roots[0].children_shapes[2].transform.pos[1]
    base = np.asarray(cs.params, np.float32)
    tgt = np.zeros((H, W, 3), np.float32)

    loss_spp = make_loss(cs.spec, tgt, width=W, height=H, bounces=BOUNCES,
                         spp=SPP, fov=FOV)
    loss_sec = make_loss(cs.spec, tgt, width=W, height=H, bounces=BOUNCES,
                         spp=SPP, fov=FOV, edge_grad=True,
                         edge_secondary=True)
    g_sec = jax.jit(jax.grad(loss_sec))

    rows = []
    for occ_y in (0.45, 0.6, 0.75, 0.9):
        p = base.copy()
        p[slot] = occ_y
        pv = jnp.asarray(p)
        dp = np.zeros_like(p)
        dp[slot] = EPS
        fd = (float(loss_spp(pv + jnp.asarray(dp)))
              - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * EPS)
        est = float(g_sec(pv)[slot])
        rows.append({
            "occ_y": occ_y, "grad_fd_spp": fd, "grad_est_secondary": est,
            "ratio": est / fd if abs(fd) > 1e-9 else None,
            "spp": SPP, "res": W,
        })
        print(json.dumps(rows[-1]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "secondary_calibration_r05.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
