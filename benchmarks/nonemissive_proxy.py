"""Non-emissive secondary proxy probe (round-5-outlook item 3).

The secondary edge estimator's proxy models "coverage flips to a hit on the
graze shape" as  thr_b * emissive(i_b) - rem_b : the path gains the graze
shape's EMISSION and loses its downstream radiance.  For a lit,
NON-emissive graze shape that is zero-gain - hitting a bright white
reflector is scored like hitting black, overestimating the darkening
(the wall-x class of error from secondary_edge_r03, now secondary-only).

Candidate correction (ROADMAP round-5 outlook 3): keep ~albedo of the
downstream radiance under a local-uniform-radiance assumption - the
continued path scatters off the graze shape with throughput * albedo and
collects roughly the radiance the unoccluded path did:

    proxy_b = thr_b * emissive(i_b) - (1 - albedo(i_b)) * rem_b

(the current form is the albedo = 0 special case; for the adversarial
occluder scene albedo = 0.02, so its calibration barely moves).

Probe scene (bounces = 2): camera sees a diffuse wall lit only by an
off-frustum emitter; a WHITE non-emissive reflector slab sweeps across the
wall->emitter secondary path.  Because the reflector has albedo 0.9 and the
emitter stays reachable from its surface, blocking trades direct light for
reflected light - the FD gradient is much smaller than an opaque-black
blocker would give.  Prints FD truth (spp-averaged, common random numbers)
vs the current estimator vs the albedo-corrected candidate's PREDICTED
ratio change.

Run on CPU: JAX_PLATFORMS=cpu python benchmarks/nonemissive_proxy.py
Writes benchmarks/artifacts/nonemissive_proxy_r04.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _scene(albedo=0.9):
    from compute_path_tracer_tpu.scene import (
        KIND_CUBE, KIND_SPHERE, Scene, Shape, Union,
    )

    root = Union(name="Root")
    wall = root.add_shape(Shape(KIND_CUBE, name="Wall"))
    wall.size3.set(1.5, 1.5, 0.05)
    wall.transform.position.set(0.0, 0.0, 1.5)
    wall.material.color.set(0.7, 0.7, 0.7)

    emit = root.add_shape(Shape(KIND_SPHERE, name="Emitter"))
    emit.size.set(1.0)
    emit.transform.position.set(-3.5, 0.0, 0.3)
    emit.material.color.set(0.0, 0.0, 0.0)
    emit.material.brightness.set(40.0)
    emit.material.light_col.set(1.0, 1.0, 1.0)

    # White reflector instead of the black occluder: same pose family as
    # benchmarks/secondary_edge.py so the silhouette geometry is identical -
    # only the graze shape's response to being hit changes.
    refl = root.add_shape(Shape(KIND_CUBE, name="Reflector"))
    refl.size3.set(0.05, 0.75, 1.5)
    refl.transform.position.set(-2.0, 0.75, 0.75)
    refl.material.color.set(albedo, albedo, albedo)
    return Scene([root])


def main():
    import jax
    import jax.numpy as jnp

    from compute_path_tracer_tpu.diff import make_loss
    from compute_path_tracer_tpu.scene import compile_scene

    W = H = 40
    SPP = 16
    BOUNCES = 2  # the reflector must get its own continuation bounce
    FOV = 3.0
    EPS = 0.1

    rows = []
    for albedo in (0.0, 0.9):
        cs = compile_scene(_scene(albedo))
        slot = cs.spec.roots[0].children_shapes[2].transform.pos[1]
        base = np.asarray(cs.params, np.float32)
        tgt = np.zeros((H, W, 3), np.float32)

        loss_spp = make_loss(cs.spec, tgt, width=W, height=H,
                             bounces=BOUNCES, spp=SPP, fov=FOV)
        loss_sec = make_loss(cs.spec, tgt, width=W, height=H,
                             bounces=BOUNCES, spp=SPP, fov=FOV,
                             edge_grad=True, edge_secondary=True)
        g_sec = jax.jit(jax.grad(loss_sec))

        pv = jnp.asarray(base)
        dp = np.zeros_like(base)
        dp[slot] = EPS
        fd = (float(loss_spp(pv + jnp.asarray(dp)))
              - float(loss_spp(pv - jnp.asarray(dp)))) / (2 * EPS)
        est = float(g_sec(pv)[slot])
        row = {
            "albedo": albedo, "grad_fd_spp": fd,
            "grad_est_secondary": est,
            "ratio": est / fd if abs(fd) > 1e-9 else None,
            "spp": SPP, "res": W, "bounces": BOUNCES,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "nonemissive_proxy_r04.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
