"""Inverse rendering: optimize scene parameters to match a target image.

BASELINE.json config #4: gradient-descent over the flat parameter vector
(positions, radii, blends, albedos - every ``Param`` in the scene) against a
target render.  Single-chip here; the tile-sharded multi-chip variant with
psum gradient reduction lives in parallel/mesh.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..scene.compile import SceneSpec
from .vjp import make_loss


class OptimizeResult(NamedTuple):
    params: jnp.ndarray
    losses: jnp.ndarray


def optimize_to_target(
    spec: SceneSpec,
    init_params,
    target,
    *,
    width: int,
    height: int,
    bounces: int = 2,
    spp: int = 1,
    steps: int = 100,
    learning_rate: float = 2e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    implicit: bool = True,
    param_mask=None,
    callback: Optional[Callable[[int, float], None]] = None,
    geometry: str = "faithful",
    edge_grad: bool = False,
    edge_beta: float = 0.5,
    edge_secondary: bool = False,
    edge_beta2: float = 2.0,
    march: str = "xla",
    fused: bool = False,
    interpret: Optional[bool] = None,
) -> OptimizeResult:
    """Adam-optimize the parameter vector toward a target image.

    ``param_mask`` (same shape as params, 0/1) freezes entries - e.g. to
    optimize only geometry or only albedo.  ``edge_grad`` adds the
    reparameterized silhouette gradient (diff/vjp.py) - required when the
    optimized parameter only moves visibility edges (e.g. recovering a
    flat-lit shape's POSITION, where smooth gradients are zero almost
    everywhere).  ``fused=True`` swaps the XLA value_and_grad for the fused
    train kernel (kernels/train.py: forward + per-pixel backward in one
    Pallas kernel; detached-normal gradient semantics; pass
    ``edge_grad=True`` for the fused PRIMARY-silhouette term - without it
    the fused step cannot learn geometry) - the fast path for
    material/large-scene optimization.  ``spp`` works on BOTH paths
    (round 5): the fused step averages loss/gradient over spp independent
    frame RNG streams per optimizer step (kernels/train.py
    make_fused_value_and_grad).  Returns
    final params and the per-step loss trace.
    """
    if fused:
        from ..kernels.train import check_no_refraction, make_fused_value_and_grad

        if not implicit or geometry != "faithful" or march != "xla":
            # The fused kernel has fixed semantics (baked geometry, on-chip
            # march, detached normals); a caller explicitly requesting the
            # XLA-path knobs would silently get something else.
            raise ValueError(
                "fused=True ignores implicit/geometry/march (the fused "
                "kernel is always baked geometry + on-chip march with "
                "detached normals); leave them at their defaults or use "
                "fused=False"
            )
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        check_no_refraction(spec, jnp.asarray(init_params, jnp.float32))
        vag = make_fused_value_and_grad(
            spec, target, width=width, height=height, bounces=bounces,
            interpret=interpret, edge_grad=edge_grad, edge_beta=edge_beta,
            edge_secondary=edge_secondary, edge_beta2=edge_beta2, spp=spp,
        )
        # Pin refract_chance at its (checked-zero) init: the fused model
        # cannot represent nonzero values (forward shades them as 0), so
        # letting the valid-at-zero channel-13 gradient move the param off
        # zero would silently switch to wrong-model gradients mid-run.
        from ..render.scenegen import material_slot_matrix

        rc_mask = jnp.ones(jnp.asarray(init_params).shape, jnp.float32)
        rc_mask = rc_mask.at[
            jnp.asarray(material_slot_matrix(spec)[:, 13])
        ].set(0.0)
        param_mask = rc_mask if param_mask is None else (
            jnp.asarray(param_mask, jnp.float32) * rc_mask
        )
    else:
        loss_fn = make_loss(
            spec, target, width=width, height=height, bounces=bounces,
            spp=spp, implicit=implicit, geometry=geometry,
            edge_grad=edge_grad, edge_beta=edge_beta,
            edge_secondary=edge_secondary, edge_beta2=edge_beta2, march=march,
        )

        def vag(params, frame=0):
            del frame
            return jax.value_and_grad(loss_fn)(params)

    opt = optimizer or optax.adam(learning_rate)
    params = jnp.asarray(init_params, jnp.float32)
    mask = None if param_mask is None else jnp.asarray(param_mask, jnp.float32)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grad = vag(params)
        if mask is not None:
            grad = grad * mask
        updates, opt_state = opt.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1])
    return OptimizeResult(params=params, losses=jnp.asarray(losses))
