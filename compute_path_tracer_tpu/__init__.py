"""compute_path_tracer_tpu: a TPU-native differentiable SDF path tracer.

A from-scratch JAX / Pallas / shard_map framework with the capabilities of
the reference wgpu/GLSL renderer ``zachdedoo13/compute_path_tracer``
(see SURVEY.md): a CSG tree of analytic SDF primitives is compiled to a
static scene spec plus a flat f32 parameter vector, sphere-traced and
path-traced per pixel with progressive accumulation - plus the new layers
the TPU build adds: differentiation of pixels w.r.t. scene parameters and
multi-chip tile sharding with parameter-gradient all-reduce.

Package layout:
  scene/     editable CSG tree, param registry, compiler, JSON persistence
  ops/       SDF / CSG / RNG / AABB / camera / tonemap device math
  render/    jax.numpy oracle renderer + trace-time scene codegen
  kernels/   Pallas TPU megakernels
  diff/      custom_vjp gradients and inverse rendering
  parallel/  device-mesh sharding and collectives
  io/        PNG export and checkpointing
  app/       CLI, config, render session orchestration
"""

__version__ = "0.1.0"

from . import constants, vecmath
from .scene import Scene, Shape, Union, compile_scene
from .render import render_accumulated, render_frame

__all__ = [
    "constants",
    "vecmath",
    "Scene",
    "Shape",
    "Union",
    "compile_scene",
    "render_accumulated",
    "render_frame",
    "__version__",
]
