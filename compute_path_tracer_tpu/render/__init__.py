"""Renderers: the jax.numpy oracle and shared scene-evaluation codegen."""

from .reference import (
    Mat,
    calc_normal,
    cast_ray,
    colors_debug,
    gather_material,
    normals_debug,
    path_trace,
    render_accumulated,
    render_frame,
)
from .scenegen import apply_transform, make_bounds, make_map, material_slot_matrix
from .session import RenderSession
from .soa import build_soa_plan, render_frame_soa, render_pixels_soa

__all__ = [
    "RenderSession",
    "Mat",
    "calc_normal",
    "cast_ray",
    "colors_debug",
    "gather_material",
    "normals_debug",
    "path_trace",
    "render_accumulated",
    "render_frame",
    "apply_transform",
    "make_bounds",
    "make_map",
    "material_slot_matrix",
    "build_soa_plan",
    "render_frame_soa",
    "render_pixels_soa",
]
