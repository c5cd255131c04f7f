"""Differentiable rendering: custom_vjp march, losses, inverse rendering."""

from .inverse import OptimizeResult, optimize_to_target
from .vjp import (
    make_implicit_cast,
    make_loss,
    render_image_diff,
    render_pixels_diff,
)

__all__ = [
    "OptimizeResult",
    "optimize_to_target",
    "make_implicit_cast",
    "make_loss",
    "render_image_diff",
    "render_pixels_diff",
]
