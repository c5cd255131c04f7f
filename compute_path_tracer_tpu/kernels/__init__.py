"""Pallas TPU kernels: the fused tile megakernel, the standalone
differentiable march (forward kernel + implicit-gradient backward), and the
compacting wavefront backend."""

from .march import make_pallas_cast, march_pallas
from .megakernel import (
    DEFAULT_TILE,
    render_accumulated_pallas,
    render_frame_pallas,
)
from .wavefront import render_frame_wavefront

__all__ = [
    "DEFAULT_TILE",
    "make_pallas_cast",
    "march_pallas",
    "render_accumulated_pallas",
    "render_frame_pallas",
    "render_frame_wavefront",
]
