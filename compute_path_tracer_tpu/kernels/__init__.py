"""Pallas TPU kernels: the fused tile megakernel and the compacting
wavefront backend (backward passes live in diff/)."""

from .megakernel import (
    DEFAULT_TILE,
    render_accumulated_pallas,
    render_frame_pallas,
)
from .wavefront import render_frame_wavefront

__all__ = [
    "DEFAULT_TILE",
    "render_accumulated_pallas",
    "render_frame_pallas",
    "render_frame_wavefront",
]
