"""Pallas TPU kernels: the fused forward megakernel (backward in diff/)."""

from .megakernel import (
    DEFAULT_TILE,
    render_accumulated_pallas,
    render_frame_pallas,
)

__all__ = ["DEFAULT_TILE", "render_accumulated_pallas", "render_frame_pallas"]
