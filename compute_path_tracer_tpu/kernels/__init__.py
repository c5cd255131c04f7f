"""Pallas TPU kernels: the fused tile megakernel, the standalone
differentiable march (forward kernel + implicit-gradient backward), and the
fused training-step kernel (train.py).  The experimental wavefront backend
was quarantined to benchmarks/frozen_wavefront.py in round 3."""

from .march import make_pallas_cast, march_pallas
from .megakernel import (
    DEFAULT_TILE,
    render_accumulated_pallas,
    render_frame_pallas,
)

__all__ = [
    "DEFAULT_TILE",
    "make_pallas_cast",
    "march_pallas",
    "render_accumulated_pallas",
    "render_frame_pallas",
]
