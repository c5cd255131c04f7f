"""Distribution: device meshes, tile sharding, gradient collectives."""

from .distributed import initialize_distributed, local_device_info
from .mesh import (
    TILE_AXIS,
    make_mesh,
    make_sharded_train_step,
    render_frame_sharded,
    render_samples_sharded,
)

__all__ = [
    "initialize_distributed",
    "local_device_info",
    "TILE_AXIS",
    "make_mesh",
    "make_sharded_train_step",
    "render_frame_sharded",
    "render_samples_sharded",
]
