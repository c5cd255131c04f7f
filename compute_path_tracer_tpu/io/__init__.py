"""Host I/O: PNG export and checkpoint/resume."""

from .checkpoint import (
    load_checkpoint,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)
from .png import encode_png_rgba, hdr_to_rgba8, load_png_rgba, save_png

__all__ = [
    "load_checkpoint",
    "load_checkpoint_orbax",
    "save_checkpoint",
    "save_checkpoint_orbax",
    "encode_png_rgba",
    "hdr_to_rgba8",
    "load_png_rgba",
    "save_png",
]
