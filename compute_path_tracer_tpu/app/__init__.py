"""Application layer: configuration, perf metrics, CLI."""

from .config import Constants, Settings
from .perf import TimePackage, rays_per_second

__all__ = ["Constants", "Settings", "TimePackage", "rays_per_second"]
