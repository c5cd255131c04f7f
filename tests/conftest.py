"""Test harness configuration.

Tests run on CPU with 8 virtual XLA host devices so every multi-chip
sharding path (mesh creation, shard_map, psum) executes without TPU
hardware - the strategy SURVEY.md §4 prescribes.  Must run before jax is
imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
