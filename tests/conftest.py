"""Test harness configuration.

Tests run on CPU with 8 virtual XLA host devices so every multi-chip
sharding path (mesh creation, shard_map, psum) executes without TPU
hardware - the strategy SURVEY.md §4 prescribes.  Must run before jax is
imported anywhere.
"""

import os

# Hard-set (not setdefault): the ambient environment may point JAX at the
# experimental TPU platform, and the test suite must be CPU-deterministic.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's startup hooks can rewrite jax_platforms to prefer the
# TPU plugin even when JAX_PLATFORMS=cpu is set; the config update below
# wins as long as it happens before the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"
