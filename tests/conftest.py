"""Test harness configuration.

Default lane: CPU with 8 virtual XLA host devices so every multi-chip
sharding path (mesh creation, shard_map, psum) executes without TPU
hardware - the strategy SURVEY.md §4 prescribes.  Must run before jax is
imported anywhere.

Hardware lane: ``pytest -m tpu tests/`` keeps the ambient (TPU) platform and
runs ONLY the ``@pytest.mark.tpu`` suite (tests/test_tpu.py) - real Mosaic
compiles, catching lowering failures interpret mode cannot (e.g. the
AD-normal transpose at 64 prims).  tpu-marked tests auto-skip in the CPU
lane and vice versa.
"""

import os
import sys

import pytest


def _tpu_lane_requested(argv) -> bool:
    for i, a in enumerate(argv):
        if a == "-m" and i + 1 < len(argv) and "tpu" in argv[i + 1]:
            return "not tpu" not in argv[i + 1]
        if a.startswith("-m=") and "tpu" in a:
            return "not tpu" not in a
    return False


TPU_LANE = _tpu_lane_requested(sys.argv)

if not TPU_LANE:
    # Hard-set (not setdefault): the ambient environment may point JAX at
    # the experimental TPU platform, and the default suite must be
    # CPU-deterministic.
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

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU chip (run with `pytest -m tpu`)"
    )


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        return
    skip = pytest.mark.skip(reason="TPU lane only (run `pytest -m tpu tests/`)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
