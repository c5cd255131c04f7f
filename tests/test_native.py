"""Native C++ runtime library tests: builds via g++ on first use, must agree
exactly with the pure-Python implementations (io/native.py vs io/png.py and
ops/rng.py)."""

import numpy as np
import pytest

from compute_path_tracer_tpu.io import native
from compute_path_tracer_tpu.io.png import encode_png_rgba, hdr_to_rgba8, load_png_rgba

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_hdr_to_rgba8_matches_python():
    rng = np.random.default_rng(1)
    img = (rng.random((33, 47, 3)) * 1.5 - 0.2).astype(np.float32)
    for flip in (True, False):
        a = native.hdr_to_rgba8_native(img, gamma=2.2, flip_y=flip)
        b = hdr_to_rgba8(img, gamma=2.2, flip_y=flip)
        np.testing.assert_array_equal(a, b)


def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    rgba = (rng.random((20, 31, 4)) * 255).astype(np.uint8)
    data = native.encode_png_rgba_native(rgba)
    p = tmp_path / "n.png"
    p.write_bytes(data)
    back = load_png_rgba(str(p))
    np.testing.assert_array_equal(back, rgba)


def test_native_wang_hash_matches_jax():
    import jax.numpy as jnp

    from compute_path_tracer_tpu.ops.rng import wang_hash

    seeds = (np.arange(1, 4097, dtype=np.uint64) * np.uint64(2654435761)).astype(
        np.uint32
    )
    a = native.wang_hash_native(seeds)
    b = np.asarray(wang_hash(jnp.asarray(seeds)))
    np.testing.assert_array_equal(a, b)


def test_save_png_uses_native(tmp_path):
    from compute_path_tracer_tpu.io.png import save_png

    img = np.random.default_rng(3).random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "s.png")
    save_png(p, img)
    back = load_png_rgba(p)
    np.testing.assert_array_equal(back, hdr_to_rgba8(img))
