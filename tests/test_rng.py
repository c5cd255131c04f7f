"""RNG bit-exactness tests against an independent pure-Python uint32 model
of the reference hash chain (reference: assets/shaders/path_tracer/rng.glsl)."""

import numpy as np
import jax.numpy as jnp

from compute_path_tracer_tpu.ops import rng as R

M32 = 0xFFFFFFFF


def py_wang_hash(seed: int) -> int:
    seed = ((seed ^ 61) ^ (seed >> 16)) & M32
    seed = (seed * 9) & M32
    seed = (seed ^ (seed >> 4)) & M32
    seed = (seed * 0x27D4EB2D) & M32
    seed = (seed ^ (seed >> 15)) & M32
    return seed


def test_wang_hash_bit_exact():
    seeds = np.array([1, 2, 3, 61, 12345, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(R.wang_hash(jnp.asarray(seeds)))
    want = np.array([py_wang_hash(int(s)) for s in seeds], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_wang_hash_chain():
    s = jnp.asarray(np.uint32(7919))
    ref = 7919
    for _ in range(10):
        s = R.wang_hash(s)
        ref = py_wang_hash(ref)
        assert int(s) == ref


def test_random_float01_range_and_value():
    state = jnp.asarray(np.arange(1, 1000, dtype=np.uint32))
    new_state, vals = R.random_float01(state)
    vals = np.asarray(vals)
    assert (vals >= 0.0).all() and (vals < 1.0).all()
    # value = float(new_state) / 2^32 exactly
    np.testing.assert_array_equal(
        vals, np.asarray(new_state).astype(np.float32) / np.float32(2**32)
    )


def test_random_unit_vector_on_sphere():
    state = jnp.asarray(np.arange(1, 512, dtype=np.uint32))
    _, v = R.random_unit_vector(state)
    length = np.asarray(v.length())
    np.testing.assert_allclose(length, 1.0, atol=1e-5)


def test_gen_rng_formula():
    # Matches the quirky (x*0.5+0.5)*W float scaling with truncation and |1.
    w, h, frame = 640, 480, 3
    xs = np.array([0, 1, 2, 639], dtype=np.int32)
    ys = np.array([0, 1, 2, 479], dtype=np.int32)
    got = np.asarray(R.gen_rng(jnp.asarray(xs), jnp.asarray(ys), frame, w, h))
    want = []
    for x, y in zip(xs, ys):
        fx = int(np.float32(np.float32(x) * 0.5 + 0.5) * np.float32(w))
        fy = int(np.float32(np.float32(y) * 0.5 + 0.5) * np.float32(h))
        want.append(((fx * 1973 + fy * 9277 + frame * 26699) & M32) | 1)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint32))


def test_gen_rng_always_odd():
    xs = jnp.arange(128, dtype=jnp.int32)
    seeds = np.asarray(R.gen_rng(xs, xs, 0, 128, 128))
    assert (seeds % 2 == 1).all()
