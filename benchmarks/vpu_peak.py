"""VPU throughput microbenchmark: how many elementwise f32 ops/cycle does a
Pallas kernel actually retire on this chip?

Runs K iterations of a body with W independent fma chains over a (64, 128)
tile - W gives the scheduler independent work to fill VLIW slots / hide
latency.  Calibrates the megakernel's roofline: if ops/s saturates near
1 op/lane/cycle regardless of W, the megakernel (measured ~1/cycle) is at
peak; if it scales with W, there is ILP headroom to chase.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W_TILE = 64, 128
K = 2000  # fori iterations


def make_fn(width):
    def kernel(x_ref, o_ref):
        def body(i, carry):
            outs = []
            for w in range(width):
                c = carry[w]
                c = c * 1.000001 + 0.5  # one fma
                c = c * 0.999999 + 0.25
                outs.append(c)
            return tuple(outs)

        init = tuple(x_ref[:] + float(w) for w in range(width))
        outs = jax.lax.fori_loop(0, K, body, init)
        acc = outs[0]
        for w in range(1, width):
            acc = acc + outs[w]
        o_ref[:] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W_TILE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


def main():
    import json

    x = jnp.ones((H, W_TILE), jnp.float32)
    best = 0.0
    for width in (1, 2, 4, 8, 16, 32, 64):
        run = make_fn(width)
        np.asarray(run(x)).sum()  # compile
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            r = run(x)
        np.asarray(r).sum()
        dt = time.perf_counter() - t0
        ops = 2 * width * K * H * W_TILE * reps  # 2 fma per chain per iter
        tflops = ops * 2 / dt / 1e12
        best = max(best, tflops)
        print(f"chains={width}: {ops/dt/1e9:8.1f} Gfma/s "
              f"({tflops:6.2f} Tflop/s)", flush=True)
    # Machine-readable line for bench.py's roofline attribution: the
    # ATTAINABLE elementwise-f32 rate this chip retires with ample ILP,
    # as opposed to the nominal datasheet peak (app/profiling.py).
    print(json.dumps({"attainable_tflops": round(best, 3),
                      "tile": [H, W_TILE], "fori_iters": K}), flush=True)


if __name__ == "__main__":
    main()
