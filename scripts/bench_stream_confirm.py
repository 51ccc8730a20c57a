#!/usr/bin/env python
"""High-rep confirmation of stream-vs-auto on the divergent decode shapes.

The first sweep (bench_stream_sweep.py) showed stream3 winning hugely on
N=11264 (bn=5632, a non-multiple-of-1024 tile width) and losing/parity
elsewhere; axon noise is +-10-15% so confirm with reps=7 before changing the
dispatch heuristic.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from flexq_tpu.kernels.w6_matmul import w6_matmul
from flexq_tpu.kernels.w6_stream import w6_matmul_stream
from flexq_tpu.packing import pack6
from flexq_tpu.utils import bench_fn

G = 128
shapes = [(4096, 11264), (4096, 12288)]
ms = [1, 8]


def main():
    rng = np.random.default_rng(0)
    for m in ms:
        for k, n in shapes:
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)
            wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
            ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
            hi, lo = pack6(jnp.asarray(wq))
            plane = (k * n * 3) // 4
            res = {}
            variants = {
                "auto": lambda a, b, c, d, e: w6_matmul(a, b, c, d, e),
                "stream3": lambda a, b, c, d, e: w6_matmul_stream(a, b, c, d, e, nbuf=3),
                "stream5": lambda a, b, c, d, e: w6_matmul_stream(a, b, c, d, e, nbuf=5),
            }
            for name, fn in variants.items():
                t = bench_fn(fn, (xq, xs, hi, lo, ws), iters=2000, reps=5)
                res[name] = t
                print(
                    f"M={m} K={k} N={n} {name:8s} {t*1e6:7.1f}us "
                    f"{plane/t/1e9:6.0f} GB/s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
