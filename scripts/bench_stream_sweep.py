#!/usr/bin/env python
"""Decode-kernel streaming sweep over the bench.py shape matrix.

Goal (CLAUDE.md TODO #1): find what pushes e2e weight streaming from ~700
toward 900+ GB/s. Variants per (M, K, N):
  auto          — current w6_matmul dispatch (stream only when k > n)
  stream3/4/5   — manual-DMA kernel forced on ALL shapes, nbuf ∈ {3,4,5}
  stream3_bk512 — bk=512 where K allows (fewer, deeper DMAs)
  stream3_bnfull— bn = N (single grid step) where VMEM allows

Prints per-shape µs / effective GB/s on the 6-bit planes / speedup vs bf16
dense, then the projected bench.py metric (avg speedup) per variant.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flexq_tpu.kernels.w6_matmul import w6_matmul
from flexq_tpu.kernels.w6_stream import w6_matmul_stream
from flexq_tpu.kernels.common import largest_divisor_tile
from flexq_tpu.packing import pack6
from flexq_tpu.utils import bench_fn

G = 128
ITERS = 200
REPS = 3

shapes = [
    (4096, 12288),
    (4096, 4096),
    (4096, 11264),
    (11008, 4096),
    (8192, 28672),
    (28672, 8192),
]
ms = [1, 8]


def vmem_est(k, n, bk, bn, nbuf):
    ng = k // G
    bufs = nbuf * (bk // 2 + bk // 4) * bn
    ws = ng * bn * 4
    acc = 8 * bn * 4
    x = 8 * k
    return bufs + ws + acc + x


def main():
    rng = np.random.default_rng(0)
    results = {}  # variant -> {slot: speedup}
    slot = -1
    for m in ms:
        for k, n in shapes:
            slot += 1
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)
            wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
            ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
            hi, lo = pack6(jnp.asarray(wq))

            xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            wb = jnp.asarray(wq, jnp.bfloat16)
            t_b = bench_fn(lambda x, w: x @ w, (xb, wb), iters=ITERS, reps=REPS)
            plane_bytes = (k * n * 3) // 4

            variants = {}
            variants["auto"] = lambda a, b, c, d, e: w6_matmul(a, b, c, d, e)
            for nb in (3, 4, 5):
                if vmem_est(k, n, 256, largest_divisor_tile(n, cap=8192), nb) < 13.5e6:
                    variants[f"stream{nb}"] = (
                        lambda a, b, c, d, e, nb=nb: w6_matmul_stream(
                            a, b, c, d, e, nbuf=nb
                        )
                    )
            if k % 512 == 0:
                bn512 = largest_divisor_tile(n, cap=8192)
                if vmem_est(k, n, 512, bn512, 3) < 13.5e6:
                    variants["stream3_bk512"] = (
                        lambda a, b, c, d, e: w6_matmul_stream(
                            a, b, c, d, e, block_k=512, nbuf=3
                        )
                    )
            if vmem_est(k, n, 256, n, 3) < 13.5e6 and n != largest_divisor_tile(n, cap=8192):
                variants["stream3_bnfull"] = (
                    lambda a, b, c, d, e: w6_matmul_stream(
                        a, b, c, d, e, block_n=n, nbuf=3
                    )
                )

            print(f"== M={m} K={k} N={n}  bf16 {t_b*1e6:.0f}us ==", flush=True)
            for name, fn in variants.items():
                try:
                    t = bench_fn(fn, (xq, xs, hi, lo, ws), iters=ITERS, reps=REPS)
                except Exception as e:
                    print(f"  {name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
                    continue
                gbs = plane_bytes / t / 1e9
                sp = t_b / t
                results.setdefault(name, {})[slot] = sp
                print(
                    f"  {name:16s} {t*1e6:7.1f}us  {gbs:6.0f} GB/s  {sp:5.2f}x",
                    flush=True,
                )

    print("\n== projected bench metric (avg speedup, shapes where variant ran) ==")
    for name, sps in results.items():
        ok = list(sps.values())
        print(f"  {name:16s} n={len(ok):2d}  avg {np.mean(ok):.3f}x")
    # best-per-shape composite: pick max speedup available for each shape slot
    nslots = len(ms) * len(shapes)
    best = [
        max(sps[i] for sps in results.values() if i in sps) for i in range(nslots)
    ]
    print(f"  best-per-shape    avg {np.mean(best):.3f}x")


if __name__ == "__main__":
    main()
