"""Kernel-level W6A8 vs W8A8 comparison on the reference shape matrix.

The reference's headline KERNEL claim is 1.78x/1.81x/1.82x (bs 1/4/8) vs
cuBLAS W8A8 (reference README.md:189). The TPU analogue compares our W6
Pallas kernel against our W8A8 Pallas kernel (the SmoothQuant-baseline GEMM,
kernels/w8_matmul.py) on the same decode GEMM shapes — both kernels share
the act-quant input format, so the ratio isolates the 6-bit-plane streaming
win exactly like the reference's comparison does.

Run (ONE TPU process at a time):
    nohup python scripts/bench_kernel_w8.py > /tmp/kernel_w8.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from flexq_tpu.kernels import w6_matmul
    from flexq_tpu.kernels.w8_matmul import w8_matmul
    from flexq_tpu.packing import pack6
    from flexq_tpu.utils import bench_fn

    G = 128
    rng = np.random.default_rng(0)
    # reference test_flexq_kernel.sh matrix: qkv/out/gate-up/down GEMMs of
    # LLaMA-7B and LLaMA-2-70B (padded widths as quantize_linear produces)
    shapes = [
        (4096, 12288), (4096, 4096), (4096, 11264), (11008, 4096),
        (8192, 28672), (28672, 8192),
    ]
    results = {}
    ratios = []
    for m in (1, 4, 8):
        per_m = []
        for k, n in shapes:
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)
            wq6 = rng.integers(-32, 32, (k, n)).astype(np.int8)
            wq8 = rng.integers(-128, 128, (k, n)).astype(np.int8)
            ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
            hi, lo = pack6(jnp.asarray(wq6))
            t6 = bench_fn(
                lambda a, b, c, d, e: w6_matmul(a, b, c, d, e, out_dtype=jnp.bfloat16),
                (xq, xs, hi, lo, ws), iters=300, reps=5,
            )
            w8 = jnp.asarray(wq8)
            t8 = bench_fn(
                lambda a, b, c, d: w8_matmul(a, b, c, d, out_dtype=jnp.bfloat16),
                (xq, xs, w8, ws), iters=300, reps=5,
            )
            r = t8 / t6
            per_m.append(r)
            print(
                f"M={m} K={k} N={n}: w6 {t6*1e6:.0f}us w8 {t8*1e6:.0f}us {r:.2f}x",
                flush=True,
            )
        results[f"bs{m}"] = round(float(np.mean(per_m)), 3)
        ratios.extend(per_m)
    results["avg"] = round(float(np.mean(ratios)), 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
