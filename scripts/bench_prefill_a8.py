"""Prefill GEMM paths compared at M=2048: exact W6A8 vs W6A16.

The serve path routes large-M prefill through the W6A16 kernel
(Engine.prefill_bf16_threshold). The reference instead runs its packed
quantized GEMMs at prefill too (GptContextAttentionLayer.cc:160-176). On
TPU the int8 MXU doubles bf16 rate, so if the W6A8 kernel + its quant_act
producer beat W6A16 at M=2048, prefill should flip to the exact path.

Run (ONE TPU process at a time):
    nohup python scripts/bench_prefill_a8.py > /tmp/prefill_a8.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from flexq_tpu.kernels import quant_act, w6_matmul, w6_matmul_bf16
    from flexq_tpu.packing import pack6
    from flexq_tpu.utils import bench_fn

    G = 128
    rng = np.random.default_rng(0)
    m = int(os.environ.get("FLEXQ_BENCH_M", "2048"))
    shapes = [(4096, 12288), (4096, 4096), (4096, 11264), (11008, 4096)]
    results = {}
    for k, n in shapes:
        wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
        ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
        hi, lo = pack6(jnp.asarray(wq))
        xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
        xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)

        t16 = bench_fn(
            lambda a, b, c, d: w6_matmul_bf16(a, b, c, d, out_dtype=jnp.bfloat16),
            (xb, hi, lo, ws), iters=30, reps=5,
        )
        t8 = None
        best = None
        for bm, bn, bk in ((256, 2048, 512), (256, 1024, 512), (512, 1024, 512),
                           (512, 2048, 256), (256, 2048, 256), (128, 2048, 512)):
            if n % bn or k % bk:
                continue
            try:
                t = bench_fn(
                    lambda a, b, c, d, e: w6_matmul(
                        a, b, c, d, e, out_dtype=jnp.bfloat16,
                        block_m=bm, block_n=bn, block_k=bk,
                    ),
                    (xq, xs, hi, lo, ws), iters=30, reps=3,
                )
            except Exception as e:  # VMEM OOM configs
                print(f"  ({bm},{bn},{bk}) failed: {str(e)[:80]}", flush=True)
                continue
            print(f"  ({bm},{bn},{bk}): {t*1e6:.0f}us", flush=True)
            if t8 is None or t < t8:
                t8, best = t, (bm, bn, bk)
        print(f"  best A8 config {best}", flush=True)
        # producer cost the A8 path adds (fused quant of the bf16 input)
        tq = bench_fn(lambda a: quant_act(a, 8)[0], (xb,), iters=30, reps=5)
        flops = 2 * m * k * n
        print(
            f"M={m} K={k} N={n}: a16 {t16*1e6:.0f}us ({flops/t16/1e12:.0f}TF) "
            f"a8 {t8*1e6:.0f}us ({flops/t8/1e12:.0f}TF) quant {tq*1e6:.0f}us "
            f"-> a8+q {(t8+tq)/t16:.2f}x of a16",
            flush=True,
        )
        results[f"{k}x{n}"] = {
            "a16_us": round(t16 * 1e6), "a8_us": round(t8 * 1e6),
            "quant_us": round(tq * 1e6),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
