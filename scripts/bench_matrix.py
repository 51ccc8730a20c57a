"""Full reference kernel-benchmark matrix (engine/test_flexq_kernel.sh:8-40):
M ∈ {1,2,4,8} × the qkv/out/gate/down GEMMs of LLaMA-7B, LLaMA-30B,
LLaMA-2-13B, LLaMA-2-70B and OPT-30B — W6A8 and W4A8 Pallas kernels vs the
bf16 dense matmul, on real TPU.

The reference benches W6A6 for qkv/out/gate and W6A8 for down; on TPU both
activation widths live in the same int8 MXU container, so one A8
measurement covers both (the 6-bit act saves no bytes or cycles here —
policy-level A6 vs A8 only changes quantization rounding).

Run:  nohup python scripts/bench_matrix.py > /tmp/matrix.log 2>&1 &
Output: markdown table + one JSON line (per-shape speedups + averages).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

G = 128

# (model, gemm, K, N) — reference test_flexq_kernel.sh argument order is
# (M, N, K); ours is x [M, K] @ w [K, N]
SHAPES = []
for model, h, ffn in (
    ("llama-7b", 4096, 11008),
    ("llama-30b", 6656, 17920),
    ("llama-2-13b", 5120, 13824),
    ("llama-2-70b", 8192, 28672),
    ("opt-30b", 7168, 28672),
):
    SHAPES += [
        (model, "qkv", h, 3 * h),
        (model, "out", h, h),
        (model, "gate", h, ffn),
        (model, "down", ffn, h),
    ]


def main():
    import jax
    import jax.numpy as jnp

    from flexq_tpu.kernels import w4_matmul, w6_matmul
    from flexq_tpu.packing import pack4, pack6
    from flexq_tpu.utils import bench_fn

    quick = "--quick" in sys.argv
    iters = 100 if quick else 250
    reps = 3 if quick else 5
    ms = (8,) if quick else (1, 2, 4, 8)
    only = os.environ.get("FLEXQ_MATRIX_MODELS")
    shapes = [s for s in SHAPES if only is None or s[0] in only.split(",")]

    HBM_PEAK = 819e9  # v5e; implied BW above ~1.2x peak = timing artifact

    def plausible(t, nbytes):
        return nbytes / max(t, 1e-9) < 1.2 * HBM_PEAK

    def measure(fn, args, nbytes):
        """bench_fn with a physical sanity gate: an axon stall can slip a
        tiny positive delta past the marginal statistic (observed 0.7us on
        a 33 MB-read kernel = 24 TB/s); retry, else flag."""
        for _ in range(3):
            t = bench_fn(fn, args, iters=iters, reps=reps)
            if bench_fn.last_fallback:
                return t, True
            if plausible(t, nbytes):
                return t, False
        return t, True

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    rows = []
    print("| model | gemm | M | K | N | bf16 µs | W6A8 µs | W4A8 µs | W6 vs bf16 | W4 vs bf16 |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for model, gemm, k, n in shapes:
        wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
        hi, lo = pack6(jnp.asarray(wq))
        q4 = pack4(jnp.asarray(np.clip(wq, -8, 7)))
        ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
        wb = jnp.asarray(wq, jnp.bfloat16)
        for m in ms:
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)
            xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            t6, fb6 = measure(
                lambda a, b, c, d, e: w6_matmul(a, b, c, d, e, out_dtype=jnp.bfloat16),
                (xq, xs, hi, lo, ws), k * n * 6 // 8,
            )
            t4, fb4 = measure(
                lambda a, b, c, d: w4_matmul(a, b, c, d, out_dtype=jnp.bfloat16),
                (xq, xs, q4, ws), k * n // 2,
            )
            tb, fbb = measure(lambda x, w: x @ w, (xb, wb), k * n * 2)
            row = {
                "model": model, "gemm": gemm, "M": m, "K": k, "N": n,
                "bf16_us": round(tb * 1e6, 1),
                "w6a8_us": round(t6 * 1e6, 1),
                "w4a8_us": round(t4 * 1e6, 1),
                "w6_speedup": round(tb / t6, 3),
                "w4_speedup": round(tb / t4, 3),
                "fallback": bool(fb6 or fb4 or fbb),
            }
            rows.append(row)
            print(
                f"| {model} | {gemm} | {m} | {k} | {n} | {row['bf16_us']} | "
                f"{row['w6a8_us']} | {row['w4a8_us']} | {row['w6_speedup']}x | "
                f"{row['w4_speedup']}x |"
                + (" FB" if row["fallback"] else ""),
                flush=True,
            )
        del wq, hi, lo, q4, ws, wb

    clean = [r for r in rows if not r["fallback"]]
    summary = {
        "rows": rows,
        "avg_w6_speedup": round(float(np.mean([r["w6_speedup"] for r in clean])), 3),
        "avg_w4_speedup": round(float(np.mean([r["w4_speedup"] for r in clean])), 3),
        "by_m": {
            str(m): {
                "w6": round(float(np.mean(
                    [r["w6_speedup"] for r in clean if r["M"] == m])), 3),
                "w4": round(float(np.mean(
                    [r["w4_speedup"] for r in clean if r["M"] == m])), 3),
            }
            for m in ms
        },
        "fallback_rows_excluded": len(rows) - len(clean),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
