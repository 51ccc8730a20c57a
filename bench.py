#!/usr/bin/env python
"""Headline benchmark for the driver — prints ONE JSON line.

Metric: average W6A8 Pallas-kernel speedup vs the bf16 dense matmul on the
reference's kernel workload matrix (engine/test_flexq_kernel.sh shapes:
decode M ∈ {1, 8} × the qkv/out/gate/down GEMMs of LLaMA-7B and LLaMA-2-70B).
`vs_baseline` normalizes by the reference's headline kernel speedup on GPU
(1.78× vs cuBLAS W8A8, README.md:189): > 1.0 means this TPU build beats the
reference's own relative win.

Timing methodology: flexq_tpu/utils/benchmark.py (in-graph loop, marginal
time, value-fetch sync — see that module for why).

Run: python bench.py [--quick]
"""

import json
import sys

import numpy as np


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    from flexq_tpu.kernels import w6_matmul
    from flexq_tpu.packing import pack6
    from flexq_tpu.utils import bench_fn

    G = 128
    rng = np.random.default_rng(0)

    # (K, N): qkv (fused), out, gate/up (padded to 11264, see quantize_linear),
    # down of LLaMA-7B; gate/down of LLaMA-2-70B
    shapes_7b = [(4096, 12288), (4096, 4096), (4096, 11264), (11008, 4096)]
    shapes_70b = [(8192, 28672), (28672, 8192)]
    shapes = shapes_7b if quick else shapes_7b + shapes_70b
    ms = [8] if quick else [1, 8]

    HBM_PEAK = 819e9  # v5e; implied BW above ~1.2x peak = timing artifact

    def measure(fn, args, nbytes, clamp=False):
        """bench_fn + the bench_matrix physical sanity gate: an axon stall
        can slip a tiny positive delta past the marginal statistic (observed
        here: 10us on a 12.6 MB-plane decode GEMM = 1.3 TB/s). Retry up to
        3x; if still implausible and ``clamp`` (the w6 side), raise the time
        to the 1.2x-peak byte floor so an artifact can only understate the
        headline, never inflate it. The bf16 side is never clamped — an
        implausibly fast baseline only deflates the ratio (conservative)."""
        iters, reps = (100, 3) if quick else (300, 7)
        # reps=7: the axon tunnel adds +-10% run-to-run jitter; a 3-rep
        # median left the headline metric noise-bound (2.56-2.67x observed
        # across identical-code runs)
        for _ in range(3):
            t = bench_fn(fn, args, iters=iters, reps=reps)
            if bench_fn.last_fallback:
                return t, "fallback"
            if nbytes / max(t, 1e-9) < 1.2 * HBM_PEAK:
                return t, ""
        if clamp:
            return max(t, nbytes / (1.2 * HBM_PEAK)), "clamped"
        return t, "implausible"

    speedups = []
    details = []
    for m in ms:
        for k, n in shapes:
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)
            wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
            ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
            hi, lo = pack6(jnp.asarray(wq))
            t_q, flag_q = measure(
                lambda a, b, c, d, e: w6_matmul(a, b, c, d, e, out_dtype=jnp.bfloat16),
                (xq, xs, hi, lo, ws),
                k * n * 6 // 8,
                clamp=True,
            )
            xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            wb = jnp.asarray(wq, jnp.bfloat16)
            t_b, flag_b = measure(lambda x, w: x @ w, (xb, wb), k * n * 2)
            sp = t_b / t_q
            speedups.append(sp)
            note = ""
            if flag_b == "fallback":  # baseline overstated -> ratio inflated
                note = " [FALLBACK on bf16 side: ratio may be inflated]"
            elif flag_q == "fallback":  # candidate overstated: benign
                note = " [fallback on w6 side: ratio conservative]"
            if flag_q == "clamped":
                note += " [w6 clamped to byte floor]"
            if flag_b == "implausible":
                note += " [bf16 implausibly fast: ratio conservative]"
            details.append(
                f"M={m} K={k} N={n}: w6 {t_q*1e6:.0f}us bf16 {t_b*1e6:.0f}us {sp:.2f}x"
                + note
            )
            print(details[-1], file=sys.stderr, flush=True)

    avg = float(np.mean(speedups))
    print(
        json.dumps(
            {
                "metric": "w6a8_kernel_speedup_vs_bf16_avg",
                "value": round(avg, 3),
                "unit": "x",
                "vs_baseline": round(avg / 1.78, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
