"""W4 kernel TPU validation + micro-benchmark.

Checks the SWAR nibble unpack legalizes under Mosaic on real hardware
(interpret-mode CI can't catch that) and measures decode-shape streaming:
w4_matmul (W4A8 exact) and w4_matmul_bf16 (W4A16 weight-only, the
reference's int8_mode=4 baseline) vs w6_matmul and the bf16 dense dot.

Run:  nohup python scripts/bench_w4.py > /tmp/bench_w4.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flexq_tpu.kernels import w4_matmul, w4_matmul_bf16, w4_matmul_ref, w6_matmul
from flexq_tpu.kernels.w4_matmul import w4_matmul_bf16_ref
from flexq_tpu.packing import pack4, pack6
from flexq_tpu.utils.benchmark import bandwidth_gbs, bench_fn

# LLaMA-7B decode shapes (M=1/8): qkv, out, gate/up, down
SHAPES = [
    (1, 4096, 12288),
    (1, 4096, 4096),
    (1, 4096, 22016),
    (1, 11264, 4096),
    (8, 4096, 12288),
    (8, 11264, 4096),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # --- correctness on real hardware -----------------------------------
    for m, k, n in [(1, 512, 256), (8, 1024, 384)]:
        xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
        xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // 128)), jnp.float32)
        wq = rng.integers(-8, 8, (k, n)).astype(np.int8)
        ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // 128, n)), jnp.float32)
        plane = pack4(jnp.asarray(wq))
        got = np.asarray(w4_matmul(xq, xs, plane, ws, out_dtype=jnp.float32))
        want = np.asarray(w4_matmul_ref(xq, xs, plane, ws))
        err = np.abs(got - want).max()
        print(f"w4a8 exactness m{m} k{k} n{n}: maxerr {err:.2e}", flush=True)
        assert err < 1e-3 * max(1.0, np.abs(want).max()), (m, k, n)

        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        got = np.asarray(w4_matmul_bf16(x, plane, ws, out_dtype=jnp.float32))
        want = np.asarray(w4_matmul_bf16_ref(x, plane, ws))
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        print(f"w4a16 m{m} k{k} n{n}: relerr {err:.2e}", flush=True)
        assert err < 3e-2

    # --- decode-shape streaming ------------------------------------------
    print(f"\n{'shape':>22} {'bf16us':>8} {'w6us':>7} {'w4us':>7} {'w4a16us':>8}"
          f" {'w4GB/s':>7} {'v6':>5} {'vbf16':>6}", flush=True)
    for m, k, n in SHAPES:
        xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
        xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // 128)), jnp.float32)
        wq6 = rng.integers(-32, 32, (k, n)).astype(np.int8)
        wq4 = rng.integers(-8, 8, (k, n)).astype(np.int8)
        ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // 128, n)), jnp.float32)
        hi, lo = pack6(jnp.asarray(wq6))
        plane = pack4(jnp.asarray(wq4))
        x16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wd = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        t_bf = bench_fn(lambda a, b: a @ b, (x16, wd), iters=150)
        t_w6 = bench_fn(
            lambda a, b, c, d, e: w6_matmul(a, b, c, d, e), (xq, xs, hi, lo, ws),
            iters=150,
        )
        t_w4 = bench_fn(
            lambda a, b, c, d: w4_matmul(a, b, c, d), (xq, xs, plane, ws),
            iters=150,
        )
        t_w4b = bench_fn(
            lambda a, c, d: w4_matmul_bf16(a, c, d), (x16, plane, ws), iters=150
        )
        gbs = bandwidth_gbs(k * n // 2, t_w4)
        print(
            f"{f'{m}x{k}x{n}':>22} {t_bf*1e6:8.1f} {t_w6*1e6:7.1f} "
            f"{t_w4*1e6:7.1f} {t_w4b*1e6:8.1f} {gbs:7.0f} "
            f"{t_w6/t_w4:5.2f} {t_bf/t_w4:6.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
