"""Kernel-level A/B: fused GLU (w6_glu_matmul_bf16) vs unfused
gate/up/silu chain at the 7B prefill FFN shape, with a block sweep.

Run: nohup python scripts/bench_glu.py > /tmp/bench_glu.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.kernels.w6_matmul import w6_glu_matmul_bf16, w6_matmul_bf16
from flexq_tpu.packing import pack6


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(jnp.sum(out))  # true sync (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def main():
    m, k, n = 2048, 4096, 11264  # 7B gate/up padded
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    planes = []
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        wq = r.integers(-32, 32, (k, n), dtype=np.int64).astype(np.int8)
        ws = r.uniform(0.01, 0.1, (k // 128, n)).astype(np.float32)
        hi, lo = pack6(jnp.asarray(wq))
        planes.append((hi, lo, jnp.asarray(ws)))
    (ghi, glo, gs), (uhi, ulo, us) = planes

    flops = 4 * m * k * n  # two GEMMs

    def unfused(x):
        g = w6_matmul_bf16(x, ghi, glo, gs)
        u = w6_matmul_bf16(x, uhi, ulo, us)
        return (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
            jnp.bfloat16
        )

    dt = timeit(jax.jit(unfused), x)
    print(f"unfused chain: {dt*1e3:.2f} ms ({flops/dt/1e12:.0f} TF/s)", flush=True)

    dtg = timeit(jax.jit(lambda x: w6_glu_matmul_bf16(x, ghi, glo, gs, uhi, ulo, us)), x)
    print(f"glu auto: {dtg*1e3:.2f} ms ({flops/dtg/1e12:.0f} TF/s)", flush=True)

    for bm, bn, bk in [
        (256, 2048, 512), (512, 1024, 512), (256, 1024, 512),
        (512, 2048, 256), (256, 2048, 256), (512, 512, 512),
        (1024, 1024, 512), (256, 2816, 512),
    ]:
        if n % bn or k % bk:
            continue
        try:
            f = jax.jit(
                lambda x, bm=bm, bn=bn, bk=bk: w6_glu_matmul_bf16(
                    x, ghi, glo, gs, uhi, ulo, us,
                    block_m=bm, block_n=bn, block_k=bk,
                )
            )
            dt = timeit(f, x)
            print(f"glu ({bm},{bn},{bk}): {dt*1e3:.2f} ms ({flops/dt/1e12:.0f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"glu ({bm},{bn},{bk}): FAIL {str(e)[:120]}", flush=True)

    # plain kernel block check at the same shape for reference
    for bm, bn, bk in [(512, 2048, 512), (256, 2048, 512)]:
        f = jax.jit(
            lambda x, bm=bm, bn=bn, bk=bk: w6_matmul_bf16(
                x, ghi, glo, gs, block_m=bm, block_n=bn, block_k=bk
            )
        )
        dt = timeit(f, x)
        print(f"single ({bm},{bn},{bk}): {dt*1e3:.2f} ms "
              f"({flops/2/dt/1e12:.0f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
