"""Isolate the continuous-batching scheduler's per-tick cost on TPU:
dense vs paged cache x per-token vs fused ticks, plus raw flash_decode vs
flash_decode_paged kernel microbenches on the same 7B shapes.

Run:  nohup python scripts/bench_sched_parts.py > /tmp/schedparts.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import QuantPolicy
from flexq_tpu.serve.scheduler import BatchScheduler

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import synth_llama7b_quantized  # noqa: E402


def kernel_micro():
    """flash_decode (dense) vs flash_decode_paged, 7B: B=4 H=32 D=128,
    max_len 2048, fill 256 and 1024, int8 cache."""
    from flexq_tpu.kernels.flash_decode import flash_decode, flash_decode_paged
    from flexq_tpu.utils import bench_fn

    rng = np.random.default_rng(0)
    b, h, kvh, d, s, L = 4, 32, 32, 128, 2048, 1
    ps = 128
    npages = b * (s // ps) + 1
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    ck = jnp.asarray(rng.integers(-127, 127, (1, b, kvh, s, d)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 127, (1, b, kvh, s, d)), jnp.int8)
    cks = jnp.asarray(rng.uniform(0.01, 0.1, (1, b, kvh, s)), jnp.float32)
    cvs = jnp.asarray(rng.uniform(0.01, 0.1, (1, b, kvh, s)), jnp.float32)
    pk = jnp.asarray(rng.integers(-127, 127, (1, npages, kvh, ps, d)), jnp.int8)
    pv = jnp.asarray(rng.integers(-127, 127, (1, npages, kvh, ps, d)), jnp.int8)
    sk = jnp.asarray(rng.uniform(0.01, 0.1, (1, npages, kvh, ps)), jnp.float32)
    sv = jnp.asarray(rng.uniform(0.01, 0.1, (1, npages, kvh, ps)), jnp.float32)
    table = jnp.asarray(
        np.arange(1, b * (s // ps) + 1).reshape(b, s // ps), jnp.int32
    )
    out = {}
    for fill in (256, 1024):
        lengths = jnp.full((b,), fill, jnp.int32)
        td = bench_fn(
            lambda q_, lg: flash_decode(q_, ck, cv, lg, cks, cvs, layer_idx=0),
            (q, lengths), iters=200, reps=5,
        )
        tp = bench_fn(
            lambda q_, lg: flash_decode_paged(
                q_, pk, pv, table, lg, sk, sv, layer_idx=0
            ),
            (q, lengths), iters=200, reps=5,
        )
        out[f"flash_dense_us_fill{fill}"] = round(td * 1e6, 1)
        out[f"flash_paged_us_fill{fill}"] = round(tp * 1e6, 1)
        print(f"fill {fill}: dense {td*1e6:.1f}us paged {tp*1e6:.1f}us "
              f"({tp/td:.1f}x)", flush=True)
    return out


def sched_ticks(cfg, qparams, policy, paged: bool, fused: int, gen=80):
    sched = BatchScheduler(
        qparams, cfg, policy, num_slots=4, max_seq_len=2048,
        kv_dtype=jnp.int8, paged=paged, page_size=128, fused_tick=fused,
    )
    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, 31000, 128).tolist() for _ in range(4)]
    for p in prompts:
        sched.add_request(p, max_new_tokens=gen, eos_id=-1)
    # admission (+ the first, compile-bearing tick) outside the timed region
    sched.step()
    per_tick = []
    ticks = 0
    while sched.has_work and ticks < 40:
        t0 = time.perf_counter()
        sched.step()
        per_tick.append(time.perf_counter() - t0)
        ticks += 1
    print("   first ticks ms:", [round(t * 1e3, 1) for t in per_tick[:8]],
          flush=True)
    dt = sum(per_tick)
    return dt, ticks


def main():
    print("devices:", jax.devices(), flush=True)
    out = {}
    out.update(kernel_micro())

    policy = QuantPolicy.uniform("llama", wbits=4, abits=8)
    cfg, qparams = synth_llama7b_quantized(policy)
    for paged in (False, True):
        for fused in (0, 8):
            tag = f"{'paged' if paged else 'dense'}_fused{fused}"
            t0 = time.perf_counter()
            dt, ticks = sched_ticks(cfg, qparams, policy, paged, fused)
            toks_per_tick = max(fused, 1) if fused else 1
            ms_tick = dt / max(ticks, 1) * 1e3
            out[tag] = {
                "ms_per_tick": round(ms_tick, 1),
                "ms_per_token_per_slot": round(ms_tick / toks_per_tick, 2),
                "ticks": ticks,
                "total_with_compile_s": round(time.perf_counter() - t0, 1),
            }
            print(f"{tag}: {out[tag]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
