"""Decode-step cost breakdown on real TPU (7B shapes, in-graph timing).

Answers CLAUDE.md TODO #1: where does the gap between the measured
~8.5 ms/step (python-loop, per-step dispatch included) and the ~6.6 ms
theoretical floor (weight bytes / HBM BW + lm_head) go?

Uses utils/benchmark.bench_fn (in-graph fori_loop, marginal between two
iteration counts) so each row excludes python dispatch; comparing the
"full step (in-graph)" row against the python-loop number from
scripts/bench_e2e7b.py isolates dispatch overhead.

Run:  nohup python scripts/bench_decode_parts.py > /tmp/parts.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import QuantPolicy
from flexq_tpu.kernels import rmsnorm_quant, glu_quant, quant_act, w6_matmul
from flexq_tpu.kernels.flash_decode import flash_decode
from flexq_tpu.utils.benchmark import bench_fn

H, FFN, FFN_PAD, V = 4096, 11008, 11264, 32000
L, KVH, D, S = 32, 32, 128, 2048


def packed(rng, k, n):
    from flexq_tpu.packing import pack6

    q = jnp.asarray(rng.integers(-32, 32, (k, n)), jnp.int8)
    hi, lo = pack6(q)
    ws = jnp.asarray(rng.uniform(0.01, 0.02, (k // 128, n)), jnp.float32)
    return hi, lo, ws


def main(b: int = 1, pos: int = 256):
    rng = np.random.default_rng(0)
    rows = {}

    # flash decode over the full 32-layer cache (1 layer per call)
    for tag, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        q = jnp.asarray(rng.standard_normal((b, KVH, D)), jnp.bfloat16)
        k = jnp.zeros((L, b, KVH, S, D), dt)
        v = jnp.zeros((L, b, KVH, S, D), dt)
        lens = jnp.full((b,), pos + 1, jnp.int32)
        args = [q, k, v, lens]
        kw = {}
        if dt == jnp.int8:
            ks = jnp.full((L, b, KVH, S), 0.01, jnp.float32)
            args += [ks, ks]
        t = bench_fn(
            lambda q_, k_, v_, l_, *sc: flash_decode(
                q_, k_, v_, l_, *sc, layer_idx=jnp.int32(5)
            ),
            args,
            iters=200,
        )
        rows[f"flash_{tag}_x32"] = t * 32 * 1e3

    # the four quantized matmuls of one layer (M=b)
    xq = jnp.asarray(rng.integers(-32, 32, (b, H)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.02, (b, H // 128)), jnp.float32)
    per_layer = 0.0
    for name, k_, n_ in (
        ("qkv(3x)", H, H),
        ("o", H, H),
        ("gate_up(2x)", H, FFN_PAD),
        ("down", FFN_PAD, H),
    ):
        hi, lo, ws = packed(rng, k_, n_)
        xin = xq if k_ == H else jnp.asarray(rng.integers(-32, 32, (b, k_)), jnp.int8)
        xsin = xs if k_ == H else jnp.asarray(
            rng.uniform(0.01, 0.02, (b, k_ // 128)), jnp.float32
        )
        t = bench_fn(
            lambda a, s_, h_, l_, w_: w6_matmul(a, s_, h_, l_, w_),
            (xin, xsin, hi, lo, ws),
            iters=200,
        )
        mult = 3 if name.startswith("qkv") else (2 if name.startswith("gate") else 1)
        rows[f"mm_{name}"] = t * mult * 1e3
        per_layer += t * mult
    rows["mm_total_x32"] = per_layer * 32 * 1e3

    # fused epilogue kernels (x32)
    x = jnp.asarray(rng.standard_normal((b, H)), jnp.bfloat16)
    g = jnp.ones((H,), jnp.bfloat16)
    t = bench_fn(lambda a, g_: rmsnorm_quant(a, g_, bits=6), (x, g), iters=200)
    rows["rmsnorm_quant_x64"] = t * 64 * 1e3  # 2 per layer
    gate = jnp.asarray(rng.standard_normal((b, FFN_PAD)), jnp.bfloat16)
    t = bench_fn(lambda a, b_: glu_quant(a, b_, bits=8, act="silu"), (gate, gate), iters=200)
    rows["glu_quant_x32"] = t * 32 * 1e3
    attn = jnp.asarray(rng.standard_normal((b, H)), jnp.bfloat16)
    t = bench_fn(lambda a: quant_act(a, bits=6), (attn,), iters=200)
    rows["quant_act_x32"] = t * 32 * 1e3

    # lm_head
    head = jnp.asarray(rng.standard_normal((H, V)), jnp.bfloat16) * 0.02
    hstate = jnp.asarray(rng.standard_normal((b, H)), jnp.bfloat16)
    t = bench_fn(lambda a, h_: a @ h_, (hstate, head), iters=200)
    rows["lm_head"] = t * 1e3

    # KV quant + cache write (int8 path, x32)
    kstep = jnp.asarray(rng.standard_normal((b, 1, KVH, D)), jnp.bfloat16)
    cache = jnp.zeros((L, b, KVH, S, D), jnp.int8)

    def kv_write(kk, cc):
        from flexq_tpu.models.quantized import _kv_quant

        q8, sc = _kv_quant(kk)
        cc = jax.lax.dynamic_update_slice(
            cc, q8.transpose(0, 2, 1, 3)[None], (5, 0, 0, 100, 0)
        )
        return cc[0, 0, 0, 100].astype(jnp.float32)

    t = bench_fn(kv_write, (kstep, cache), iters=200)
    rows["kv_quant_write_x64"] = t * 64 * 1e3

    total = sum(v for k_, v in rows.items() if k_.endswith(("x32", "x64", "lm_head")))
    print(f"\n== decode parts, B={b} pos={pos} (ms, scaled to full step) ==")
    for k_, v in rows.items():
        print(f"  {k_:>22}: {v:7.3f}")
    print(f"  sum of step parts ≈ {total:.3f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main(b=1, pos=256)
    main(b=4, pos=1980)
