"""7B-scale end-to-end decode benchmark on real TPU (synthetic weights).

Measures ms/decode-step for the quantized serve path across KV-cache dtypes
and batch sizes, at short and long cache fill (the flash-decode kernel reads
only ceil(len/BS) blocks, so short-fill steps should be much faster than
full-cache masked reads).

Run (ONE TPU process at a time, never under `timeout` — see CLAUDE.md):
    nohup python scripts/bench_e2e7b.py > /tmp/e2e7b.log 2>&1 &

Synthetic weights are generated on device; params are passed as jit ARGS
(closure capture would bake ~5 GB of constants into the executable).
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

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.models.quantized import forward_serve, quantize_params

MAX_LEN = 2048


def synth_llama7b(seed: int = 0):
    cfg = ModelConfig.llama(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        max_seq_len=MAX_LEN,
    )
    key = jax.random.PRNGKey(seed)

    def w(key, k, n):
        return {"w": jax.random.normal(key, (k, n), jnp.bfloat16) * 0.02}

    keys = jax.random.split(key, cfg.num_layers + 3)
    h, f = cfg.hidden_size, cfg.intermediate_size
    layers = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append(
            {
                "input_norm": jnp.ones((h,), jnp.bfloat16),
                "post_norm": jnp.ones((h,), jnp.bfloat16),
                "q_proj": w(ks[0], h, h),
                "k_proj": w(ks[1], h, h),
                "v_proj": w(ks[2], h, h),
                "o_proj": w(ks[3], h, h),
                "gate_proj": w(ks[4], h, f),
                "up_proj": w(ks[5], h, f),
                "down_proj": w(ks[6], f, h),
            }
        )
    params = {
        "embed": jax.random.normal(keys[-3], (cfg.vocab_size, h), jnp.bfloat16) * 0.02,
        "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": jax.random.normal(keys[-2], (h, cfg.vocab_size), jnp.bfloat16) * 0.02,
        "layers": layers,
    }
    return cfg, params


def make_cache(cfg, b, dtype):
    shape = (cfg.num_layers, b, cfg.num_kv_heads, MAX_LEN, cfg.head_dim)
    k = jnp.zeros(shape, dtype)
    v = jnp.zeros(shape, dtype)
    if dtype == jnp.int8:
        s = shape[:-1]
        return (k, v, jnp.full(s, 0.01, jnp.float32), jnp.full(s, 0.01, jnp.float32))
    return (k, v)


def decode_step_fn(cfg, policy, quant_cache):
    from flexq_tpu.serve.engine import decode_mask

    def step(params, ids, cache, pos):
        scales = (
            {"kv_k_scale": cache[2], "kv_v_scale": cache[3]} if quant_cache else {}
        )
        logits, kv = forward_serve(
            params,
            cfg,
            policy,
            ids,
            positions=jnp.broadcast_to(pos, (ids.shape[0], 1)),
            kv_k=cache[0],
            kv_v=cache[1],
            cache_pos=pos,
            mask=decode_mask(pos, MAX_LEN),
            **scales,
        )
        return logits[:, 0], kv

    return jax.jit(step, donate_argnums=(2,))


def time_steps(step, params, b, pos0, iters=60):
    ids = jnp.zeros((b, 1), jnp.int32)
    cache = make_cache(step.cfg, b, step.cache_dtype)
    # warmup/compile
    logits, cache = step.fn(params, ids, cache, jnp.int32(pos0))
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    pos = pos0 + 1
    for i in range(iters):
        logits, cache = step.fn(params, ids, cache, jnp.int32(pos + i))
        if i == iters - 1:
            float(jnp.sum(logits))  # true sync: value fetch
    dt = (time.perf_counter() - t0) / iters
    return dt


class _Step:
    def __init__(self, fn, cfg, cache_dtype):
        self.fn = fn
        self.cfg = cfg
        self.cache_dtype = cache_dtype


def main():
    print("devices:", jax.devices(), flush=True)
    cfg, dense = synth_llama7b()
    policy = QuantPolicy.llama_flex()
    print("quantizing...", flush=True)
    qparams = quantize_params(dense, cfg, policy, dtype=jnp.bfloat16)
    del dense
    qparams = jax.tree_util.tree_map(lambda x: x.block_until_ready(), qparams)
    results = {}
    for cache_dtype, tag in ((jnp.bfloat16, "kv_bf16"), (jnp.int8, "kv_int8")):
        fn = decode_step_fn(cfg, policy, cache_dtype == jnp.int8)
        step = _Step(fn, cfg, cache_dtype)
        for b in (1, 4):
            for pos0 in (256, 1980):
                key = f"{tag}_B{b}_pos{pos0}"
                print(f"bench {key} ...", flush=True)
                dt = time_steps(step, qparams, b, pos0)
                results[key] = dt * 1e3
                print(f"  {key}: {dt*1e3:.3f} ms/step", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
