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
from flexq_tpu.models.quantized import forward_serve

MAX_LEN = int(os.environ.get("FLEXQ_BENCH_MAXLEN", "2048"))


_MODEL_DIMS = {
    # hidden, intermediate, layers, heads, kv_heads (LLaMA family shapes)
    "7b": (4096, 11008, 32, 32, 32),
    "13b": (5120, 13824, 40, 40, 40),  # BASELINE config 3 scale
    "8b": (4096, 14336, 32, 32, 8),  # LLaMA-3-8B (GQA) — config 4 scale
    "opt-13b": (5120, 20480, 40, 40, 40),  # OPT-13B (ffn = 4h)
    "opt-30b": (7168, 28672, 48, 56, 56),  # OPT-30B (reference kernel shapes)
    "tiny": (256, 1024, 2, 4, 4),  # CPU smoke-testing of bench scripts
}


def synth_llama7b_quantized(policy, seed: int = 0):
    """Generate synthetic weights on device and quantize LAYER BY LAYER
    (a whole dense bf16 tree is ~13.5 GB at 7B and cannot coexist with the
    packed tree on a 16 GB chip). FLEXQ_BENCH_MODEL picks 7b/13b/8b."""
    from flexq_tpu.models.quantized import quantize_linear

    h, f, nl, nh, nkv = _MODEL_DIMS[os.environ.get("FLEXQ_BENCH_MODEL", "7b")]
    window = int(os.environ.get("FLEXQ_BENCH_WINDOW", "0")) or None
    cfg = ModelConfig.llama(
        vocab_size=32000,
        hidden_size=h,
        intermediate_size=f,
        num_layers=nl,
        num_heads=nh,
        num_kv_heads=nkv,
        max_seq_len=MAX_LEN,
        sliding_window=window,  # Mistral-7B shape: FLEXQ_BENCH_WINDOW=4096
    )
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, cfg.num_layers + 3)
    h, f = cfg.hidden_size, cfg.intermediate_size
    ffn_pad = f + ((-f) % 1024)
    fuse = bool(int(os.environ.get("FLEXQ_BENCH_FUSE", "0")))
    if fuse:
        shapes = {
            "qkv_proj": (h, 3 * h), "o_proj": (h, h),
            "gate_up": (h, 2 * ffn_pad), "down_proj": (f, h),
        }
    else:
        shapes = {
            "q_proj": (h, h), "k_proj": (h, h), "v_proj": (h, h), "o_proj": (h, h),
            "gate_proj": (h, f), "up_proj": (h, f), "down_proj": (f, h),
        }
    head_spec = policy.weight_spec("lm_head")
    layers = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], len(shapes))
        ql = {
            "input_norm": jnp.ones((h,), jnp.bfloat16),
            "post_norm": jnp.ones((h,), jnp.bfloat16),
        }
        for (name, (kk, nn)), sk in zip(shapes.items(), ks):
            dense = jax.random.normal(sk, (kk, nn), jnp.bfloat16) * 0.02
            spec_name = {"qkv_proj": "q_proj", "gate_up": "gate_proj"}.get(name, name)
            ql[name] = quantize_linear(
                dense,
                policy.weight_spec(spec_name),
                k_pad_to=ffn_pad if name == "down_proj" else None,
            )
            ql[name] = jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), ql[name]
            )
            del dense
        layers.append(ql)
        print(f"  layer {i+1}/{cfg.num_layers} quantized", flush=True)
    head = jax.random.normal(keys[-2], (h, cfg.vocab_size), jnp.bfloat16) * 0.02
    if head_spec.enabled:  # FLEXQ_BENCH_HEAD: packed vocab GEMM
        head = quantize_linear(head, head_spec)
    params = {
        "embed": jax.random.normal(keys[-3], (cfg.vocab_size, h), jnp.bfloat16) * 0.02,
        "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": head,
        "layers": layers,
    }
    return cfg, params


def synth_opt_quantized(policy, seed: int = 0):
    """Synthetic OPT at opt-13b/opt-30b scale (FLEXQ_BENCH_MODEL), quantized
    layer by layer on device (same memory discipline as the llama synth).
    OPT layers: biased q/k/v/o + fc1/fc2, LayerNorm g/b pairs, learned
    position embeddings (reference multi_gpu_gpt / ParallelGptDecoder)."""
    from flexq_tpu.models.quantized import quantize_linear

    h, f, nl, nh, nkv = _MODEL_DIMS[os.environ.get("FLEXQ_BENCH_MODEL", "opt-13b")]
    cfg = ModelConfig.opt(
        vocab_size=50272,
        hidden_size=h,
        intermediate_size=f,
        num_layers=nl,
        num_heads=nh,
        max_seq_len=MAX_LEN,
    )
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, cfg.num_layers + 4)
    ffn_pad = f + ((-f) % 1024)
    shapes = {
        "q_proj": (h, h), "k_proj": (h, h), "v_proj": (h, h), "o_proj": (h, h),
        "fc1": (h, f), "fc2": (f, h),
    }
    layers = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], len(shapes))
        ql = {
            "input_norm": {"g": jnp.ones((h,), jnp.bfloat16),
                           "b": jnp.zeros((h,), jnp.bfloat16)},
            "post_norm": {"g": jnp.ones((h,), jnp.bfloat16),
                          "b": jnp.zeros((h,), jnp.bfloat16)},
        }
        for (name, (kk, nn)), sk in zip(shapes.items(), ks):
            dense = jax.random.normal(sk, (kk, nn), jnp.bfloat16) * 0.02
            spec = policy.weight_spec(name)
            q = quantize_linear(
                dense, spec, k_pad_to=ffn_pad if name == "fc2" else None
            )
            bdim = ffn_pad if name == "fc1" else nn
            q["b"] = jnp.zeros((bdim,), jnp.bfloat16)
            ql[name] = jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), q
            )
            del dense
        layers.append(ql)
        print(f"  layer {i+1}/{cfg.num_layers} quantized", flush=True)
    params = {
        "embed": jax.random.normal(keys[-3], (cfg.vocab_size, h), jnp.bfloat16) * 0.02,
        "pos_embed": jax.random.normal(keys[-4], (MAX_LEN + 2, h), jnp.bfloat16) * 0.02,
        "final_norm": {"g": jnp.ones((h,), jnp.bfloat16),
                       "b": jnp.zeros((h,), jnp.bfloat16)},
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
            mask=decode_mask(pos, MAX_LEN, cfg.sliding_window),
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
    if len(sys.argv) > 1:
        from flexq_tpu.kernels import autotune
        n = autotune.load_table(sys.argv[1])
        print(f"loaded tuned table {sys.argv[1]} ({n} entries)", flush=True)
    print("devices:", jax.devices(), flush=True)
    wbits = os.environ.get("FLEXQ_BENCH_WBITS")
    if wbits == "8":
        # the reference's central e2e comparison: FlexQ W6Ax vs SmoothQuant
        # W8A8 (README.md:193: 1.25-1.33x) — run with WBITS=8 for the
        # baseline side
        policy = QuantPolicy.uniform("llama", wbits=8, abits=8)
        print("policy: uniform W8A8 (SmoothQuant-baseline path)", flush=True)
    elif wbits == "4":
        # exceeds-parity W4A8: 4-bit planes are 1.5x smaller than W6, so
        # weight-stream-bound decode should gain proportionally
        policy = QuantPolicy.uniform("llama", wbits=4, abits=8)
        print("policy: uniform W4A8 (exact-int path)", flush=True)
    elif wbits == "4a16":
        # the reference's int8_mode=4 weight-only baseline
        policy = QuantPolicy.weight_only("llama", wbits=4)
        print("policy: W4A16 weight-only (fpA_intB-baseline path)", flush=True)
    elif wbits == "8a16":
        # the reference's int8_mode=1 weight-only baseline (README.md:157)
        policy = QuantPolicy.weight_only("llama", wbits=8)
        print("policy: W8A16 weight-only (int8_mode=1-baseline path)", flush=True)
    else:
        policy = QuantPolicy.llama_flex()
    head_bits = int(os.environ.get("FLEXQ_BENCH_HEAD", "0"))
    if head_bits:
        policy = policy.with_head(
            head_bits, abits=16 if policy.no_act_quant else 8
        )
        print(f"lm_head quantized at W{head_bits}", flush=True)
    print("generating + quantizing layer-by-layer...", flush=True)
    cfg, qparams = synth_llama7b_quantized(policy)
    results = {}
    kv_kinds = ((jnp.bfloat16, "kv_bf16"), (jnp.int8, "kv_int8"))
    if os.environ.get("FLEXQ_BENCH_KV") == "int8":
        # 13B + bf16 B=4 cache exceeds 16 GB; int8 KV is the fitting config
        kv_kinds = ((jnp.int8, "kv_int8"),)
    batches = tuple(
        int(b) for b in os.environ.get("FLEXQ_BENCH_BS", "1,4").split(",")
    )
    for cache_dtype, tag in kv_kinds:
        fn = decode_step_fn(cfg, policy, cache_dtype == jnp.int8)
        step = _Step(fn, cfg, cache_dtype)
        for b in batches:
            for pos0 in (256, MAX_LEN - 68):
                key = f"{tag}_B{b}_pos{pos0}"
                print(f"bench {key} ...", flush=True)
                dt = time_steps(step, qparams, b, pos0)
                results[key] = dt * 1e3
                print(f"  {key}: {dt*1e3:.3f} ms/step", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
