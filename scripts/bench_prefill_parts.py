"""Differential phase breakdown of 7B prefill at L=2048 (VERDICT r3 #2).

Times the REAL e2e prefill graph with individual components replaced by
identities (monkeypatched at trace time), so each delta is that component's
in-situ cost — robust against axon micro-bench artifacts (isolated-kernel
timings here have disagreed with e2e arithmetic by 2x; see CLAUDE.md timing
notes).

Variants:
  full        the shipping prefill (GLU-fused FFN, last_only head)
  no_attn     _attend -> q passthrough     (flash-prefill + glue cost)
  no_ffn      FFN act+down skipped         (FFN GEMM cost)
  no_qkvo     q/k/v/o GEMMs skipped        (attention-side GEMM cost)
  no_norm     rmsnorm -> identity          (norm cost)

Run: nohup python scripts/bench_prefill_parts.py > /tmp/prefill_parts.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import flexq_tpu.models.quantized as Q
from flexq_tpu.config import QuantPolicy
from flexq_tpu.serve.engine import prefill_mask

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import MAX_LEN, make_cache, synth_llama7b_quantized  # noqa: E402

L = int(os.environ.get("PARTS_L", "2048"))
REPS = 5


def run_variant(name, cfg, policy, qparams):
    def prefill(params, ids, cache):
        logits, kv = Q.forward_serve(
            params, cfg, policy, ids,
            kv_k=cache[0], kv_v=cache[1], cache_pos=jnp.int32(0),
            mask=prefill_mask(L, MAX_LEN), prefill_bf16=True, last_only=True,
        )
        return logits[:, -1], kv

    fn = jax.jit(prefill, donate_argnums=(2,))
    ids = jnp.zeros((1, L), jnp.int32)
    cache = make_cache(cfg, 1, jnp.bfloat16)
    logits, cache = fn(qparams, ids, cache)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(REPS):
        logits, cache = fn(qparams, ids, cache)
    float(jnp.sum(logits))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:10s}: {dt*1e3:7.1f} ms", flush=True)
    return dt


def main():
    policy = QuantPolicy.llama_flex()
    cfg, qparams = synth_llama7b_quantized(policy)

    results = {}
    results["full"] = run_variant("full", cfg, policy, qparams)

    # --- no_attn: _attend -> broadcast of q (keeps shapes, kills the kernel)
    orig_attend = Q._attend

    def fake_attend(q, kv_view, mask, groups, lengths=None):
        b, l, h, d = q.shape
        return q.reshape(b, l, h * d)

    Q._attend = fake_attend
    try:
        results["no_attn"] = run_variant("no_attn", cfg, policy, qparams)
    finally:
        Q._attend = orig_attend

    # --- no_ffn: GLU+down replaced by a zeros residual add
    orig_layer = Q.llama_layer_serve_prefill

    def layer_no_ffn(lp, cfg2, x, cos, sin, mask, kv=None, cache_pos=None,
                     tp_axis=None, lengths=None):
        from flexq_tpu.models.llama import rmsnorm
        b, l, hidden = x.shape
        dtype = x.dtype
        x2 = x.reshape(b * l, hidden)
        h = rmsnorm(x2, lp["input_norm"], cfg2.norm_eps)
        nq = cfg2.num_heads * cfg2.head_dim
        nkv = cfg2.num_kv_heads * cfg2.head_dim
        q = Q._qlinear_bf16(lp["q_proj"], h, dtype, nq).reshape(b, l, cfg2.num_heads, cfg2.head_dim)
        k = Q._qlinear_bf16(lp["k_proj"], h, dtype, nkv).reshape(b, l, cfg2.num_kv_heads, cfg2.head_dim)
        v = Q._qlinear_bf16(lp["v_proj"], h, dtype, nkv).reshape(b, l, cfg2.num_kv_heads, cfg2.head_dim)
        from flexq_tpu.models.llama import apply_rope
        q, k = apply_rope(q, k, cos, sin)
        new_kv = None
        if kv is not None:
            new_kv, kv_view = Q._kv_write_read(kv, k, v, cache_pos, dtype)
        else:
            kv_view = ("dense", k, v)
        attn = Q._attend(q, kv_view, mask, cfg2.num_kv_groups, lengths)
        o = Q._qlinear_bf16(lp["o_proj"], attn.reshape(b * l, nq), dtype, hidden)
        x2 = x2 + o
        h = rmsnorm(x2, lp["post_norm"], cfg2.norm_eps)  # keep norm cost
        x2 = x2 + 0.0 * h  # FFN dropped
        return x2.reshape(b, l, hidden), new_kv

    Q.llama_layer_serve_prefill = layer_no_ffn
    try:
        results["no_ffn"] = run_variant("no_ffn", cfg, policy, qparams)
    finally:
        Q.llama_layer_serve_prefill = orig_layer

    # --- no_qkvo: qkv/o GEMMs replaced by slices/zeros (attention + FFN kept)
    def layer_no_qkvo(lp, cfg2, x, cos, sin, mask, kv=None, cache_pos=None,
                      tp_axis=None, lengths=None):
        from flexq_tpu.models.llama import rmsnorm
        b, l, hidden = x.shape
        dtype = x.dtype
        x2 = x.reshape(b * l, hidden)
        h = rmsnorm(x2, lp["input_norm"], cfg2.norm_eps)
        q = h.reshape(b, l, cfg2.num_heads, cfg2.head_dim)
        k = h.reshape(b, l, cfg2.num_kv_heads, -1)[..., : cfg2.head_dim]
        v = k
        from flexq_tpu.models.llama import apply_rope
        q, k = apply_rope(q, k, cos, sin)
        new_kv = None
        if kv is not None:
            new_kv, kv_view = Q._kv_write_read(kv, k, v, cache_pos, dtype)
        else:
            kv_view = ("dense", k, v)
        attn = Q._attend(q, kv_view, mask, cfg2.num_kv_groups, lengths)
        x2 = x2 + attn.reshape(b * l, hidden)
        h = rmsnorm(x2, lp["post_norm"], cfg2.norm_eps)
        from flexq_tpu.kernels.w6_matmul import w6_glu_matmul_bf16
        gq, uq = lp["gate_proj"], lp["up_proj"]
        act = w6_glu_matmul_bf16(
            h, gq["hi"], gq["lo"], gq["scale"], uq["hi"], uq["lo"], uq["scale"],
            act="silu", out_dtype=dtype,
        )
        down = Q._qlinear_bf16(lp["down_proj"], act, dtype, hidden)
        x2 = x2 + down
        return x2.reshape(b, l, hidden), new_kv

    Q.llama_layer_serve_prefill = layer_no_qkvo
    try:
        results["no_qkvo"] = run_variant("no_qkvo", cfg, policy, qparams)
    finally:
        Q.llama_layer_serve_prefill = orig_layer

    full = results["full"]
    print("\n--- breakdown (deltas vs full) ---", flush=True)
    for k, v in results.items():
        if k != "full":
            print(f"{k:10s}: {1e3*(full - v):7.1f} ms", flush=True)
    flops = 2 * 6.61e9 * L
    print(f"full TTFT {full*1e3:.1f} ms = {flops/full/1e12:.0f} TF/s-equivalent",
          flush=True)


if __name__ == "__main__":
    main()
