"""Fused-rope W6A16 GEMM epilogue (kernels/w6_matmul.py _w6_bf16_rope_kernel).

The prefill layer fuses HF half-rotate RoPE into the q/k projection kernels
when head_dim == 128 (one head per 128-lane output group). Golden checks:
the kernel epilogue must match apply_rope-after-GEMM exactly, and the
layer-level fused path must agree with the unfused path (same math, one
fewer bf16 rounding on q/k)."""

import copy

import numpy as np
import pytest
import jax.numpy as jnp

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.kernels.w6_matmul import w6_matmul_bf16
from flexq_tpu.models.llama import (
    apply_rope,
    rope_cos_sin,
    rope_gemm_operands,
)
from flexq_tpu.packing import pack6
from flexq_tpu.quant import QuantSpec, quantize


def _pack(w):
    spec = QuantSpec(6, True, 128)
    k, n = w.shape
    q, s, _ = quantize(jnp.asarray(w).T, spec)
    q = q.reshape(n, k).T
    s = s.reshape(n, k // 128).T
    hi, lo = pack6(q)
    return hi, lo, s


@pytest.mark.parametrize("m", [8, 96])  # ragged + multi-block M
def test_rope_epilogue_matches_apply_rope(m):
    rng = np.random.default_rng(0)
    K, N = 256, 512  # 4 heads of 128
    x = jnp.asarray(rng.standard_normal((m, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    hi, lo, s = _pack(w)

    pos = jnp.arange(m, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin(pos, 128, 10000.0)
    cos_f, sin2_f = rope_gemm_operands(cos, sin)

    out = w6_matmul_bf16(
        x, hi, lo, s, out_dtype=jnp.float32, rope_cos=cos_f, rope_sin2=sin2_f
    )
    base = w6_matmul_bf16(x, hi, lo, s, out_dtype=jnp.float32)
    bh = base.reshape(1, m, N // 128, 128)
    ref, _ = apply_rope(bh, bh, cos, sin)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(m, N)), atol=1e-4
    )


def _tiny_head128_model():
    rng = np.random.default_rng(1)
    cfg = ModelConfig.llama(
        vocab_size=128,
        hidden_size=256,
        intermediate_size=256,
        num_layers=2,
        num_heads=2,
        num_kv_heads=1,  # GQA
        max_seq_len=64,  # head_dim = hidden/heads = 128
    )

    def lin(k, n):
        return {"w": jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)}

    h, ffn = cfg.hidden_size, cfg.intermediate_size
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    layers = [
        {
            "input_norm": jnp.ones((h,), jnp.float32),
            "post_norm": jnp.ones((h,), jnp.float32),
            "q_proj": lin(h, nq),
            "k_proj": lin(h, nkv),
            "v_proj": lin(h, nkv),
            "o_proj": lin(nq, h),
            "gate_proj": lin(h, ffn),
            "up_proj": lin(h, ffn),
            "down_proj": lin(ffn, h),
        }
        for _ in range(cfg.num_layers)
    ]
    params = {
        "embed": jnp.asarray(
            rng.standard_normal((cfg.vocab_size, h)) * 0.1, jnp.float32
        ),
        "final_norm": jnp.ones((h,), jnp.float32),
        "layers": layers,
    }
    return cfg, params


def test_prefill_layer_fused_rope_matches_unfused():
    """forward_serve prefill at head_dim=128 routes q/k through the fused
    kernel. Disabling the fusion via its structural gate (a zero bias on
    q_proj — numerically inert, but biased projections take the apply_rope
    path) must agree to rounding."""
    from flexq_tpu.models.quantized import forward_serve, quantize_params

    cfg, params = _tiny_head128_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 12)),
                      jnp.int32)

    fused, _ = forward_serve(qparams, cfg, policy, ids, prefill_bf16=True)

    qp2 = copy.copy(qparams)
    qp2["layers"] = [dict(lp) for lp in qparams["layers"]]
    nq = cfg.num_heads * cfg.head_dim
    for lp in qp2["layers"]:
        lp["q_proj"] = dict(lp["q_proj"])
        lp["q_proj"]["b"] = jnp.zeros((nq,), jnp.float32)
    unfused, _ = forward_serve(qp2, cfg, policy, ids, prefill_bf16=True)

    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), rtol=0, atol=2e-4
    )
