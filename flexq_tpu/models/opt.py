"""Functional OPT decoder (reference algorithm/models/int_opt_layer.py and
e2e multi_gpu_gpt / ParallelGpt path).

OPT specifics vs LLaMA: learned positional embeddings with a +2 offset,
pre-LayerNorm (do_layer_norm_before), biased linears, ReLU MLP, softmax-scaled
query (HF scales q by 1/sqrt(d) before the QK matmul), tied lm_head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.models.llama import attention_core, causal_mask
from flexq_tpu.quant.quantizer import fake_quant

POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset


def layernorm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    h = x.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    y = (h - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _maybe_quant_act(x, name, policy: Optional[QuantPolicy]):
    if policy is None:
        return x
    spec = policy.act_spec(name)
    return fake_quant(x, spec) if spec.enabled else x


def _linear(lp, name, x, policy):
    x = _maybe_quant_act(x, name, policy)
    y = x @ lp[name]["w"].astype(x.dtype)
    b = lp[name].get("b")
    return y + b.astype(y.dtype) if b is not None else y


def decoder_layer(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    x: jax.Array,  # [B, L, H]
    mask: Optional[jax.Array],
    policy: Optional[QuantPolicy] = None,
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
):
    b, l, hidden = x.shape
    res = x
    h = layernorm(x, lp["input_norm"]["g"], lp["input_norm"]["b"], cfg.norm_eps) if cfg.do_layer_norm_before else x
    q = _linear(lp, "q_proj", h, policy).reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = _linear(lp, "k_proj", h, policy).reshape(b, l, cfg.num_heads, cfg.head_dim)
    v = _linear(lp, "v_proj", h, policy).reshape(b, l, cfg.num_heads, cfg.head_dim)

    new_kv = None
    if kv is not None:
        ck, cv, li = kv
        ck = jax.lax.dynamic_update_slice(ck, k[None], (li, 0, cache_pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v[None], (li, 0, cache_pos, 0, 0))
        new_kv = (ck, cv)
        k, v = ck[li], cv[li]

    attn = attention_core(q, k, v, mask, 1)
    attn = _linear(lp, "o_proj", attn, policy)
    x = res + attn
    if not cfg.do_layer_norm_before:
        x = layernorm(x, lp["input_norm"]["g"], lp["input_norm"]["b"], cfg.norm_eps)

    res = x
    h = layernorm(x, lp["post_norm"]["g"], lp["post_norm"]["b"], cfg.norm_eps) if cfg.do_layer_norm_before else x
    h = _linear(lp, "fc1", h, policy)
    h = jnp.maximum(h, 0)
    h = _linear(lp, "fc2", h, policy)
    x = res + h
    if not cfg.do_layer_norm_before:
        x = layernorm(x, lp["post_norm"]["g"], lp["post_norm"]["b"], cfg.norm_eps)
    return x, new_kv


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    ids: jax.Array,
    policy: Optional[QuantPolicy] = None,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    b, l = ids.shape
    x = params["embed"][ids]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(l), (b, l))
    x = x + params["pos_embed"][positions + POS_OFFSET]
    mask = causal_mask(l, l)
    for lp in params["layers"]:
        x, _ = decoder_layer(lp, cfg, x, mask, policy)
    if "final_norm" in params:
        x = layernorm(x, params["final_norm"]["g"], params["final_norm"]["b"], cfg.norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return x @ head.astype(x.dtype)


def fake_quant_weights(params: Dict[str, Any], policy: QuantPolicy) -> Dict[str, Any]:
    """OPT twin of llama.fake_quant_weights."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    for lp in out["layers"]:
        for name in policy.weight_bits:
            if name not in lp:
                continue
            spec = policy.weight_spec(name)
            if not spec.enabled:
                continue
            lp[name] = dict(lp[name])
            lp[name]["w"] = fake_quant(lp[name]["w"].T, spec).T
    return out
