"""Functional LLaMA-family decoder (MHA + GQA) in pure JAX.

The accuracy-oracle twin of the reference's algorithm/models/int_llama_layer.py
(QuantLlamaDecoderLayer) and the graph the serving engine jits (reference e2e
models/llama/LlamaDecoder.cc:304-450 semantics, re-designed as jitted
functions instead of a C++ object graph).

Two execution modes share this module:
  * dense:   plain matmuls; weights may be pre-fake-quantized
             (`fake_quant_weights`) and activations fake-quantized per the
             policy — reproducing algorithm/main.py's evaluation path.
  * serve:   flexq_tpu.serve.engine drives the quantized Pallas kernels with
             the same layer structure (fused norm→quant producers).

Weight layout convention: every linear is stored [in_features, out_features]
so forward is `x @ w` (transposed from HF/torch [out, in]).

HF numeric parity notes (verified against transformers.LlamaModel):
  * RMSNorm stats in f32, cast to model dtype *before* the gamma multiply.
  * RoPE: cos/sin computed from f32 inv_freq, applied in f32 via rotate_half.
  * Softmax in f32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.quant.quantizer import QuantSpec, fake_quant


class KVCache(NamedTuple):
    """Per-model KV cache: [num_layers, B, max_len, kv_heads, head_dim]."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # int32 [] or [B] — tokens already cached

    @staticmethod
    def empty(cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float, scaling=None):
    """positions [B, L] -> (cos, sin) [B, L, head_dim] (HF half-rotate layout).

    ``scaling`` is the LLaMA-3.1 frequency-scaling tuple
    (factor, low_freq_factor, high_freq_factor, original_max_position_
    embeddings) — the piecewise inv_freq remap of HF's
    modeling_rope_utils._compute_llama3_parameters: long wavelengths
    (> orig/low) are divided by ``factor``, short ones (< orig/high) kept,
    and the band between blends linearly in orig/wavelen.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is not None:
        factor, low, high, orig = scaling
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (orig / wavelen - low) / (high - low)
        blended = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > orig / low,
            inv_freq / factor,
            jnp.where(wavelen < orig / high, inv_freq, blended),
        )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B, L, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rope_for_cfg(positions: jax.Array, cfg: ModelConfig):
    """cos/sin per the model config (theta + optional llama3 rope scaling)."""
    return rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q [B,L,H,D], k [B,L,KVH,D]; cos/sin [B,L,D]."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def rope_gemm_operands(cos, sin):
    """(cos, sin) [B, L, D] (duplicated-halves layout from rope_cos_sin) ->
    (cos_f, sin2_f) [B*L, D] f32 operands for the in-GEMM rope epilogue
    (kernels.w6_matmul rope_cos/rope_sin2): with P = lane-roll-by-D/2,
    rotate_half(t)*sin == P(t)*sin2 where sin2 = (-sin_half | sin_half)."""
    b, l, d = cos.shape
    half = d // 2
    sin2 = jnp.concatenate([-sin[..., :half], sin[..., half:]], axis=-1)
    return (
        cos.reshape(b * l, d).astype(jnp.float32),
        sin2.reshape(b * l, d).astype(jnp.float32),
    )


def act_fn(name: str, x: jax.Array) -> jax.Array:
    """FFN gate activation by config name — the single jnp-side dispatch,
    validated like the kernels (glu_quant / w6 GLU raise on unknown acts so
    the oracle and serve paths can never silently diverge)."""
    if name == "silu":
        return jax.nn.silu(x)
    if name == "gelu":  # tanh approximation (HF gelu_pytorch_tanh, Gemma)
        return jax.nn.gelu(x)
    raise ValueError(f"unsupported activation {name!r}")


def rmsnorm(x: jax.Array, gamma: jax.Array, eps: float) -> jax.Array:
    h = x.astype(jnp.float32)
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    return (h * jax.lax.rsqrt(var + eps)).astype(x.dtype) * gamma


def _maybe_quant_act(x, name: str, policy: Optional[QuantPolicy]):
    if policy is None:
        return x
    spec = policy.act_spec(name)
    if not spec.enabled:
        return x
    return fake_quant(x, spec)


def _linear(params: Dict[str, Any], name: str, x, policy: Optional[QuantPolicy]):
    """Dense linear with optional dynamic act fake-quant (QuantLinear.forward,
    reference int_linear.py:56 — act quant is dynamic at eval time)."""
    x = _maybe_quant_act(x, name, policy)
    w = params[name]["w"]
    y = x @ w.astype(x.dtype)
    b = params[name].get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


ATTN_CHUNK = 1024  # key-chunk size for the blockwise path


def attention_core(
    q: jax.Array,  # [B, Lq, H, D]
    k: jax.Array,  # [B, Lk, KVH, D] ("bkhd") or [B, KVH, Lk, D] ("bhkd" cache)
    v: jax.Array,
    mask: Optional[jax.Array],  # [B, 1, Lq, Lk] additive or None (full causal)
    num_kv_groups: int,
    kv_layout: str = "bkhd",
) -> jax.Array:
    """f32-softmax attention with GQA via kv-head repeat (reference
    int_llama_layer.py:142-143 repeat_kv).

    ``kv_layout="bhkd"`` is the KV-cache layout (sequence second-minor so
    the flash-decode kernel streams contiguous blocks); the einsums contract
    it without materializing a transpose.

    Long key runs take the blockwise online-softmax path so the [B,H,Lq,Lk]
    score tensor is never materialized — the capability the reference lacks
    entirely (its prefill is full O(L²) fp16 softmax, SURVEY.md §5
    long-context row).
    """
    b, lq, h, d = q.shape
    hax = 2 if kv_layout == "bkhd" else 1
    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=hax)
        v = jnp.repeat(v, num_kv_groups, axis=hax)
    lk = k.shape[3 - hax]
    if lk > ATTN_CHUNK and lk % ATTN_CHUNK == 0 and lq > 1:
        return _attention_blockwise(q, k, v, mask, ATTN_CHUNK, kv_layout)
    scores = jnp.einsum(f"bqhd,{kv_layout}->bhqk", q, k).astype(jnp.float32)
    scores = scores / jnp.sqrt(d).astype(jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum(f"bhqk,{kv_layout}->bqhd", probs, v)
    return out.reshape(b, lq, h * d)


def attention_core_quant(
    q: jax.Array,  # [B, Lq, H, D]
    k8: jax.Array,  # int8 [B, KVH, Lk, D] (cache layout)
    ks: jax.Array,  # f32 [B, KVH, Lk] per-(token, head) K scales
    v8: jax.Array,  # int8 [B, KVH, Lk, D]
    vs: jax.Array,  # f32 [B, KVH, Lk]
    mask: Optional[jax.Array],
    num_kv_groups: int,
) -> jax.Array:
    """Attention over an int8 KV cache with scales folded into the math:

        scores[q,t] = (Σ_d q_d · K8[t,d]) · ks[t]     (scale after the dot)
        out[q,d]    = Σ_t (p[q,t] · vs[t]) · V8[t,d]  (scale folded into p)

    so the int8 cache feeds the matmuls directly and no dequantized bf16
    copy of the cache is ever materialized (that copy made a naive int8
    cache *slower* than bf16). Decode (Lq==1) takes the Pallas flash-decode
    kernel instead; this jnp path covers prefill-over-cache.
    """
    b, lq, h, d = q.shape
    if num_kv_groups > 1:
        k8 = jnp.repeat(k8, num_kv_groups, axis=1)
        v8 = jnp.repeat(v8, num_kv_groups, axis=1)
        ks = jnp.repeat(ks, num_kv_groups, axis=1)
        vs = jnp.repeat(vs, num_kv_groups, axis=1)
    scores = jnp.einsum(
        "bqhd,bhkd->bhqk", q.astype(jnp.bfloat16), k8.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    scores = scores * ks[:, :, None, :]  # [B,H,1,Lk]
    scores = scores / jnp.sqrt(d).astype(jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("bhqk,bhkd->bqhd", pv, v8.astype(jnp.bfloat16))
    return out.astype(q.dtype).reshape(b, lq, h * d)


def _attention_blockwise(q, k, v, mask, chunk: int, kv_layout: str = "bkhd") -> jax.Array:
    """Online-softmax attention scanned over key chunks (flash-style).

    Softmax statistics (running max/sum, accumulator) are f32 regardless of
    input dtype; the QK^T and PV dots run in the INPUT dtype with f32
    accumulation — bf16 MXU rate on the serve path (the old version upcast
    everything to f32, which quarters MXU throughput and doubles K/V
    traffic), exact f32 on the eval path. Chunks are dynamic-sliced inside
    the scan so no transposed K/V/mask copies materialize; memory is
    O(Lq·chunk) per step instead of O(Lq·Lk).
    """
    b, lq, h, d = q.shape
    cdt = q.dtype  # compute dtype for the dots: never up- or down-cast
    seq_ax = 1 if kv_layout == "bkhd" else 2
    lk = k.shape[seq_ax]
    nc = lk // chunk
    kq = k.astype(cdt)
    vq = v.astype(cdt)
    scale = 1.0 / math.sqrt(d)

    def step(carry, ci):
        m, l, acc = carry  # [B,H,Lq,1], [B,H,Lq,1], [B,H,Lq,D]
        start = ci * chunk
        kb = jax.lax.dynamic_slice_in_dim(kq, start, chunk, seq_ax)
        vb = jax.lax.dynamic_slice_in_dim(vq, start, chunk, seq_ax)
        s = jnp.einsum(
            f"bqhd,{kv_layout}->bhqk", q, kb, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            s = s + jax.lax.dynamic_slice_in_dim(mask, start, chunk, 3).astype(
                jnp.float32
            )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            f"bhqk,{kv_layout}->bhqd", p.astype(cdt), vb,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l, acc), None

    init = (
        # finite init: -inf would give exp(nan) on fully-masked chunks
        jnp.full((b, h, lq, 1), -1e30, jnp.float32),
        jnp.zeros((b, h, lq, 1), jnp.float32),
        jnp.zeros((b, h, lq, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(step, init, jnp.arange(nc))
    out = (acc / l).astype(q.dtype)  # [B,H,Lq,D]
    return out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)


def causal_mask(
    lq: int, lk: int, dtype=jnp.float32, window: Optional[int] = None
) -> jax.Array:
    """Additive causal mask [1, 1, lq, lk]; queries at the END of the key run.

    ``window`` adds the Mistral sliding-window lower bound: query i attends
    keys in [i-window+1, i] (HF modeling_mistral sliding_window semantics).
    """
    qi = jnp.arange(lq)[:, None] + (lk - lq)
    ki = jnp.arange(lk)[None, :]
    ok = ki <= qi
    if window is not None:
        ok &= ki > qi - window
    m = jnp.where(ok, 0.0, jnp.finfo(dtype).min)
    return m[None, None].astype(dtype)


def span_mask(
    pos_q: jax.Array,  # int32 [B, Lq] absolute query positions
    max_len: int,
    window: Optional[int] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Additive causal mask [B, 1, Lq, max_len] for queries at absolute
    positions ``pos_q`` over a max_len cache: query (b, i) sees keys at
    positions <= pos_q[b, i] (and, with ``window``, > pos_q[b, i] - window —
    the Mistral sliding-window lower bound). The single mask builder behind
    engine/scheduler/PP decode, chunked-prefill, and spec-verify masks."""
    ki = jnp.arange(max_len)[None, None, None, :]
    pq = pos_q[:, None, :, None]
    ok = ki <= pq
    if window is not None:
        ok &= ki > pq - window
    return jnp.where(ok, 0.0, jnp.finfo(dtype).min).astype(dtype)


def decoder_layer(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    x: jax.Array,  # [B, L, H]
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    policy: Optional[QuantPolicy] = None,
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # cached [B, max, KVH, D]
    cache_pos: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    b, l, hidden = x.shape
    h = rmsnorm(x, lp["input_norm"], cfg.norm_eps)
    q = _linear(lp, "q_proj", h, policy).reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = _linear(lp, "k_proj", h, policy).reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    v = _linear(lp, "v_proj", h, policy).reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)

    new_kv = None
    if kv is not None:
        # full-buffer in-place update at (layer_idx, :, pos); see
        # models/quantized.py for why per-layer slice+restack is ruinous
        ck, cv, li = kv
        ck = jax.lax.dynamic_update_slice(ck, k[None], (li, 0, cache_pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v[None], (li, 0, cache_pos, 0, 0))
        new_kv = (ck, cv)
        k, v = ck[li], cv[li]

    attn = attention_core(q, k, v, mask, cfg.num_kv_groups)
    attn = _linear(lp, "o_proj", attn, policy)
    x = x + attn

    h = rmsnorm(x, lp["post_norm"], cfg.norm_eps)
    gate = _linear(lp, "gate_proj", h, policy)
    up = _linear(lp, "up_proj", h, policy)
    act = act_fn(cfg.act, gate.astype(jnp.float32)).astype(gate.dtype) * up
    down = _linear(lp, "down_proj", act, policy)
    x = x + down
    return x, new_kv


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    ids: jax.Array,  # int32 [B, L]
    policy: Optional[QuantPolicy] = None,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence forward -> logits [B, L, V] (the perplexity-eval path,
    reference algorithm/main.py:96-121)."""
    b, l = ids.shape
    x = params["embed"][ids]
    if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(l), (b, l))
    cos, sin = rope_for_cfg(positions, cfg)
    mask = causal_mask(l, l, window=cfg.sliding_window)
    for lp in params["layers"]:
        x, _ = decoder_layer(lp, cfg, x, cos, sin, mask, policy)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        head = params["embed"].T
    if "lm_head" in params:  # quantized-head policies fake-quant the input
        x = _maybe_quant_act(x, "lm_head", policy)
    return x @ head.astype(x.dtype)


def fake_quant_weights(params: Dict[str, Any], policy: QuantPolicy) -> Dict[str, Any]:
    """Quantize-dequantize all policy-covered linear weights in place
    (reference flexqllm.py:100-117 + utils.py:117 weight_quant_inplace).

    Weights are stored [in, out]; reference quantizes torch [out, in] rows
    per output channel/group along in_features — so transpose, quant, undo.
    """
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for lp in out["layers"]:
        for name in policy.weight_bits:
            if name not in lp:
                continue
            spec = policy.weight_spec(name)
            if not spec.enabled:
                continue
            w = lp[name]["w"]
            lp[name] = dict(lp[name])
            lp[name]["w"] = fake_quant(w.T, spec).T
    if "lm_head" in out and "lm_head" in policy.weight_bits:
        spec = policy.weight_spec("lm_head")
        if spec.enabled:
            out["lm_head"] = fake_quant(out["lm_head"].T, spec).T
    return out
