"""SmoothQuant-style scale/shift folding between adjacent ops.

Functional re-design of the reference's transformation toolkit
(algorithm/models/transformation.py:24-139: smooth_ln_fcs / smooth_fc_fc /
smooth_q_k, temporary+inplace variants, GQA scale expansion). There the
transforms mutate torch modules; here they are pure pytree→pytree functions
(JAX params are immutable), and the "temporary vs inplace" split disappears —
callers keep whichever tree they want.

Math (all exact, modulo float rounding):

  ln→fcs:  y = LN(x)·g + b feeds fcs.  Fold per-channel (s, t):
           g' = g/s, b' = (b - t)/s;  w' = s·w (rows), bias' += t @ w.
           Then fc(y') == fc(y) while y' = (y - t)/s has tame ranges.
  fc→fc:   v_proj → o_proj pair: divide fc1 output channels by s, multiply
           fc2 input channels by s (GQA: per-kv-head scales repeat over the
           query groups, matching repeat_kv channel order).
  q→k:     divide q_proj outputs by s, multiply k_proj outputs by s —
           q·k dot products are invariant per matching channel. Exact only
           when no positional rotation mixes channels in between: sound for
           OPT; for LLaMA RoPE mixes channel pairs, so it is exact only if
           s is constant within each (i, i+D/2) rotation pair (we enforce
           pair-constant scales for rope models).

Scale computation follows SmoothQuant: s_c = max|x_c|^alpha / max|w_c|^(1-alpha).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import ModelConfig

CLIP = 1e-5


def compute_smooth_scales(
    act_absmax: jax.Array,  # [C] per-input-channel |x| max from calibration
    w_absmax: jax.Array,  # [C] per-input-channel max over fused consumer weights
    alpha: float = 0.5,
) -> jax.Array:
    a = jnp.maximum(act_absmax.astype(jnp.float32), CLIP)
    w = jnp.maximum(w_absmax.astype(jnp.float32), CLIP)
    s = jnp.power(a, alpha) / jnp.power(w, 1.0 - alpha)
    return jnp.clip(s, CLIP, 1e4)


def _as_norm_dict(ln) -> Tuple[Dict[str, jax.Array], bool]:
    """Normalize norm params: bare gamma array (rmsnorm) or {"g","b"}."""
    if isinstance(ln, dict):
        return dict(ln), True
    return {"g": ln}, False


def smooth_ln_fcs(
    ln,
    fcs: Sequence[Dict[str, jax.Array]],
    scales: jax.Array,  # [C] per ln-output channel
    shifts: Optional[jax.Array] = None,
) -> Tuple[Any, List[Dict[str, jax.Array]]]:
    """Fold (scales, shifts) out of a norm and into its consumer linears.

    Weights are stored [in, out] (x @ w), so the fc absorb multiplies rows.
    A non-zero shift on a bias-free rmsnorm is rejected: rmsnorm has no bias
    term to absorb it (the reference hits the same constraint via shifts=0).
    """
    nd, was_dict = _as_norm_dict(ln)
    scales = scales.astype(jnp.float32)
    if shifts is None:
        shifts = jnp.zeros_like(scales)
    shifts = shifts.astype(jnp.float32)
    if not was_dict and bool(np.any(np.asarray(jnp.abs(shifts) > 0))):
        raise ValueError("rmsnorm (no bias) cannot absorb a non-zero shift")
    nd["g"] = (nd["g"].astype(jnp.float32) / scales).astype(nd["g"].dtype)
    if "b" in nd and nd["b"] is not None:
        nd["b"] = ((nd["b"].astype(jnp.float32) - shifts) / scales).astype(
            nd["b"].dtype
        )
    out_fcs = []
    for fc in fcs:
        w = fc["w"].astype(jnp.float32)
        nfc = dict(fc)
        nfc["w"] = (w * scales[:, None]).astype(fc["w"].dtype)
        absorbed = shifts @ w  # [out]
        if fc.get("b") is not None:
            nfc["b"] = (fc["b"].astype(jnp.float32) + absorbed).astype(fc["b"].dtype)
        elif bool(np.any(np.asarray(jnp.abs(shifts) > 0))):
            nfc["b"] = absorbed.astype(fc["w"].dtype)
        out_fcs.append(nfc)
    return (nd if was_dict else nd["g"]), out_fcs


def _expand_gqa(scales: jax.Array, kv_heads: int, groups: int) -> jax.Array:
    """[KVH*D] -> [KVH*G*D] repeating each kv head's block G times."""
    d = scales.shape[0] // kv_heads
    return jnp.broadcast_to(
        scales.reshape(kv_heads, 1, d), (kv_heads, groups, d)
    ).reshape(-1)


def smooth_fc_fc(
    fc1: Dict[str, jax.Array],
    fc2: Dict[str, jax.Array],
    scales: jax.Array,  # [fc1_out] per fc1-output channel
    kv_heads: int = 1,
    num_kv_groups: int = 1,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """v_proj → o_proj folding: fc1 outputs /= s, fc2 inputs *= s.

    Exact through the attention mix because softmax(QKᵀ) combines V rows
    with position-independent per-channel structure: scaling V's channel c
    by 1/s_c scales attn-output channel c by 1/s_c. GQA: fc2's input is the
    group-repeated V, so s repeats per query group on the fc2 side.
    """
    scales = scales.astype(jnp.float32)
    nfc1 = dict(fc1)
    nfc1["w"] = (fc1["w"].astype(jnp.float32) / scales[None, :]).astype(
        fc1["w"].dtype
    )
    if fc1.get("b") is not None:
        nfc1["b"] = (fc1["b"].astype(jnp.float32) / scales).astype(fc1["b"].dtype)
    s2 = _expand_gqa(scales, kv_heads, num_kv_groups)
    nfc2 = dict(fc2)
    nfc2["w"] = (fc2["w"].astype(jnp.float32) * s2[:, None]).astype(fc2["w"].dtype)
    return nfc1, nfc2


def smooth_q_k(
    q: Dict[str, jax.Array],
    k: Dict[str, jax.Array],
    scales: jax.Array,  # [k_out] per k-output channel
    kv_heads: int = 1,
    num_kv_groups: int = 1,
    rope: bool = False,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """k outputs *= s, q outputs /= s — per-channel q·k invariance.

    With RoPE (rope=True) channels (i, i+D/2) rotate into each other, so the
    scales are symmetrized over each rotation pair first (keeps the fold
    exact at the cost of halving its degrees of freedom).
    """
    scales = scales.astype(jnp.float32)
    if rope:
        d = scales.shape[0] // kv_heads
        s2 = scales.reshape(kv_heads, 2, d // 2)
        pair = jnp.sqrt(s2[:, 0] * s2[:, 1])
        scales = jnp.concatenate([pair, pair], axis=1).reshape(-1)
    nk = dict(k)
    nk["w"] = (k["w"].astype(jnp.float32) * scales[None, :]).astype(k["w"].dtype)
    if k.get("b") is not None:
        nk["b"] = (k["b"].astype(jnp.float32) * scales).astype(k["b"].dtype)
    sq = _expand_gqa(scales, kv_heads, num_kv_groups)
    nq = dict(q)
    nq["w"] = (q["w"].astype(jnp.float32) / sq[None, :]).astype(q["w"].dtype)
    if q.get("b") is not None:
        nq["b"] = (q["b"].astype(jnp.float32) / sq).astype(q["b"].dtype)
    return nq, nk


# ---------------------------------------------------------------------------
# Calibration + whole-model drivers


def collect_llama_act_stats(
    params: Dict[str, Any], cfg: ModelConfig, ids: jax.Array
) -> List[Dict[str, np.ndarray]]:
    """Per-layer per-channel absmax of the inputs to each foldable linear
    group, from one dense forward over calibration ids [B, L]."""
    from flexq_tpu.models.llama import (
        apply_rope,
        attention_core,
        causal_mask,
        rmsnorm,
        rope_for_cfg,
    )

    b, l = ids.shape
    x = params["embed"][ids]
    if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    positions = jnp.broadcast_to(jnp.arange(l), (b, l))
    cos, sin = rope_for_cfg(positions, cfg)
    mask = causal_mask(l, l, window=cfg.sliding_window)
    stats = []

    def absmax(t):  # [.., C] -> [C]
        return np.asarray(jnp.max(jnp.abs(t.astype(jnp.float32)), axis=tuple(range(t.ndim - 1))))

    def lin(fc, h):  # biased projections (Qwen2 q/k/v) must match the model
        y = h @ fc["w"]
        if fc.get("b") is not None:
            y = y + fc["b"].astype(y.dtype)
        return y

    for lp in params["layers"]:
        st: Dict[str, np.ndarray] = {}
        h = rmsnorm(x, lp["input_norm"], cfg.norm_eps)
        st["qkv_in"] = absmax(h)
        q = lin(lp["q_proj"], h).reshape(b, l, cfg.num_heads, cfg.head_dim)
        k = lin(lp["k_proj"], h).reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
        v = lin(lp["v_proj"], h).reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
        st["v_out"] = absmax(v.reshape(b, l, -1))
        st["q_out"] = absmax(q.reshape(b, l, -1))  # pre-rope (fold site)
        st["k_out"] = absmax(k.reshape(b, l, -1))
        q, k = apply_rope(q, k, cos, sin)
        attn = attention_core(q, k, v, mask, cfg.num_kv_groups)
        st["o_in"] = absmax(attn)
        x = x + lin(lp["o_proj"], attn)
        h = rmsnorm(x, lp["post_norm"], cfg.norm_eps)
        st["ffn_in"] = absmax(h)
        gate = lin(lp["gate_proj"], h)
        up = lin(lp["up_proj"], h)
        from flexq_tpu.models.llama import act_fn

        act = act_fn(cfg.act, gate.astype(jnp.float32)).astype(gate.dtype) * up
        x = x + lin(lp["down_proj"], act)
        stats.append(st)
    return stats


def smooth_llama(
    params: Dict[str, Any],
    cfg: ModelConfig,
    act_stats: List[Dict[str, np.ndarray]],
    alpha: float = 0.5,
    fold_qk: bool = False,
) -> Dict[str, Any]:
    """Apply ln→qkv, post_ln→gate/up, v→o (and optionally q↔k) folding to a
    dense llama tree. Returns a new tree; dense forward output is unchanged
    (float rounding aside) while activation outliers are migrated into
    weights — run BEFORE fake_quant_weights / quantize_params.
    """
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for lp, st in zip(params["layers"], act_stats):
        lp = dict(lp)
        # attention input norm -> q/k/v
        w_amax = jnp.max(
            jnp.abs(
                jnp.concatenate(
                    [lp["q_proj"]["w"], lp["k_proj"]["w"], lp["v_proj"]["w"]], axis=1
                ).astype(jnp.float32)
            ),
            axis=1,
        )
        s = compute_smooth_scales(jnp.asarray(st["qkv_in"]), w_amax, alpha)
        ln, (fq, fk, fv) = smooth_ln_fcs(
            lp["input_norm"], [lp["q_proj"], lp["k_proj"], lp["v_proj"]], s
        )
        lp["input_norm"], lp["q_proj"], lp["k_proj"], lp["v_proj"] = ln, fq, fk, fv
        # v -> o (per v-output channel; o-side act stats reduced over groups)
        o_in = jnp.asarray(st["o_in"], jnp.float32)
        if cfg.num_kv_groups > 1:
            o_in = jnp.max(
                o_in.reshape(cfg.num_kv_heads, cfg.num_kv_groups, cfg.head_dim), axis=1
            ).reshape(-1)
        w_amax = jnp.max(jnp.abs(lp["o_proj"]["w"].astype(jnp.float32)), axis=1)
        if cfg.num_kv_groups > 1:
            w_amax = jnp.max(
                w_amax.reshape(cfg.num_kv_heads, cfg.num_kv_groups, cfg.head_dim),
                axis=1,
            ).reshape(-1)
        s = compute_smooth_scales(o_in, w_amax, alpha)
        lp["v_proj"], lp["o_proj"] = smooth_fc_fc(
            lp["v_proj"], lp["o_proj"], s, cfg.num_kv_heads, cfg.num_kv_groups
        )
        # ffn norm -> gate/up
        w_amax = jnp.max(
            jnp.abs(
                jnp.concatenate(
                    [lp["gate_proj"]["w"], lp["up_proj"]["w"]], axis=1
                ).astype(jnp.float32)
            ),
            axis=1,
        )
        s = compute_smooth_scales(jnp.asarray(st["ffn_in"]), w_amax, alpha)
        ln, (fg, fu) = smooth_ln_fcs(
            lp["post_norm"], [lp["gate_proj"], lp["up_proj"]], s
        )
        lp["post_norm"], lp["gate_proj"], lp["up_proj"] = ln, fg, fu
        if fold_qk:
            # balance per-channel |q| vs |k| ranges: k *= s, q /= s with
            # s = sqrt(max|q| / max|k|) (q stats reduced to kv-head channels)
            q_amax = jnp.asarray(st["q_out"], jnp.float32)
            if cfg.num_kv_groups > 1:
                q_amax = jnp.max(
                    q_amax.reshape(cfg.num_kv_heads, cfg.num_kv_groups, cfg.head_dim),
                    axis=1,
                ).reshape(-1)
            k_amax = jnp.asarray(st["k_out"], jnp.float32)
            s = jnp.clip(
                jnp.sqrt(jnp.maximum(q_amax, CLIP) / jnp.maximum(k_amax, CLIP)),
                CLIP,
                1e4,
            )
            lp["q_proj"], lp["k_proj"] = smooth_q_k(
                lp["q_proj"], lp["k_proj"], s, cfg.num_kv_heads,
                cfg.num_kv_groups, rope=True,
            )
        out["layers"].append(lp)
    return out


def collect_opt_act_stats(
    params: Dict[str, Any], cfg: ModelConfig, ids: jax.Array
) -> List[Dict[str, np.ndarray]]:
    """OPT (pre-LN) analogue of collect_llama_act_stats."""
    from flexq_tpu.models.llama import attention_core, causal_mask
    from flexq_tpu.models.opt import POS_OFFSET, layernorm

    assert cfg.do_layer_norm_before, "smoothing folds require pre-LN OPT"
    b, l = ids.shape
    positions = jnp.broadcast_to(jnp.arange(l), (b, l))
    x = params["embed"][ids] + params["pos_embed"][positions + POS_OFFSET]
    mask = causal_mask(l, l)
    stats = []

    def absmax(t):
        return np.asarray(
            jnp.max(jnp.abs(t.astype(jnp.float32)), axis=tuple(range(t.ndim - 1)))
        )

    def lin(lp, name, h):
        y = h @ lp[name]["w"]
        if lp[name].get("b") is not None:
            y = y + lp[name]["b"]
        return y

    for lp in params["layers"]:
        st: Dict[str, np.ndarray] = {}
        h = layernorm(x, lp["input_norm"]["g"], lp["input_norm"]["b"], cfg.norm_eps)
        st["qkv_in"] = absmax(h)
        q = lin(lp, "q_proj", h).reshape(b, l, cfg.num_heads, cfg.head_dim)
        k = lin(lp, "k_proj", h).reshape(b, l, cfg.num_heads, cfg.head_dim)
        v = lin(lp, "v_proj", h).reshape(b, l, cfg.num_heads, cfg.head_dim)
        st["q_out"] = absmax(q.reshape(b, l, -1))
        st["k_out"] = absmax(k.reshape(b, l, -1))
        attn = attention_core(q, k, v, mask, 1)
        st["o_in"] = absmax(attn)
        x = x + lin(lp, "o_proj", attn)
        h = layernorm(x, lp["post_norm"]["g"], lp["post_norm"]["b"], cfg.norm_eps)
        st["ffn_in"] = absmax(h)
        x = x + lin(lp, "fc2", jnp.maximum(lin(lp, "fc1", h), 0))
        stats.append(st)
    return stats


def smooth_opt(
    params: Dict[str, Any],
    cfg: ModelConfig,
    act_stats: List[Dict[str, np.ndarray]],
    alpha: float = 0.5,
    fold_qk: bool = True,
) -> Dict[str, Any]:
    """OPT folds: ln→q/k/v, v→o, post_ln→fc1, and (exact — no RoPE) q↔k.

    Shifts stay zero (symmetric smoothing) as in the reference's FlexQ
    usage; LayerNorm biases could absorb shifts if asymmetric smoothing is
    wanted later.
    """
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for lp, st in zip(params["layers"], act_stats):
        lp = dict(lp)
        w_amax = jnp.max(
            jnp.abs(
                jnp.concatenate(
                    [lp["q_proj"]["w"], lp["k_proj"]["w"], lp["v_proj"]["w"]], axis=1
                ).astype(jnp.float32)
            ),
            axis=1,
        )
        s = compute_smooth_scales(jnp.asarray(st["qkv_in"]), w_amax, alpha)
        ln, (fq, fk, fv) = smooth_ln_fcs(
            lp["input_norm"], [lp["q_proj"], lp["k_proj"], lp["v_proj"]], s
        )
        lp["input_norm"], lp["q_proj"], lp["k_proj"], lp["v_proj"] = ln, fq, fk, fv
        w_amax = jnp.max(jnp.abs(lp["o_proj"]["w"].astype(jnp.float32)), axis=1)
        s = compute_smooth_scales(jnp.asarray(st["o_in"], jnp.float32), w_amax, alpha)
        lp["v_proj"], lp["o_proj"] = smooth_fc_fc(lp["v_proj"], lp["o_proj"], s)
        w_amax = jnp.max(jnp.abs(lp["fc1"]["w"].astype(jnp.float32)), axis=1)
        s = compute_smooth_scales(jnp.asarray(st["ffn_in"]), w_amax, alpha)
        ln, (f1,) = smooth_ln_fcs(lp["post_norm"], [lp["fc1"]], s)
        lp["post_norm"], lp["fc1"] = ln, f1
        if fold_qk:
            s = jnp.clip(
                jnp.sqrt(
                    jnp.maximum(jnp.asarray(st["q_out"], jnp.float32), CLIP)
                    / jnp.maximum(jnp.asarray(st["k_out"], jnp.float32), CLIP)
                ),
                CLIP,
                1e4,
            )
            lp["q_proj"], lp["k_proj"] = smooth_q_k(lp["q_proj"], lp["k_proj"], s)
        out["layers"].append(lp)
    return out
