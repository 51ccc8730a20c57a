"""Quantized (serve-path) LLaMA: packed weights + Pallas kernel forward.

The TPU-native equivalent of the reference's C++ serving graph
(e2e models/llama/LlamaDecoder.cc:304-450 + LlamaContextDecoder.cc): every
linear runs the W6Ax Pallas kernel from 6-bit packed planes, activations are
quantized in the producer's epilogue (fused norm/activation kernels), and the
attention core stays 16-bit (reference keeps q/k/v/p matmuls fp16,
algorithm/main.py:299-320).

Weight conversion (`quantize_params`) fills the reference's missing-exporter
gap (SURVEY.md §2.6): dense HF weights → per-group(128) int6 + scales →
nibble/crumb planes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.kernels import (
    GROUP_SIZE,
    glu_quant,
    layernorm_quant,
    quant_act,
    relu_quant,
    rmsnorm_quant,
    w6_matmul,
    w6_matmul_bf16,
)
from flexq_tpu.models.llama import act_fn, apply_rope, attention_core, causal_mask, rmsnorm, rope_for_cfg
from flexq_tpu.packing import pack4, pack6
from flexq_tpu.quant.quantizer import QuantSpec, quantize


# Fused-rope q/k prefill GEMMs (kernels' rope epilogue; head_dim == 128).
# Module-level switches so bench scripts can A/B the fusion explicitly in
# process (NOT env vars — see w6_matmul's kwargs-only policy). Production
# default: fusion on, kernel-chosen blocks.
FUSED_ROPE_PREFILL = True
ROPE_GEMM_BLOCKS: Optional[tuple] = None  # (bm, bn, bk) override for A/B


def quantize_linear(
    w: jax.Array, spec: QuantSpec, k_pad_to: Optional[int] = None
) -> Dict[str, jax.Array]:
    """Dense [K, N] -> packed planes + scales (per-group along K).

    N is zero-padded to a multiple of 128 (Mosaic lane tile) — or 1024 for
    wide layers so the kernel gets deep N-blocks; the layer slices the kernel
    output back to the true width. ``k_pad_to`` zero-pads K (exact: zero rows
    quantize to int 0 and contribute nothing) so the FFN down-projection can
    match a padded gate/up width and shard cleanly across tensor-parallel
    ranks.
    """
    k, n = w.shape
    if k_pad_to is not None and k_pad_to != k:
        w = jnp.pad(w, ((0, k_pad_to - k), (0, 0)))
        k = k_pad_to
    assert k % GROUP_SIZE == 0, f"K={k}"
    q, s, _ = quantize(w.T, spec)  # groups along K per output channel
    q = q.reshape(n, k).T  # [K, N] int8 (6-bit values)
    s = s.reshape(n, k // GROUP_SIZE).T  # [K/G, N]
    # Pad N so the kernel can use wide N-blocks (DMA depth): awkward widths
    # like 11008 (max divisor block 256) otherwise halve streaming bandwidth.
    n_pad = (-n) % (1024 if n >= 2048 else 128)
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad)))
        s = jnp.pad(s, ((0, 0), (0, n_pad)))
    if spec.bits == 8:
        # W8A8 baseline path (reference's SmoothQuant comparison,
        # int8_mode=2): dense int8 weights, no sub-byte packing
        return {"q8": q, "scale": jnp.asarray(s, jnp.float32)}
    if spec.bits == 4:
        # W4 weight-only baseline path (reference's int8_mode=4 CUTLASS
        # fpA_intB): nibble plane, 4 bits/value
        return {"q4": pack4(q), "scale": jnp.asarray(s, jnp.float32)}
    hi, lo = pack6(q)
    return {"hi": hi, "lo": lo, "scale": jnp.asarray(s, jnp.float32)}


def _pad128(n: int) -> int:
    return n + ((-n) % 128)


def quantize_params(
    params: Dict[str, Any],
    cfg: ModelConfig,
    policy: QuantPolicy,
    dtype=jnp.bfloat16,
    fuse: bool = False,
) -> Dict[str, Any]:
    """Dense param pytree -> serve pytree (packed linears, bf16 the rest).

    ``fuse=True`` packs q/k/v into one "qkv_proj" matrix and gate/up into one
    "gate_up" matrix (fewer kernel launches per decode step — the reference
    also runs one fused QKV GEMM, GptContextAttentionLayer.cc:160). Fused
    trees are for the single-device path; TP shards the unfused layout.
    Requires a uniform act-bit policy across the fused members (true for
    llama_flex: q/k/v and gate/up share bits).
    """
    out: Dict[str, Any] = {
        "embed": params["embed"].astype(dtype),
        "final_norm": jax.tree_util.tree_map(
            lambda x: x.astype(dtype), params["final_norm"]
        ),
        "layers": [],
    }
    if "lm_head" in params:
        head_spec = policy.weight_spec("lm_head")
        if head_spec.enabled:
            # quantized vocab GEMM (exceeds parity: the reference's lm_head
            # stays fp16 in every int8_mode — Llama.cc:1090-1130)
            out["lm_head"] = quantize_linear(params["lm_head"], head_spec)
        else:
            out["lm_head"] = params["lm_head"].astype(dtype)
    if "pos_embed" in params:
        out["pos_embed"] = params["pos_embed"].astype(dtype)
    # FFN down/fc2 input dim must match the padded gate/up output width
    ffn = cfg.intermediate_size
    ffn_pad = ffn + ((-ffn) % (1024 if ffn >= 2048 else 128))
    for lp in params["layers"]:
        lp = dict(lp)
        if fuse and "q_proj" in lp and "gate_proj" in lp:
            assert (
                policy.act_bits.get("q_proj")
                == policy.act_bits.get("k_proj")
                == policy.act_bits.get("v_proj")
            ) and policy.act_bits.get("gate_proj") == policy.act_bits.get("up_proj")

            def pad_cols(w, to):
                return jnp.pad(w, ((0, 0), (0, to - w.shape[1])))

            nq_p = _pad128(lp["q_proj"]["w"].shape[1])
            nkv_p = _pad128(lp["k_proj"]["w"].shape[1])
            qp, kp, vp = lp.pop("q_proj"), lp.pop("k_proj"), lp.pop("v_proj")
            lp["qkv_proj"] = {
                "w": jnp.concatenate(
                    [
                        pad_cols(qp["w"], nq_p),
                        pad_cols(kp["w"], nkv_p),
                        pad_cols(vp["w"], nkv_p),
                    ],
                    axis=1,
                )
            }
            if any(m.get("b") is not None for m in (qp, kp, vp)):
                # Qwen2 q/k/v biases ride at the members' padded offsets so
                # the fused output's segment slicing stays valid
                def pad_b(m, n, to):
                    b_ = m.get("b")
                    b_ = jnp.zeros((n,), m["w"].dtype) if b_ is None else b_
                    return jnp.pad(b_, (0, to - b_.shape[0]))

                lp["qkv_proj"]["b"] = jnp.concatenate(
                    [
                        pad_b(qp, nq_p, nq_p),
                        pad_b(kp, nkv_p, nkv_p),
                        pad_b(vp, nkv_p, nkv_p),
                    ]
                )
            lp["gate_up"] = {
                "w": jnp.concatenate(
                    [
                        pad_cols(lp.pop("gate_proj")["w"], ffn_pad),
                        pad_cols(lp.pop("up_proj")["w"], ffn_pad),
                    ],
                    axis=1,
                )
            }
        ql: Dict[str, Any] = {}
        for name, val in lp.items():
            if isinstance(val, dict) and "w" in val:
                # fused matrices inherit their representative member's spec
                spec_name = {"qkv_proj": "q_proj", "gate_up": "gate_proj"}.get(
                    name, name
                )
                spec = policy.weight_spec(spec_name)
                if spec.enabled:
                    k_pad = ffn_pad if name in ("down_proj", "fc2") else None
                    ql[name] = quantize_linear(val["w"], spec, k_pad_to=k_pad)
                    if val.get("b") is not None:
                        # biases ride padded to the packed plane's N so the
                        # kernels can add them pre-slice (scale.shape[1] is
                        # the plane width in every packed format)
                        b_ = val["b"]
                        n_plane = ql[name]["scale"].shape[1]
                        if b_.shape[0] != n_plane:
                            b_ = jnp.pad(b_, (0, n_plane - b_.shape[0]))
                        ql[name]["b"] = b_.astype(dtype)
                else:
                    ql[name] = {"w": val["w"].astype(dtype)}
                    if val.get("b") is not None:
                        ql[name]["b"] = val["b"].astype(dtype)
            else:
                ql[name] = jax.tree_util.tree_map(lambda x: x.astype(dtype), val)
        out["layers"].append(ql)
    return out




def _cache_update(ck, cv, k, v, li, cache_pos):
    """Write step K/V into the full cache at (layer li, per-batch positions).

    Cache layout [L, B, KVH, S, D] (sequence second-minor: contiguous
    per-(batch, kv-head) blocks for the flash-decode kernel's DMA).
    Step k/v arrive as [B, L, KVH, D] and are transposed in-flight.

    Scalar cache_pos: single dynamic_update_slice (prefill or uniform decode).
    Vector cache_pos [B]: per-row scatter — L==1 (continuous batching) or an
    L-token window at each row's own start (batched speculative verify).
    """
    k = k.astype(ck.dtype)  # cache dtype is authoritative (e.g. bf16 cache
    v = v.astype(cv.dtype)  # under an f32 model)
    if getattr(cache_pos, "ndim", 0) == 0 or not hasattr(cache_pos, "ndim"):
        kt = k.transpose(0, 2, 1, 3)[None]  # [1, B, KVH, L, D]
        vt = v.transpose(0, 2, 1, 3)[None]
        ck = jax.lax.dynamic_update_slice(ck, kt, (li, 0, 0, cache_pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, vt, (li, 0, 0, cache_pos, 0))
    else:
        # Per-row writes as B unrolled dynamic_update_slices, NOT one
        # gather/scatter: XLA TPU lowers a scatter whose indexed dims
        # straddle a sliced middle dim to a serialized path measured at
        # ~230 ms/step on the 7B cache (scripts/bench_vector_step.py) —
        # 40x the engine's scalar-position slice write. B slice-writes of
        # [1, 1, KVH, L, D] are in-place and ~free.
        b, l = k.shape[:2]
        kt = jnp.swapaxes(k, 1, 2)[:, None]  # [B, 1, KVH, L, D]
        vt = jnp.swapaxes(v, 1, 2)[:, None]
        for r in range(b):
            ck = jax.lax.dynamic_update_slice(
                ck, kt[r][None], (li, r, 0, cache_pos[r], 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, vt[r][None], (li, r, 0, cache_pos[r], 0)
            )
    return ck, cv


KV_QMAX = 127.0


def _kv_quant(x: jax.Array):
    """Per-(token, head) symmetric int8 quant over head_dim.

    [B, L, KVH, D] -> (int8 values, f32 scales [B, L, KVH]). The reference
    keeps its KV cache fp16 (SURVEY.md §5) — int8 KV halves cache traffic
    and capacity cost, exceeding parity (the repo north star calls for it).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.clip(absmax / KV_QMAX, 1e-8, 1e4)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return jnp.clip(q, -128, 127).astype(jnp.int8), scale


def _kv_write_read(kv, k, v, cache_pos, out_dtype):
    """Write step K/V into the cache and return the cache view for attention.

    kv = (ck, cv, li)                 bf16 cache [L, B, KVH, S, D]
       | (ck, cv, cks, cvs, li)      int8 cache + scales [L, B, KVH, S]
    Returns (new_kv_state, kv_view) where kv_view is
    ("cache", k, v) or ("quant", k8, ks, v8, vs) in [B, KVH, S, D] layout —
    the quantized view is consumed with scales folded into the math (an
    eager dequant would materialize a bf16 cache copy and erase the win).
    """
    if isinstance(kv[0], str) and kv[0].startswith("paged"):
        # paged pool: write this step's K/V into table-mapped pages
        # (decode-only: L == 1; prefill fills pages via PagePool.insert_prefill)
        if kv[0] == "paged8":
            _, pk, pv, sk, sv, table, li = kv
            kq, ks = _kv_quant(k)
            vq, vs = _kv_quant(v)
        else:
            _, pk, pv, table, li = kv
            kq, vq = k.astype(pk.dtype), v.astype(pv.dtype)
        b = k.shape[0]
        ps = pk.shape[3]
        pos = jnp.broadcast_to(jnp.asarray(cache_pos, jnp.int32), (b,))
        rows = jnp.arange(b)
        pages = table[rows, pos // ps]  # [B]
        offs = pos % ps
        # unrolled per-row slice writes (see _cache_update: the scatter
        # form serializes on TPU); page index per row is a traced scalar
        for r in range(b):
            pk = jax.lax.dynamic_update_slice(
                pk, kq[r, 0][None, None, :, None], (li, pages[r], 0, offs[r], 0)
            )
            pv = jax.lax.dynamic_update_slice(
                pv, vq[r, 0][None, None, :, None], (li, pages[r], 0, offs[r], 0)
            )
        if kv[0] == "paged8":
            for r in range(b):
                sk = jax.lax.dynamic_update_slice(
                    sk, ks[r, 0][None, None, :, None], (li, pages[r], 0, offs[r])
                )
                sv = jax.lax.dynamic_update_slice(
                    sv, vs[r, 0][None, None, :, None], (li, pages[r], 0, offs[r])
                )
            return (pk, pv, sk, sv), ("paged8", pk, pv, sk, sv, table, li)
        return (pk, pv), ("paged", pk, pv, table, li)
    if len(kv) == 3:
        ck, cv, li = kv
        ck, cv = _cache_update(ck, cv, k, v, li, cache_pos)
        return (ck, cv), ("cache", ck, cv, li)
    ck, cv, cks, cvs, li = kv
    kq, ks = _kv_quant(k)
    vq, vs = _kv_quant(v)
    ck, cv = _cache_update(ck, cv, kq, vq, li, cache_pos)
    if getattr(cache_pos, "ndim", 0) == 0 or not hasattr(cache_pos, "ndim"):
        kst = ks.transpose(0, 2, 1)[None]  # [1, B, KVH, L]
        vst = vs.transpose(0, 2, 1)[None]
        cks = jax.lax.dynamic_update_slice(cks, kst, (li, 0, 0, cache_pos))
        cvs = jax.lax.dynamic_update_slice(cvs, vst, (li, 0, 0, cache_pos))
    else:
        # unrolled per-row slice writes (see _cache_update: the scatter
        # form serializes on TPU)
        b, l = k.shape[:2]
        kst = jnp.swapaxes(ks, 1, 2)[:, None]  # [B, 1, KVH, L]
        vst = jnp.swapaxes(vs, 1, 2)[:, None]
        for r in range(b):
            cks = jax.lax.dynamic_update_slice(
                cks, kst[r][None], (li, r, 0, cache_pos[r])
            )
            cvs = jax.lax.dynamic_update_slice(
                cvs, vst[r][None], (li, r, 0, cache_pos[r])
            )
    return (ck, cv, cks, cvs), ("quant", ck, cks, cv, cvs, li)


def _attend(q, kv_view, mask, num_kv_groups, lengths=None, window=None):
    """Dispatch: Pallas flash-decode for single-token steps over a cache;
    jnp cores otherwise (fresh K/V, prefill-over-cache, tiny test caches).

    Cache views carry the FULL [L, B, KVH, S, D] buffers + layer index: the
    flash kernel slices the layer itself (a pre-sliced custom-call operand
    would cost a per-step copy of the slice), while the jnp fallbacks slice
    here (einsums fuse the slice — no copy).
    """
    from flexq_tpu.kernels.common import use_interpret
    from flexq_tpu.kernels.flash_decode import flash_decode, flash_decode_paged
    from flexq_tpu.models.llama import attention_core_quant

    kind = kv_view[0]
    # Mosaic memref_slice requires minor-dim (lane) extents in 128-tile
    # multiples on real TPU (measured: head_dim=64 fails AOT compile with
    # "slice shape along dimension 4 must be aligned to tiling"); interpret
    # mode (CPU tests) has no such constraint and keeps kernel-path parity.
    d_ok = q.shape[-1] % 128 == 0 or use_interpret()
    if kind.startswith("paged"):
        assert q.shape[1] == 1 and lengths is not None, "paged cache is decode-only"
        b, _, h, d = q.shape
        if kind == "paged8":
            _, pk, pv, sk, sv, table, li = kv_view
            out = flash_decode_paged(
                q[:, 0], pk, pv, table, lengths, sk, sv, layer_idx=li,
                window=window,
            )
        else:
            _, pk, pv, table, li = kv_view
            out = flash_decode_paged(
                q[:, 0], pk, pv, table, lengths, layer_idx=li, window=window
            )
        return out.astype(q.dtype).reshape(b, 1, h * d)
    if kind != "dense" and q.shape[1] == 1 and lengths is not None:
        s = kv_view[1].shape[3]
        # flash kernel block constraints; tiny caches / sub-128 head dims
        # (see d_ok above) fall back to the jnp path
        if s % 128 == 0 and d_ok:
            b, _, h, d = q.shape
            if kind == "cache":
                _, ck, cv, li = kv_view
                out = flash_decode(
                    q[:, 0], ck, cv, lengths, layer_idx=li, window=window
                )
            else:
                _, ck, cks, cv, cvs, li = kv_view
                out = flash_decode(
                    q[:, 0], ck, cv, lengths, cks, cvs, layer_idx=li,
                    window=window,
                )
            return out.astype(q.dtype).reshape(b, 1, h * d)
    if kind == "dense":
        return attention_core(q, kv_view[1], kv_view[2], mask, num_kv_groups)
    if kind == "cache":
        _, ck, cv, li = kv_view
        if (
            q.shape[1] > 1 and lengths is not None
            and ck.shape[3] % 128 == 0 and d_ok
        ):
            # prefill / chunked-prefill / spec-verify over the cache: the
            # flash kernel keeps score tiles in VMEM (the jnp path writes
            # ~0.9 GB/layer of score traffic at 7B L=2048) and reads only
            # key blocks at/below each query block's causal diagonal.
            # CONTRACT: this path derives pure position-causal masking from
            # `lengths` and IGNORES `mask` — every internal caller builds
            # exactly that mask; a caller needing a stricter mask (e.g.
            # left-padded ragged prompts) must pass lengths=None to force
            # the jnp fallback.
            from flexq_tpu.kernels.flash_prefill import flash_prefill

            b, l, h, d = q.shape
            out = flash_prefill(
                q, ck, cv, lengths, layer_idx=li, out_dtype=q.dtype,
                window=window,
            )
            return out
        return attention_core(q, ck[li], cv[li], mask, num_kv_groups, kv_layout="bhkd")
    _, ck, cks, cv, cvs, li = kv_view
    if (
        q.shape[1] > 1 and lengths is not None
        and ck.shape[3] % 128 == 0 and d_ok
    ):
        from flexq_tpu.kernels.flash_prefill import flash_prefill

        return flash_prefill(
            q, ck, cv, lengths, cks, cvs, layer_idx=li, out_dtype=q.dtype,
            window=window,
        )
    return attention_core_quant(q, ck[li], cks[li], cv[li], cvs[li], mask, num_kv_groups)


def _ffn_width(wq: Dict[str, Any], cfg: ModelConfig) -> int:
    """Padded FFN width implied by a packed down/fc2 weight's K dimension."""
    if "hi" in wq:
        return wq["hi"].shape[0] * 2
    if "q4" in wq:
        return wq["q4"].shape[0] * 2
    if "q8" in wq:
        return wq["q8"].shape[0]
    return cfg.intermediate_size


def _qlinear(
    wq: Dict[str, Any],
    xq: jax.Array,
    xs: jax.Array,
    out_dtype,
    n_out: Optional[int] = None,
) -> jax.Array:
    if "hi" in wq:
        y = w6_matmul(xq, xs, wq["hi"], wq["lo"], wq["scale"], out_dtype=out_dtype)
    elif "q4" in wq:
        from flexq_tpu.kernels.w4_matmul import w4_matmul

        y = w4_matmul(xq, xs, wq["q4"], wq["scale"], out_dtype=out_dtype)
    elif "q8" in wq:
        from flexq_tpu.kernels.w8_matmul import w8_matmul

        y = w8_matmul(xq, xs, wq["q8"], wq["scale"], out_dtype=out_dtype)
    else:
        # 16-bit weight under a mixed policy: dequantize the (already
        # act-quantized) input and run a dense matmul — same semantics as the
        # reference's fp16 cuBLAS fallback for unquantized layers.
        m, k = xq.shape
        xf = xq.astype(jnp.float32).reshape(m, k // GROUP_SIZE, GROUP_SIZE)
        xf = (xf * xs[:, :, None]).reshape(m, k).astype(out_dtype)
        y = xf @ wq["w"].astype(out_dtype)
    # bias is stored at the padded plane width — add before the slice
    if "b" in wq:
        y = y + wq["b"].astype(y.dtype)
    if n_out is not None and y.shape[-1] != n_out:
        y = y[:, :n_out]
    return y


def _qlinear_bf16(wq, x, out_dtype, n_out=None):
    if "hi" in wq:
        y = w6_matmul_bf16(x, wq["hi"], wq["lo"], wq["scale"], out_dtype=out_dtype)
    elif "q4" in wq:
        from flexq_tpu.kernels.w4_matmul import w4_matmul_bf16

        y = w4_matmul_bf16(x, wq["q4"], wq["scale"], out_dtype=out_dtype)
    elif "q8" in wq:
        # W8A16 prefill for the baseline path: dequantize per group and run
        # a dense matmul (XLA fuses the dequant into the dot's producer)
        k, n = wq["q8"].shape
        wdq = (
            wq["q8"].astype(jnp.float32).reshape(k // GROUP_SIZE, GROUP_SIZE, n)
            * wq["scale"][:, None, :]
        ).reshape(k, n).astype(x.dtype)
        y = x @ wdq
    else:
        y = x @ wq["w"].astype(x.dtype)
    # bias is stored at the padded plane width — add before the slice
    if "b" in wq:
        y = y + wq["b"].astype(y.dtype)
    if n_out is not None and y.shape[-1] != n_out:
        y = y[:, :n_out]
    return y


def llama_layer_serve_prefill(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    x: jax.Array,  # [B, L, H]
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    lengths: Optional[jax.Array] = None,
    window: Optional[int] = None,
):
    """Prefill (large-M) layer: W6A16 — weights dequantized in-kernel to
    bf16, activations unquantized. Compute-bound at prefill, so the bf16 MXU
    path beats the exact-int path (which pays per-group VPU dequant per
    token row); accuracy is strictly better than the W6Ax decode path.
    """
    from flexq_tpu.models.llama import rmsnorm

    b, l, hidden = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * l, hidden)

    h = rmsnorm(x2, lp["input_norm"], cfg.norm_eps)
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    # Fused-rope q/k GEMMs: the rope epilogue rotates the f32 accumulator
    # inside the W6A16 kernel (one fewer 2·[M, nq+nkv] elementwise pass —
    # 9.7 ms of 193 ms at 7B L=2048, scripts/bench_prefill_glue.py).
    # Requires head_dim == 128 (one head per 128-lane group) and packed-W6
    # unbiased projections; anything else takes the apply_rope path.
    def _rope_ok(wq):
        return ("hi" in wq or "q4" in wq) and "b" not in wq

    fused_rope = (
        FUSED_ROPE_PREFILL
        and cfg.head_dim == 128
        and "qkv_proj" not in lp
        and _rope_ok(lp["q_proj"]) and _rope_ok(lp["k_proj"])
    )
    if "qkv_proj" in lp:
        # one wide fused GEMM (reference GptContextAttentionLayer.cc:160);
        # wide N also runs the W6A16 kernel at a higher MXU rate than three
        # narrow GEMMs (measured: the FFN-width shapes hit ~173 TF/s e2e
        # while N=4096 qkv shapes lag — scripts/bench_prefill_parts.py)
        nq_p, nkv_p = _pad128(nq), _pad128(nkv)
        qkv = _qlinear_bf16(lp["qkv_proj"], h, dtype)
        q = qkv[:, :nq]
        k = qkv[:, nq_p : nq_p + nkv]
        v = qkv[:, nq_p + nkv_p : nq_p + nkv_p + nkv]
    elif fused_rope:
        from flexq_tpu.models.llama import rope_gemm_operands

        cos_f, sin2_f = rope_gemm_operands(cos, sin)

        bm_o, bn_o, bk_o = ROPE_GEMM_BLOCKS or (None, None, None)

        def rope_proj(wq, n_out):
            if "hi" in wq:
                y = w6_matmul_bf16(
                    h, wq["hi"], wq["lo"], wq["scale"], out_dtype=dtype,
                    rope_cos=cos_f, rope_sin2=sin2_f,
                    block_m=bm_o, block_n=bn_o, block_k=bk_o,
                )
            else:
                from flexq_tpu.kernels.w4_matmul import w4_matmul_bf16

                y = w4_matmul_bf16(
                    h, wq["q4"], wq["scale"], out_dtype=dtype,
                    rope_cos=cos_f, rope_sin2=sin2_f,
                    block_m=bm_o, block_n=bn_o, block_k=bk_o,
                )
            return y[:, :n_out] if y.shape[-1] != n_out else y

        q = rope_proj(lp["q_proj"], nq)
        k = rope_proj(lp["k_proj"], nkv)
        v = _qlinear_bf16(lp["v_proj"], h, dtype, nkv)
    else:
        q = _qlinear_bf16(lp["q_proj"], h, dtype, nq)
        k = _qlinear_bf16(lp["k_proj"], h, dtype, nkv)
        v = _qlinear_bf16(lp["v_proj"], h, dtype, nkv)
    q = q.reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    if not fused_rope:
        q, k = apply_rope(q, k, cos, sin)

    new_kv = None
    if kv is not None:
        new_kv, kv_view = _kv_write_read(kv, k, v, cache_pos, dtype)
    else:
        kv_view = ("dense", k, v)

    attn = _attend(q, kv_view, mask, cfg.num_kv_groups, lengths, window)
    o = _qlinear_bf16(lp["o_proj"], attn.reshape(b * l, nq), dtype, hidden)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    x2 = x2 + o

    h = rmsnorm(x2, lp["post_norm"], cfg.norm_eps)
    ffn_pad = _ffn_width(lp["down_proj"], cfg)
    if "gate_up" in lp and "hi" in lp["gate_up"]:
        # fused gate_up plane (quantize_params fuse=True): the GLU kernel
        # reads gate and up column ranges of the SAME packed plane via two
        # index maps — one kernel, no slice copies
        from flexq_tpu.kernels.w6_matmul import w6_glu_fused_bf16

        gu = lp["gate_up"]
        act = w6_glu_fused_bf16(
            h, gu["hi"], gu["lo"], gu["scale"], act=cfg.act, out_dtype=dtype
        )
        down = _qlinear_bf16(lp["down_proj"], act, dtype, hidden)
        if tp_axis is not None:
            down = jax.lax.psum(down, tp_axis)
        x2 = x2 + down
        return x2.reshape(b, l, hidden), new_kv
    gq, uq = lp["gate_proj"], lp["up_proj"]
    if "hi" in gq and "hi" in uq and "b" not in gq and "b" not in uq:
        # fused GLU producer: act(x@gate)*(x@up) in one kernel — the two
        # [M, ffn] GEMM outputs and the separate silu pass never touch HBM
        # (reference activation_kernels.cu:246-446 fused SiLU epilogue)
        from flexq_tpu.kernels.w6_matmul import w6_glu_matmul_bf16

        act = w6_glu_matmul_bf16(
            h, gq["hi"], gq["lo"], gq["scale"], uq["hi"], uq["lo"], uq["scale"],
            act=cfg.act, out_dtype=dtype,
        )
    else:
        gate = _qlinear_bf16(gq, h, dtype, ffn_pad)
        up = _qlinear_bf16(uq, h, dtype, ffn_pad)
        act = (
            act_fn(cfg.act, gate.astype(jnp.float32)) * up.astype(jnp.float32)
        ).astype(dtype)
    down = _qlinear_bf16(lp["down_proj"], act, dtype, hidden)
    if tp_axis is not None:
        down = jax.lax.psum(down, tp_axis)
    x2 = x2 + down
    return x2.reshape(b, l, hidden), new_kv


def llama_layer_serve(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    policy: QuantPolicy,
    x: jax.Array,  # [B, L, H]
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    lengths: Optional[jax.Array] = None,
    window: Optional[int] = None,
):
    """One quantized decoder layer (reference LlamaDecoder.cc per-layer flow:
    fused-LN→attn→fused-add-residual-LN→ffn→add-residual).

    With ``tp_axis`` (inside shard_map): heads/ffn are local shards and the
    row-parallel o/down outputs are partial sums — psum'ed here before the
    residual adds, exactly where the reference's TensorParallel* wrappers
    issue their NCCL all-reduces."""
    b, l, hidden = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * l, hidden)

    a_qkv = policy.act_bits.get("q_proj", 6)
    qx, qs = rmsnorm_quant(x2, lp["input_norm"], bits=a_qkv, eps=cfg.norm_eps)
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    if "qkv_proj" in lp:
        # fused QKV GEMM (reference runs one QKV GEMM too); members are
        # 128-padded at fixed offsets inside the fused output
        nq_p, nkv_p = _pad128(nq), _pad128(nkv)
        qkv = _qlinear(lp["qkv_proj"], qx, qs, dtype)
        q = qkv[:, :nq]
        k = qkv[:, nq_p : nq_p + nkv]
        v = qkv[:, nq_p + nkv_p : nq_p + nkv_p + nkv]
    else:
        q = _qlinear(lp["q_proj"], qx, qs, dtype, nq)
        k = _qlinear(lp["k_proj"], qx, qs, dtype, nkv)
        v = _qlinear(lp["v_proj"], qx, qs, dtype, nkv)
    q = q.reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)

    new_kv = None
    if kv is not None:
        # in-place update of the FULL [L, B, max, KVH, D] cache buffers at
        # (layer_idx, :, pos) — slicing out a layer then re-stacking would
        # copy the whole cache every step (2+ GB/step at 7B scale)
        new_kv, kv_view = _kv_write_read(kv, k, v, cache_pos, dtype)
    else:
        kv_view = ("dense", k, v)

    attn = _attend(q, kv_view, mask, cfg.num_kv_groups, lengths, window)  # [B, L, Hloc*D]
    attn2 = attn.reshape(b * l, nq)
    oq, os_ = quant_act(attn2, bits=policy.act_bits.get("o_proj", 6))
    o = _qlinear(lp["o_proj"], oq, os_, dtype, hidden)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)

    # fused residual-add + post-norm + quant (producer epilogue)
    a_ffn = policy.act_bits.get("gate_proj", 6)
    fq, fs, x2 = rmsnorm_quant(
        o, lp["post_norm"], bits=a_ffn, residual=x2, eps=cfg.norm_eps
    )
    # gate/up stay at the PADDED ffn width so they feed down_proj's padded K
    ffn_pad = _ffn_width(lp["down_proj"], cfg)
    if "gate_up" in lp:
        gu = _qlinear(lp["gate_up"], fq, fs, dtype)
        gate, up = gu[:, :ffn_pad], gu[:, ffn_pad : 2 * ffn_pad]
    else:
        gate = _qlinear(lp["gate_proj"], fq, fs, dtype, ffn_pad)
        up = _qlinear(lp["up_proj"], fq, fs, dtype, ffn_pad)
    dq, ds = glu_quant(gate, up, bits=policy.act_bits.get("down_proj", 8), act=cfg.act)
    down = _qlinear(lp["down_proj"], dq, ds, dtype, hidden)
    if tp_axis is not None:
        down = jax.lax.psum(down, tp_axis)
    x2 = x2 + down
    return x2.reshape(b, l, hidden), new_kv


def opt_layer_serve(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    policy: QuantPolicy,
    x: jax.Array,  # [B, L, H]
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    lengths: Optional[jax.Array] = None,
):
    """Quantized OPT decoder layer (reference ParallelGptDecoder.cc:382-524
    int8_mode=5 wiring): fused LayerNorm+quant producers, biased linears
    (bias added post-psum for row-parallel), ReLU+quant fc1→fc2 producer.

    Under a no-act-quant policy (W*A16 weight-only or fp16) the layer runs
    the bf16 path instead: plain layernorm producers + in-kernel-dequant
    bf16 GEMMs (int8 act containers cannot hold 16-bit values).
    """
    if policy.no_act_quant:
        return _opt_layer_serve_bf16(
            lp, cfg, x, mask, kv=kv, cache_pos=cache_pos, tp_axis=tp_axis,
            lengths=lengths,
        )
    b, l, hidden = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * l, hidden)

    a_qkv = policy.act_bits.get("q_proj", 8)
    qx, qs = layernorm_quant(
        x2, lp["input_norm"]["g"], lp["input_norm"]["b"], bits=a_qkv, eps=cfg.norm_eps
    )
    nq = cfg.num_heads * cfg.head_dim
    q = _qlinear(lp["q_proj"], qx, qs, dtype, nq).reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = _qlinear(lp["k_proj"], qx, qs, dtype, nq).reshape(b, l, cfg.num_heads, cfg.head_dim)
    v = _qlinear(lp["v_proj"], qx, qs, dtype, nq).reshape(b, l, cfg.num_heads, cfg.head_dim)

    new_kv = None
    if kv is not None:
        new_kv, kv_view = _kv_write_read(kv, k, v, cache_pos, dtype)
    else:
        kv_view = ("dense", k, v)

    attn = _attend(q, kv_view, mask, 1, lengths)
    oq, os_ = quant_act(attn.reshape(b * l, nq), bits=policy.act_bits.get("o_proj", 6))
    wq_o = {k_: v_ for k_, v_ in lp["o_proj"].items() if k_ != "b"}
    o = _qlinear(wq_o, oq, os_, dtype, hidden)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    if "b" in lp["o_proj"]:
        o = o + lp["o_proj"]["b"][: o.shape[-1]].astype(o.dtype)
    x2 = x2 + o

    a_fc1 = policy.act_bits.get("fc1", 6)
    fq, fs = layernorm_quant(
        x2, lp["post_norm"]["g"], lp["post_norm"]["b"], bits=a_fc1, eps=cfg.norm_eps
    )
    ffn_pad = _ffn_width(lp["fc2"], cfg)
    h = _qlinear(lp["fc1"], fq, fs, dtype, ffn_pad)
    hq, hs = relu_quant(h, bits=policy.act_bits.get("fc2", 6))
    wq_fc2 = {k_: v_ for k_, v_ in lp["fc2"].items() if k_ != "b"}
    down = _qlinear(wq_fc2, hq, hs, dtype, hidden)
    if tp_axis is not None:
        down = jax.lax.psum(down, tp_axis)
    if "b" in lp["fc2"]:
        down = down + lp["fc2"]["b"][: down.shape[-1]].astype(down.dtype)
    x2 = x2 + down
    return x2.reshape(b, l, hidden), new_kv


def _opt_layer_serve_bf16(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    x: jax.Array,  # [B, L, H]
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_pos: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    lengths: Optional[jax.Array] = None,
):
    """OPT layer, activations unquantized (weight-only / fp16 policies):
    plain LayerNorm producers, bf16 in-kernel-dequant GEMMs, biases added
    post-psum for the row-parallel o_proj/fc2."""
    from flexq_tpu.models.opt import layernorm

    b, l, hidden = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * l, hidden)

    h = layernorm(x2, lp["input_norm"]["g"], lp["input_norm"]["b"], cfg.norm_eps)
    nq = cfg.num_heads * cfg.head_dim
    q = _qlinear_bf16(lp["q_proj"], h, dtype, nq).reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = _qlinear_bf16(lp["k_proj"], h, dtype, nq).reshape(b, l, cfg.num_heads, cfg.head_dim)
    v = _qlinear_bf16(lp["v_proj"], h, dtype, nq).reshape(b, l, cfg.num_heads, cfg.head_dim)

    new_kv = None
    if kv is not None:
        new_kv, kv_view = _kv_write_read(kv, k, v, cache_pos, dtype)
    else:
        kv_view = ("dense", k, v)

    attn = _attend(q, kv_view, mask, 1, lengths)
    wq_o = {k_: v_ for k_, v_ in lp["o_proj"].items() if k_ != "b"}
    o = _qlinear_bf16(wq_o, attn.reshape(b * l, nq), dtype, hidden)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    if "b" in lp["o_proj"]:
        o = o + lp["o_proj"]["b"][: o.shape[-1]].astype(o.dtype)
    x2 = x2 + o

    h = layernorm(x2, lp["post_norm"]["g"], lp["post_norm"]["b"], cfg.norm_eps)
    ffn_pad = _ffn_width(lp["fc2"], cfg)
    h = _qlinear_bf16(lp["fc1"], h, dtype, ffn_pad)
    h = jax.nn.relu(h.astype(jnp.float32)).astype(dtype)
    wq_fc2 = {k_: v_ for k_, v_ in lp["fc2"].items() if k_ != "b"}
    down = _qlinear_bf16(wq_fc2, h, dtype, hidden)
    if tp_axis is not None:
        down = jax.lax.psum(down, tp_axis)
    if "b" in lp["fc2"]:
        down = down + lp["fc2"]["b"][: down.shape[-1]].astype(down.dtype)
    x2 = x2 + down
    return x2.reshape(b, l, hidden), new_kv


def apply_lm_head(
    params: Dict[str, Any],
    cfg: ModelConfig,
    policy: QuantPolicy,
    x: jax.Array,  # [B, L, H] final-norm output
) -> jax.Array:
    """Vocab projection -> logits [B, L, V].

    Handles tied embeddings, the bf16 head, and the packed quantized head
    (policy ``with_head``; exceeds parity — the reference's lm_head stays
    fp16 in every int8_mode, Llama.cc:1090-1130). The quantized output is
    sliced back from the padded vocab: pad logits would read as 0.0 and
    could out-argmax real negative logits.
    """
    b, l, _ = x.shape
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    if isinstance(head, dict):
        xm = x.reshape(b * l, -1)
        abits = policy.act_bits.get("lm_head", 16)
        if abits >= 16:
            logits = _qlinear_bf16(head, xm, x.dtype, n_out=cfg.vocab_size)
        else:
            xq, xs = quant_act(xm, abits)
            logits = _qlinear(head, xq, xs, x.dtype, n_out=cfg.vocab_size)
        return logits.reshape(b, l, cfg.vocab_size)
    return x @ head.astype(x.dtype)


def forward_serve(
    params: Dict[str, Any],
    cfg: ModelConfig,
    policy: QuantPolicy,
    ids: jax.Array,  # [B, L]
    positions: Optional[jax.Array] = None,
    kv_k: Optional[jax.Array] = None,  # [layers, B, max, KVH, D] bf16 | int8
    kv_v: Optional[jax.Array] = None,
    cache_pos: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    prefill_bf16: bool = False,
    kv_k_scale: Optional[jax.Array] = None,  # [layers, B, KVH, max] f32
    kv_v_scale: Optional[jax.Array] = None,  # (present => int8 KV cache)
    page_table: Optional[jax.Array] = None,  # int32 [B, maxpages] => paged
    last_only: bool = False,
):
    """Quantized forward. Without a cache: full-sequence causal (prefill/eval).
    With a cache: writes K/V at cache_pos and attends over the full cache.
    ``prefill_bf16`` selects the W6A16 large-M layer path. Passing scale
    arrays selects the int8 quantized KV cache.

    ``last_only``: project only the final position through the lm_head and
    return logits [B, 1, V] — the prefill/TTFT path, where the full-length
    vocab GEMM ([L, V] output, ~0.5 TFLOP + 130 MB at 7B L=2048) is dead
    work (the serving loop consumes only the last token's distribution).

    Returns (logits [B, L, V], cache-state tuple or None) where the cache
    state is (kv_k, kv_v) or (kv_k, kv_v, kv_k_scale, kv_v_scale).
    """
    b, l = ids.shape
    x = params["embed"][ids]
    if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(l), (b, l))
    is_opt = cfg.arch == "opt"
    if policy.no_act_quant and not is_opt:
        # W*A16 weight-only (reference int8_mode=1/4) or all-fp16 policy:
        # activations stay bf16 at decode too — every linear runs the
        # in-kernel-dequant bf16 GEMM / dense matmul (the llama bf16 layer
        # path). The quantized layer path would wrap 16-bit act values into
        # an int8 container and corrupt them.
        prefill_bf16 = True
    if is_opt:
        from flexq_tpu.models.opt import POS_OFFSET

        x = x + params["pos_embed"][positions + POS_OFFSET]
        cos = sin = None
    else:
        cos, sin = rope_for_cfg(positions, cfg)
    if mask is None and kv_k is None:
        mask = causal_mask(l, l, window=cfg.sliding_window)

    have_cache = kv_k is not None
    quant_cache = kv_k_scale is not None
    paged = page_table is not None
    if paged:
        assert l == 1, "paged cache is decode-only (prefill fills pages host-side)"
    lengths = None
    if have_cache:
        # valid cache tokens per sequence after this step's write
        lengths = jnp.broadcast_to(jnp.asarray(cache_pos, jnp.int32), (b,)) + l
    for i, lp in enumerate(params["layers"]):
        if not have_cache:
            kv = None
        elif paged and quant_cache:
            kv = ("paged8", kv_k, kv_v, kv_k_scale, kv_v_scale, page_table, i)
        elif paged:
            kv = ("paged", kv_k, kv_v, page_table, i)
        elif quant_cache:
            kv = (kv_k, kv_v, kv_k_scale, kv_v_scale, i)
        else:
            kv = (kv_k, kv_v, i)
        if is_opt:
            x, new_kv = opt_layer_serve(
                lp, cfg, policy, x, mask, kv=kv, cache_pos=cache_pos, lengths=lengths
            )
        elif prefill_bf16:
            x, new_kv = llama_layer_serve_prefill(
                lp, cfg, x, cos, sin, mask, kv=kv, cache_pos=cache_pos,
                lengths=lengths, window=cfg.sliding_window,
            )
        else:
            x, new_kv = llama_layer_serve(
                lp, cfg, policy, x, cos, sin, mask, kv=kv, cache_pos=cache_pos,
                lengths=lengths, window=cfg.sliding_window,
            )
        if new_kv is not None:
            if quant_cache:
                kv_k, kv_v, kv_k_scale, kv_v_scale = new_kv
            else:
                kv_k, kv_v = new_kv

    if is_opt:
        from flexq_tpu.models.opt import layernorm

        if "final_norm" in params:
            x = layernorm(
                x, params["final_norm"]["g"], params["final_norm"]["b"], cfg.norm_eps
            )
    else:
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    if last_only:
        x = x[:, -1:]
    logits = apply_lm_head(params, cfg, policy, x)
    if have_cache:
        if quant_cache:
            return logits, (kv_k, kv_v, kv_k_scale, kv_v_scale)
        return logits, (kv_k, kv_v)
    return logits, None
