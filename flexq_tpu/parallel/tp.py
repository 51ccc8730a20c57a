"""Tensor + data parallelism for the quantized serving path (shard_map).

TPU-native re-design of the reference's NCCL tensor parallelism
(e2e TensorParallelDecoderSelfAttentionLayer.cc:217,
TensorParallelGeluFfnLayer.cc:57, nccl_utils.h:90-114):

  * column-split q/k/v/gate/up (output dim over the `model` mesh axis),
  * row-split o/down (input dim over `model`), followed by one `psum` each —
    the two all-reduces per decoder layer the reference issues over NCCL ride
    ICI here, inserted explicitly inside `shard_map`.

Why shard_map and not GSPMD auto-partitioning: the quantized matmuls are
Pallas kernels, which XLA cannot re-partition — every rank must run the
kernel on its *local* weight shard with local shapes. shard_map gives exactly
that (and is the idiomatic JAX way to write an explicit-collective TP layer).

The `data` axis shards the batch (ids, masks, positions, dense KV cache);
embed/norms are replicated and the lm_head is vocab-parallel (local [H, V/tp]
matmul + tiled all_gather — the reference's vocab-TP gemm + ftNcclAllGather,
Llama.cc:1090-1130). Operands whose leading dim is not divisible by the data
axis (e.g. a B=1 admission prefill on a dp>1 mesh) run data-replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.models.llama import causal_mask, rmsnorm, rope_for_cfg
from flexq_tpu.models.quantized import llama_layer_serve

COL_LINEARS = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1")
ROW_LINEARS = ("o_proj", "down_proj", "fc2")


def make_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= tp * dp, f"need {tp*dp} devices, have {devices.size}"
    return Mesh(devices[: tp * dp].reshape(dp, tp), axis_names=("data", "model"))


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for a quantized llama param tree."""

    def layer_spec(lp):
        out = {}
        for name, val in lp.items():
            if name in COL_LINEARS and isinstance(val, dict):
                # 1-D biases shard along the same output columns (added on
                # the local shard pre-psum); 2-D planes/scales split N
                out[name] = {
                    k: (P("model") if k == "b" else P(None, "model"))
                    for k in val
                }
            elif name in ROW_LINEARS and isinstance(val, dict):
                # hi [K/2,N], lo [K/4,N], q4 [K/2,N], q8 [K,N], scale [K/G,N]
                # all shard K (dim 0); biases are added post-psum so they
                # stay replicated
                out[name] = {
                    k: (
                        P("model", None)
                        if k in ("hi", "lo", "q4", "q8", "scale", "w")
                        else P()
                    )
                    for k in val
                }
            else:
                out[name] = jax.tree_util.tree_map(lambda _: P(), val)
        return out

    specs: Dict[str, Any] = {}
    for key, val in params.items():
        if key == "layers":
            specs["layers"] = [layer_spec(lp) for lp in val]
        elif key == "lm_head":
            # vocab-parallel head (reference Llama.cc:1090-1130: vocab-TP
            # gemm + ftNcclAllGather); gathered after the local matmul.
            # Packed quantized heads split every plane/scale on the vocab dim.
            if isinstance(val, dict):
                specs[key] = {k: P(None, "model") for k in val}
            else:
                specs[key] = P(None, "model")
        else:
            specs[key] = jax.tree_util.tree_map(lambda _: P(), val)
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a quantized param tree onto the mesh per `param_specs`."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    assert cfg.num_heads % tp == 0, f"num_heads {cfg.num_heads} % tp {tp}"
    assert cfg.num_kv_heads % tp == 0, (
        f"kv_heads {cfg.num_kv_heads} must divide by tp {tp} (kv-head "
        "replication for tp>kv_heads lands in a later round)"
    )
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )


def tp_forward_local(
    params: Dict[str, Any],
    cfg: ModelConfig,
    lcfg: ModelConfig,
    policy: QuantPolicy,
    ids: jax.Array,  # [B_local, L] int32
    kv: Optional[Tuple] = None,
    positions: Optional[jax.Array] = None,
    cache_pos: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    prefill_bf16: bool = False,
    axis: str = "model",
    last_only: bool = False,
):
    """Per-rank TP forward body — must run INSIDE shard_map (params sharded
    per `param_specs`; activations replicated along `axis`). The quantized
    sub-layers return *partial* row-parallel outputs; llama_layer_serve
    psums them before the residual adds, exactly where the reference's
    TensorParallel* wrappers issue their NCCL all-reduces.

    ``kv`` formats (full local-shard buffers; scales select int8 KV):
      ("dense", k, v) | ("dense8", k, v, ks, vs)
      ("paged", pk, pv, table) | ("paged8", pk, pv, sk, sv, table)

    Returns (full-vocab logits, new cache pieces tuple or None) — the
    vocab-parallel lm_head is all-gathered so every rank holds full logits
    (sampling then runs rank-redundantly but identically).
    """
    b, l = ids.shape
    x = params["embed"][ids]
    pos = (
        positions
        if positions is not None
        else jnp.broadcast_to(jnp.arange(l), (b, l))
    )
    if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    is_opt = cfg.arch == "opt"
    if is_opt:
        # reference multi_gpu_gpt: embeddings replicated, TP inside layers
        from flexq_tpu.models.opt import POS_OFFSET

        x = x + params["pos_embed"][pos + POS_OFFSET]
        cos = sin = None
    else:
        cos, sin = rope_for_cfg(pos, cfg)
    m = mask if mask is not None else causal_mask(l, l, window=cfg.sliding_window)
    have = kv is not None
    kind = kv[0] if have else None
    if have:
        paged = kind.startswith("paged")
        table = kv[-1] if paged else None
        pieces = list(kv[1:-1] if paged else kv[1:])
    lengths = (
        jnp.broadcast_to(jnp.asarray(cache_pos, jnp.int32), (b,)) + l
        if have
        else None
    )
    for i, lp in enumerate(params["layers"]):
        if not have:
            kvi = None
        elif kind == "paged8":
            kvi = ("paged8", pieces[0], pieces[1], pieces[2], pieces[3], table, i)
        elif kind == "paged":
            kvi = ("paged", pieces[0], pieces[1], table, i)
        else:  # dense / dense8: (k, v[, ks, vs], layer_idx)
            kvi = tuple(pieces) + (i,)
        if is_opt:
            from flexq_tpu.models.quantized import opt_layer_serve

            x, new_kv = opt_layer_serve(
                lp, lcfg, policy, x, m, kv=kvi, cache_pos=cache_pos,
                tp_axis=axis, lengths=lengths,
            )
        elif policy.no_act_quant or prefill_bf16:
            # weight-only / fp16 policy (the quantized layer path would wrap
            # 16-bit activations into int8 containers — same gate as
            # forward_serve) or the compute-bound W6A16 prefill path
            from flexq_tpu.models.quantized import llama_layer_serve_prefill

            x, new_kv = llama_layer_serve_prefill(
                lp, lcfg, x, cos, sin, m, kv=kvi, cache_pos=cache_pos,
                tp_axis=axis, lengths=lengths, window=cfg.sliding_window,
            )
        else:
            x, new_kv = llama_layer_serve(
                lp, lcfg, policy, x, cos, sin, m, kv=kvi, cache_pos=cache_pos,
                tp_axis=axis, lengths=lengths, window=cfg.sliding_window,
            )
        if new_kv is not None:
            pieces[: len(new_kv)] = list(new_kv)
    if is_opt:
        from flexq_tpu.models.opt import layernorm

        if "final_norm" in params:
            x = layernorm(
                x, params["final_norm"]["g"], params["final_norm"]["b"],
                cfg.norm_eps,
            )
    else:
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    if last_only:
        # prefill/TTFT: only the last position's distribution is consumed —
        # skip the full-length vocab GEMM + gather (dead work at L=2048)
        x = x[:, -1:]
        l = 1
    head = params.get("lm_head")
    if head is None:  # tied embeddings: replicated, no gather needed
        logits = x @ params["embed"].T.astype(x.dtype)
    elif isinstance(head, dict):
        # packed quantized head: quantize the (replicated) final-norm output
        # once per rank, run the local [H, Vpad/tp] Pallas GEMM, gather, and
        # slice the vocab padding off the tail (pad columns live at the end
        # of the LAST rank's shard, so the tiled gather keeps them last)
        from flexq_tpu.kernels import quant_act
        from flexq_tpu.models.quantized import _qlinear, _qlinear_bf16

        xm = x.reshape(b * l, -1)
        abits = policy.act_bits.get("lm_head", 16)
        if abits >= 16:
            local = _qlinear_bf16(head, xm, x.dtype)
        else:
            xq, xs = quant_act(xm, abits)
            local = _qlinear(head, xq, xs, x.dtype)
        local = local.reshape(b, l, -1)
        logits = jax.lax.all_gather(local, axis, axis=2, tiled=True)
        logits = logits[:, :, : cfg.vocab_size]
    else:
        local = x @ head.astype(x.dtype)  # [B, L, V/tp]
        logits = jax.lax.all_gather(local, axis, axis=local.ndim - 1, tiled=True)
    return logits, (tuple(pieces) if have else None)


# Compiled-step cache for forward_serve_tp: rebuilding shard_map on every
# call forces a full re-trace (jit caches key on callable identity), which
# dominated eval/one-shot usage and the CPU-mesh test suite. Keyed on every
# static that shapes the traced body; jax.jit handles shape-based retraces.
_TP_FN_CACHE: Dict[Any, Any] = {}


def _policy_key(policy: QuantPolicy):
    return (
        tuple(sorted(policy.weight_bits.items())),
        tuple(sorted(policy.act_bits.items())),
        policy.w_group_size,
        policy.a_group_size,
        policy.symmetric,
    )


def forward_serve_tp(
    params: Dict[str, Any],
    cfg: ModelConfig,
    policy: QuantPolicy,
    ids: jax.Array,  # [B, L] int32
    mesh: Mesh,
    kv_k: Optional[jax.Array] = None,  # dense [L, B, KVH, max, D]
    kv_v: Optional[jax.Array] = None,  # — or paged pools [L, P, KVH, PS, D]
    cache_pos: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,  # int32 [B, maxpages] => paged
    kv_k_scale: Optional[jax.Array] = None,  # dense [L, B, KVH, max] f32
    kv_v_scale: Optional[jax.Array] = None,  # — or paged [L, P, KVH, PS]
    prefill_bf16: bool = False,
    last_only: bool = False,
):
    """TP×DP quantized forward. Returns (logits, new_kv or None) where new_kv
    is (k, v) or (k, v, ks, vs) for the int8 quantized cache.

    With ``page_table`` the cache buffers are PAGED pools (kv-head axis
    sharded over `model`). CONTRACT at dp>1: the pools' PAGE axis must be
    sharded over `data` (per-data-shard partitions) and the table must hold
    LOCALIZED page ids (PagePool.localize) — a global-id table would index
    each rank's local pool slice with out-of-range ids and read/write the
    wrong pages silently (BatchScheduler does this localization; direct
    callers must too). Scale arrays select the int8 KV cache (dense or
    paged). Batch-major operands (ids, vector cache_pos, per-slot
    masks/positions, the dense cache) shard over `data` when the batch
    divides dp; otherwise they run data-replicated.
    """
    tp = mesh.shape["model"]
    dp = mesh.shape.get("data", 1)
    lcfg = _local_cfg(cfg, tp)
    specs = param_specs(params)
    paged = page_table is not None
    quant = kv_k_scale is not None
    have_cache = kv_k is not None
    b = ids.shape[0]
    data_ax = "data" if dp > 1 and b % dp == 0 else None
    head_ax = "model" if cfg.num_kv_heads >= tp else None
    # dense: slot axis shards over data. Paged with dp>1: the pool's PAGE
    # axis shards over data (per-data-shard pool partitions; the scheduler
    # localizes table entries so each rank indexes its own shard) and the
    # table's slot axis shards alongside ids/cache_pos.
    kv_batch = data_ax
    kv_spec = P(None, kv_batch, head_ax, None, None) if have_cache else P()
    ks_spec = P(None, kv_batch, head_ax, None) if quant else P()
    have_pos = positions is not None
    have_cp = cache_pos is not None
    have_mask = mask is not None
    pos_spec = (
        P(data_ax, None)
        if have_pos and positions.ndim == 2 and positions.shape[0] == b
        else P()
    )
    cp_spec = P(data_ax) if have_cp and getattr(cache_pos, "ndim", 0) == 1 else P()
    mask_spec = (
        P(data_ax, None, None, None)
        if have_mask and mask.ndim == 4 and mask.shape[0] == b
        else P()
    )

    sent = jnp.zeros((), jnp.int32)

    # Cache a JITTED step per static config: eager shard_map re-traces its
    # body on every call (even for a reused callable), which dominated
    # eval/one-shot usage — ~15s/call of interpret-mode trace on the CPU
    # test mesh, ~0.2s cached. Only for EAGER calls: inside an outer trace
    # (ids is a Tracer — e.g. the scheduler's jitted step) a nested jit
    # perturbs sharding propagation onto the outer jit's uncommitted
    # arguments, and the outer jit caches the trace anyway. Note compiled
    # execution may differ from the eager path by float-fusion noise, which
    # act-quant rounding can amplify to ~1e-2-of-max on isolated logits.
    traced = isinstance(ids, jax.core.Tracer)
    cache_key = (
        mesh, cfg, _policy_key(policy), prefill_bf16, last_only, have_cache, paged,
        quant, have_pos, have_cp, have_mask, data_ax, kv_spec, ks_spec,
        pos_spec, cp_spec, mask_spec, jax.tree_util.tree_structure(params),
    )
    fn = None if traced else _TP_FN_CACHE.get(cache_key)
    if fn is None:

        def body(params, ids, kk, kv, ks, vs, table, pos, cp, m):
            if not have_cache:
                kv_t = None
            elif paged and quant:
                kv_t = ("paged8", kk, kv, ks, vs, table)
            elif paged:
                kv_t = ("paged", kk, kv, table)
            elif quant:
                kv_t = ("dense8", kk, kv, ks, vs)
            else:
                kv_t = ("dense", kk, kv)
            logits, pieces = tp_forward_local(
                params, cfg, lcfg, policy, ids, kv=kv_t,
                positions=pos if have_pos else None,
                cache_pos=cp if have_cp else None,
                mask=m if have_mask else None,
                prefill_bf16=prefill_bf16,
                last_only=last_only,
            )
            if pieces is None:
                pieces = (sent, sent)
            if len(pieces) == 2:
                pieces = pieces + (sent, sent)
            return (logits,) + tuple(pieces)

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                specs, P(data_ax, None), kv_spec, kv_spec, ks_spec,
                ks_spec, P(data_ax, None) if paged else P(),
                pos_spec, cp_spec, mask_spec,
            ),
            out_specs=(
                P(data_ax, None, None), kv_spec, kv_spec, ks_spec, ks_spec
            ),
            check_vma=False,
        )
        if not traced:
            fn = jax.jit(fn)
            if len(_TP_FN_CACHE) >= 64:  # bound a long-lived process's cache
                _TP_FN_CACHE.clear()
            _TP_FN_CACHE[cache_key] = fn
    logits, nk, nv, nks, nvs = fn(
        params, ids,
        kv_k if have_cache else sent, kv_v if have_cache else sent,
        kv_k_scale if quant else sent, kv_v_scale if quant else sent,
        page_table if paged else sent,
        positions if have_pos else sent,
        cache_pos if have_cp else sent,
        mask if have_mask else sent,
    )
    if not have_cache:
        return logits, None
    return logits, ((nk, nv, nks, nvs) if quant else (nk, nv))


def replicate_kv_heads(params: Dict[str, Any], cfg: ModelConfig, tp: int):
    """Expand K/V projections so kv_heads >= tp (dense params, pre-quant).

    When tp exceeds the model's kv-head count (e.g. llama-2-70B kv_heads=8
    on 16 ranks), each kv head is replicated tp/kv_heads times so every rank
    owns exactly one copy — the standard Megatron/FT treatment (the
    reference sizes weights by /tensor_para_size_ and requires
    kv_head_num % tp == 0 likewise). Each head's D-column block is repeated
    contiguously, matching repeat_kv's query→kv-head grouping, so GQA
    semantics are unchanged. Returns (new_params, new_cfg).

    Granularity limits (toy-model scale only — real 7B+ shapes satisfy
    both): each rank's K/V shard width (kv_heads_local * head_dim) must be
    >= 128 lanes, and row-parallel scale rows (K/128) must divide by tp.
    """
    if cfg.num_kv_heads >= tp:
        return params, cfg
    assert tp % cfg.num_kv_heads == 0, (tp, cfg.num_kv_heads)
    f = tp // cfg.num_kv_heads
    d = cfg.head_dim

    def expand(w):  # [in, KVH*D] -> [in, KVH*f*D]
        k_in = w.shape[0]
        return (
            jnp.repeat(w.reshape(k_in, cfg.num_kv_heads, d), f, axis=1)
            .reshape(k_in, cfg.num_kv_heads * f * d)
        )

    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for lp in params["layers"]:
        lp = dict(lp)
        for name in ("k_proj", "v_proj"):
            fc = dict(lp[name])
            fc["w"] = expand(fc["w"])
            if fc.get("b") is not None:
                fc["b"] = jnp.repeat(
                    fc["b"].reshape(cfg.num_kv_heads, d), f, axis=0
                ).reshape(-1)
            lp[name] = fc
        out["layers"].append(lp)
    new_cfg = dataclasses.replace(cfg, num_kv_heads=cfg.num_kv_heads * f)
    return out, new_cfg
