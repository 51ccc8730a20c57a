"""Pipeline parallelism (GPipe-style) for the quantized forward.

Reference parity: FasterTransformer assigns a contiguous layer range per
pipeline rank (`num_layer_/pipeline_para_.world_size_`, Llama.cc:112), sends
activations between stage boundaries with NCCL send/recv
(LlamaDecoder.cc:285-296) and micro-batches via getLocalBatchSize
(Llama.cc:974-979). The TPU-native re-design:

  * per-layer param pytrees are STACKED on a leading layer axis and sharded
    over the `pipe` mesh axis — each stage holds a [L/pp, ...] slab and runs
    its layers with `lax.scan`;
  * the classic GPipe schedule runs M microbatches through pp stages in
    M + pp − 1 ticks, passing activations to the next stage with
    `jax.lax.ppermute` over ICI each tick;
  * stage 0 embeds, the last stage norms + projects to logits; results are
    gathered at the end (every device returns the full logits for
    simplicity — the last stage's copy is authoritative).

v1 scope: full-sequence forward (evaluation / prefill); decode-with-cache
over PP lands later (the reference itself prefers TP for latency — PP's
per-step boundary hops hurt decode).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.models.llama import causal_mask, rmsnorm, rope_for_cfg, span_mask
from flexq_tpu.models.quantized import llama_layer_serve


def make_pipe_mesh(pp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= pp
    return Mesh(devices[:pp].reshape(pp), axis_names=("pipe",))


def stack_layers(layers) -> Any:
    """List of identical-structure layer pytrees -> single pytree with a
    leading layer axis (sharded over `pipe`)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def shard_params_pp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Stack per-layer trees on a leading `pipe`-sharded axis; every other
    entry (embed, norms, OPT pos_embed, packed/bf16 lm_head) replicates."""
    stacked = {
        k: v for k, v in params.items() if k != "layers"
    }
    stacked["layers_stacked"] = stack_layers(params["layers"])
    specs = {
        k: jax.tree_util.tree_map(lambda _: P(), v)
        for k, v in stacked.items()
        if k != "layers_stacked"
    }
    specs["layers_stacked"] = jax.tree_util.tree_map(
        lambda _: P("pipe"), stacked["layers_stacked"]
    )
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), stacked, specs
    )


def _pp_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    specs = {
        k: jax.tree_util.tree_map(lambda _: P(), v)
        for k, v in params.items()
        if k != "layers_stacked"
    }
    specs["layers_stacked"] = jax.tree_util.tree_map(
        lambda _: P("pipe"), params["layers_stacked"]
    )
    return specs


# Compiled-step caches: rebuilding shard_map per call would re-trace every
# step (jit keys on callable identity). Keyed on the statics baked into the
# traced body (shapes included — mb/l/nl_local are Python constants there).
_PP_FN_CACHE: Dict[Any, Any] = {}


def _pp_policy_key(policy: QuantPolicy):
    from flexq_tpu.parallel.tp import _policy_key

    return _policy_key(policy)


def forward_serve_pp(
    params: Dict[str, Any],  # output of shard_params_pp
    cfg: ModelConfig,
    policy: QuantPolicy,
    ids: jax.Array,  # [B, L] — B must divide into num_microbatches
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
) -> jax.Array:
    """Pipelined full-sequence quantized forward -> logits [B, L, V]."""
    pp = mesh.shape["pipe"]
    b, l = ids.shape
    m = num_microbatches or min(b, pp)
    assert b % m == 0, f"batch {b} must divide into {m} microbatches"
    mb = b // m

    def body(params, ids):
        my_stage = jax.lax.axis_index("pipe")
        positions = jnp.broadcast_to(jnp.arange(l), (mb, l))
        cos, sin = rope_for_cfg(positions, cfg)
        mask = causal_mask(l, l, window=cfg.sliding_window)
        micro = ids.reshape(m, mb, l)

        def run_stage(x):
            def layer_body(carry, lp):
                out, _ = llama_layer_serve(
                    lp, cfg, policy, carry, cos, sin, mask
                )
                return out, None

            out, _ = jax.lax.scan(layer_body, x, params["layers_stacked"])
            return out

        h = cfg.hidden_size
        x_hold = jnp.zeros((mb, l, h), params["embed"].dtype)
        outputs = jnp.zeros((m, mb, l, h), params["embed"].dtype)
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        for t in range(m + pp - 1):
            # stage 0 injects microbatch t; others take the ppermuted input
            inject = params["embed"][micro[min(t, m - 1)]]
            if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
                inject = inject * jnp.asarray(cfg.embed_scale, inject.dtype)
            x_in = jnp.where(my_stage == 0, inject, x_hold)
            x_out = run_stage(x_in)
            # pass to the next stage over ICI (boundary send/recv analogue)
            x_hold = jax.lax.ppermute(x_out, "pipe", perm)
            # last stage banks its result for microbatch t - (pp - 1)
            out_idx = t - (pp - 1)
            bank = jnp.logical_and(my_stage == pp - 1, out_idx >= 0)
            outputs = jax.lax.cond(
                bank,
                lambda o: jax.lax.dynamic_update_slice(
                    o, x_out[None], (jnp.maximum(out_idx, 0), 0, 0, 0)
                ),
                lambda o: o,
                outputs,
            )

        x = outputs.reshape(b, l, h)
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
        from flexq_tpu.models.quantized import apply_lm_head

        logits = apply_lm_head(params, cfg, policy, x)
        # broadcast the last stage's logits to everyone (psum of masked copy)
        logits = jax.lax.psum(
            jnp.where(my_stage == pp - 1, logits, jnp.zeros_like(logits)), "pipe"
        )
        return logits

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(_pp_param_specs(params), P()),
        out_specs=P(),
        check_vma=False,
    )
    # cached-jit only for eager calls (see tp.py: eager shard_map re-traces
    # every call; a nested jit perturbs outer-jit sharding propagation)
    if not isinstance(ids, jax.core.Tracer):
        key = ("prefill", mesh, cfg, _pp_policy_key(policy), m, ids.shape,
               jax.tree_util.tree_structure(params))
        if key not in _PP_FN_CACHE:
            if len(_PP_FN_CACHE) >= 64:  # bound a long-lived process's cache
                _PP_FN_CACHE.clear()
            _PP_FN_CACHE[key] = jax.jit(fn)
        fn = _PP_FN_CACHE[key]
    return fn(params, ids)


def shard_cache_pp(mesh: Mesh, *arrays):
    """Place KV-cache buffers [L, B, ...] with the layer axis over `pipe`."""
    return tuple(
        jax.device_put(a, NamedSharding(mesh, P("pipe"))) for a in arrays
    )


def serve_step_pp(
    params: Dict[str, Any],  # output of shard_params_pp
    cfg: ModelConfig,
    policy: QuantPolicy,
    ids: jax.Array,  # [B, L] (prefill) or [B, 1] (decode)
    mesh: Mesh,
    kv: Tuple,  # (k, v) or (k, v, ks, vs); [L, B, KVH, S, D(/-)] P("pipe")
    cache_pos,  # int32 first write position: scalar, or [B] per-slot
    last_only: bool = False,  # head over the last position only (serving)
):
    """One pipelined SERVING forward over the pipe mesh — prefill ([B, L]
    writing the cache at 0..L-1) and decode ([B, 1] at cache_pos) share
    this; int8 KV passes (k, v, ks, vs); OPT models route through
    opt_layer_serve with position embeddings added at stage 0.

    The reference serves with pipeline_para through the full engine: per
    layer-range rank, boundary ftNcclSend/Recv of the hidden state and a
    final-stage lm_head + broadcast (Llama.cc:970-1240,
    LlamaDecoder.cc:285-296,453-462; OPT: ParallelGptDecoder.cc:382-524).
    Here each stage scans its local layer slab (updating its local cache
    shard), hands the activation on with ppermute over ICI, and the last
    stage's logits are psum-broadcast. Serial across stages per step — the
    same latency shape as the reference; TP for latency, PP for capacity.

    Returns (logits [B, L|1, V], new kv tuple).
    """
    pp = mesh.shape["pipe"]
    nl_local = cfg.num_layers // pp
    b, l = ids.shape
    quant = len(kv) == 4
    is_opt = cfg.arch == "opt"

    def body(params, ids, pos, *kv_t):
        my_stage = jax.lax.axis_index("pipe")
        sv = jnp.broadcast_to(pos, (b,))  # per-slot starts (scalar bcast)
        positions = sv[:, None] + jnp.broadcast_to(jnp.arange(l), (b, l))
        if is_opt:
            cos = sin = None
        else:
            cos, sin = rope_for_cfg(positions, cfg)
        s_max = kv_t[0].shape[3]
        mask = span_mask(positions, s_max, cfg.sliding_window)
        lengths = sv + l

        def run_stage(x, *kv_s):
            def layer_body(carry, inp):
                x, *kv_c = carry
                lp, i = inp
                kvi = tuple(kv_c) + (i,)
                if is_opt:
                    from flexq_tpu.models.quantized import opt_layer_serve

                    x, new_kv = opt_layer_serve(
                        lp, cfg, policy, x, mask, kv=kvi, cache_pos=pos,
                        lengths=lengths,
                    )
                else:
                    x, new_kv = llama_layer_serve(
                        lp, cfg, policy, x, cos, sin, mask,
                        kv=kvi, cache_pos=pos, lengths=lengths,
                        window=cfg.sliding_window,
                    )
                return (x,) + tuple(new_kv), None

            idx = jnp.arange(nl_local)
            out, _ = jax.lax.scan(
                layer_body, (x,) + tuple(kv_s), (params["layers_stacked"], idx)
            )
            return out

        x0 = params["embed"][ids]
        if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
            x0 = x0 * jnp.asarray(cfg.embed_scale, x0.dtype)
        if is_opt:
            from flexq_tpu.models.opt import POS_OFFSET

            x0 = x0 + params["pos_embed"][positions + POS_OFFSET]
        x = jnp.where(
            my_stage == 0, x0, jnp.zeros_like(x0)
        )
        final = jnp.zeros_like(x)
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(pp):
            active = my_stage == t
            out = jax.lax.cond(
                active,
                run_stage,
                lambda x, *kv_s: (x,) + tuple(kv_s),
                x, *kv_t,
            )
            x2, kv_t = out[0], out[1:]
            if t == pp - 1:
                final = x2  # only valid on the last stage
            else:
                x = jax.lax.ppermute(x2, "pipe", perm)

        if last_only:
            final = final[:, -1:]
        if is_opt:
            from flexq_tpu.models.opt import layernorm

            h = layernorm(
                final, params["final_norm"]["g"], params["final_norm"]["b"],
                cfg.norm_eps,
            )
        else:
            h = rmsnorm(final, params["final_norm"], cfg.norm_eps)
        from flexq_tpu.models.quantized import apply_lm_head

        logits = apply_lm_head(params, cfg, policy, h)
        logits = jax.lax.psum(
            jnp.where(my_stage == pp - 1, logits, jnp.zeros_like(logits)), "pipe"
        )
        return (logits,) + tuple(kv_t)

    kv_specs = (P("pipe"),) * len(kv)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(_pp_param_specs(params), P(), P()) + kv_specs,
        out_specs=(P(),) + kv_specs,
        check_vma=False,
    )
    if not isinstance(ids, jax.core.Tracer):
        key = ("serve", mesh, cfg, _pp_policy_key(policy), ids.shape,
               last_only, kv[0].shape, str(kv[0].dtype), len(kv),
               jax.tree_util.tree_structure(params))
        if key not in _PP_FN_CACHE:
            if len(_PP_FN_CACHE) >= 64:  # bound a long-lived process's cache
                _PP_FN_CACHE.clear()
            # donate the cache: without it every PP decode step double-
            # buffers the full KV (PP exists to FIT bigger models)
            _PP_FN_CACHE[key] = jax.jit(
                fn, donate_argnums=tuple(range(3, 3 + len(kv)))
            )
        fn = _PP_FN_CACHE[key]
    out = fn(params, ids, jnp.asarray(cache_pos, jnp.int32), *kv)
    return out[0], tuple(out[1:])


def decode_step_pp(
    params: Dict[str, Any],  # output of shard_params_pp
    cfg: ModelConfig,
    policy: QuantPolicy,
    ids: jax.Array,  # [B, 1] last tokens
    mesh: Mesh,
    kv_k: jax.Array,  # [L, B, KVH, S, D], layer axis sharded P("pipe")
    kv_v: jax.Array,
    cache_pos: jax.Array,  # scalar int32
):
    """One pipelined decode step (bf16 dense KV) — see serve_step_pp."""
    logits, kv = serve_step_pp(
        params, cfg, policy, ids, mesh, (kv_k, kv_v), cache_pos
    )
    return logits, kv
