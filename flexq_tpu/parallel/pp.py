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
from flexq_tpu.models.llama import causal_mask, rmsnorm, rope_cos_sin
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
    stacked = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
        "layers_stacked": stack_layers(params["layers"]),
    }
    if "lm_head" in params:
        stacked["lm_head"] = params["lm_head"]
    specs = {
        "embed": P(),
        "final_norm": jax.tree_util.tree_map(lambda _: P(), params["final_norm"]),
        "layers_stacked": jax.tree_util.tree_map(
            lambda _: P("pipe"), stacked["layers_stacked"]
        ),
    }
    if "lm_head" in params:
        # packed quantized heads are dicts of planes/scales: replicate each
        specs["lm_head"] = jax.tree_util.tree_map(lambda _: P(), params["lm_head"])
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), stacked, specs
    )


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
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        mask = causal_mask(l, l)
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
        in_specs=(
            {
                "embed": P(),
                "final_norm": jax.tree_util.tree_map(
                    lambda _: P(), params["final_norm"]
                ),
                **(
                    {"lm_head": P()} if "lm_head" in params else {}
                ),
                "layers_stacked": jax.tree_util.tree_map(
                    lambda _: P("pipe"), params["layers_stacked"]
                ),
            },
            P(),
        ),
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
    """One pipelined decode step with a layer-sharded KV cache.

    The reference's decode PP (Llama.cc:970-1240): each step the activation
    hops stage boundaries (ftNcclSend/Recv, LlamaDecoder.cc:285-296) and the
    last stage samples. Here each stage scans its local layer slab (updating
    its local cache shard at cache_pos) and hands the hidden state to the
    next stage with ppermute; the last stage's logits are psum-broadcast.
    Serial across stages per token — the same latency shape as the
    reference; use TP for latency, PP for fitting more layers (SURVEY §2.4).

    Returns (logits [B, 1, V], (kv_k, kv_v)).
    """
    pp = mesh.shape["pipe"]
    nl_local = cfg.num_layers // pp
    b = ids.shape[0]

    def body(params, ids, kv_k, kv_v, pos):
        my_stage = jax.lax.axis_index("pipe")
        positions = jnp.broadcast_to(pos, (b, 1))
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        s_max = kv_k.shape[3]
        ki = jnp.arange(s_max)[None, :]
        mask = jnp.where(ki <= pos, 0.0, jnp.finfo(jnp.float32).min)[None, None]
        lengths = jnp.broadcast_to(pos, (b,)) + 1

        def run_stage(x, kvk, kvv):
            def layer_body(carry, inp):
                x, kvk, kvv = carry
                lp, i = inp
                x, new_kv = llama_layer_serve(
                    lp, cfg, policy, x, cos, sin, mask,
                    kv=(kvk, kvv, i), cache_pos=pos, lengths=lengths,
                )
                return (x, new_kv[0], new_kv[1]), None

            idx = jnp.arange(nl_local)
            (x, kvk, kvv), _ = jax.lax.scan(
                layer_body, (x, kvk, kvv), (params["layers_stacked"], idx)
            )
            return x, kvk, kvv

        x = jnp.where(
            my_stage == 0,
            params["embed"][ids],
            jnp.zeros((b, 1, cfg.hidden_size), params["embed"].dtype),
        )
        final = jnp.zeros_like(x)
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(pp):
            active = my_stage == t
            x2, kv_k, kv_v = jax.lax.cond(
                active,
                run_stage,
                lambda x, kvk, kvv: (x, kvk, kvv),
                x, kv_k, kv_v,
            )
            if t == pp - 1:
                final = x2  # only valid on the last stage
            else:
                x = jax.lax.ppermute(x2, "pipe", perm)

        h = rmsnorm(final, params["final_norm"], cfg.norm_eps)
        from flexq_tpu.models.quantized import apply_lm_head

        logits = apply_lm_head(params, cfg, policy, h)
        logits = jax.lax.psum(
            jnp.where(my_stage == pp - 1, logits, jnp.zeros_like(logits)), "pipe"
        )
        return logits, kv_k, kv_v

    param_specs = {
        "embed": P(),
        "final_norm": jax.tree_util.tree_map(lambda _: P(), params["final_norm"]),
        **({"lm_head": P()} if "lm_head" in params else {}),
        "layers_stacked": jax.tree_util.tree_map(
            lambda _: P("pipe"), params["layers_stacked"]
        ),
    }
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P(), P("pipe"), P("pipe"), P()),
        out_specs=(P(), P("pipe"), P("pipe")),
        check_vma=False,
    )
    if not isinstance(ids, jax.core.Tracer):
        key = ("decode", mesh, cfg, _pp_policy_key(policy), ids.shape,
               kv_k.shape, str(kv_k.dtype), jax.tree_util.tree_structure(params))
        if key not in _PP_FN_CACHE:
            if len(_PP_FN_CACHE) >= 64:  # bound a long-lived process's cache
                _PP_FN_CACHE.clear()
            _PP_FN_CACHE[key] = jax.jit(fn)
        fn = _PP_FN_CACHE[key]
    logits, kv_k, kv_v = fn(params, ids, kv_k, kv_v, jnp.asarray(cache_pos, jnp.int32))
    return logits, (kv_k, kv_v)
