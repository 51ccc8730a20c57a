"""Ring attention: sequence/context parallelism over the ICI ring.

The reference has NO sequence parallelism of any kind — its max context is
hard-bounded by one GPU's KV memory and a full O(L²) fp16 softmax
(SURVEY.md §5 long-context row). This module shards the SEQUENCE over a
mesh axis: each device holds an L/sp slice of Q/K/V, K/V chunks circulate
around the ring with `lax.ppermute` while every device folds each visiting
chunk into its queries' online softmax — attention memory O((L/sp)²) per
device and the N-fold sequence capacity of the mesh.

`ring_attention` is the shard_map-ready primitive (numerically the flash
recurrence of models/llama.py::_attention_blockwise, distributed);
`forward_sp` runs the dense eval forward with the sequence axis sharded —
long-context perplexity evaluation beyond one chip's memory.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexq_tpu.config import ModelConfig

_NEG = -1e30


def ring_attention(
    q: jax.Array,  # local [B, C, H, D] query chunk (C = L / sp)
    k: jax.Array,  # local [B, C, KVH, D]
    v: jax.Array,
    axis_name: str,
    num_kv_groups: int = 1,
    causal: bool = True,
) -> jax.Array:
    """Distributed causal attention; call inside shard_map with the sequence
    sharded over `axis_name`. Returns the local output chunk [B, C, H*D].
    """
    b, c, h, d = q.shape
    sp = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=2)
        v = jnp.repeat(v, num_kv_groups, axis=2)
    qf = q.astype(jnp.float32)
    scale = 1.0 / math.sqrt(d)
    # receive from the next rank, send to the previous: after step t the
    # chunk that started on rank r sits on rank r - t (src = my + t)
    perm = [(i, (i - 1) % sp) for i in range(sp)]

    q_pos = my * c + jnp.arange(c)  # global positions of local queries

    def step(carry, t):
        m, l, acc, kc, vc = carry
        src = (my + t) % sp  # origin rank of the visiting chunk
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kc.astype(jnp.float32)) * scale
        if causal:
            k_pos = src * c + jnp.arange(c)
            mask = q_pos[:, None] >= k_pos[None, :]  # [C, C]
            s = jnp.where(mask[None, None], s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bhqk,bkhd->bhqd", p, vc.astype(jnp.float32))
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (m_new, l, acc, kc, vc), None

    init = (
        jnp.full((b, h, c, 1), _NEG, jnp.float32),
        jnp.zeros((b, h, c, 1), jnp.float32),
        jnp.zeros((b, h, c, d), jnp.float32),
        k,
        v,
    )
    (m, l, acc, _, _), _ = jax.lax.scan(step, init, jnp.arange(sp))
    # fully-masked rows (can't happen causally: token attends to itself)
    out = (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, c, h * d)


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= sp
    return Mesh(devices[:sp].reshape(sp), axis_names=("seq",))


def forward_sp(
    params: Dict[str, Any],
    cfg: ModelConfig,
    ids: jax.Array,  # [B, L], L % sp == 0
    mesh: Mesh,
) -> jax.Array:
    """Dense full-sequence forward with the SEQUENCE sharded over `seq`:
    every per-token op (embed, norms, linears, lm_head) runs on local
    slices; attention runs the K/V ring. Logits come back sequence-sharded
    and are gathered. The long-context eval path the reference lacks."""
    from flexq_tpu.models.llama import act_fn, apply_rope, rmsnorm, rope_for_cfg

    sp = mesh.shape["seq"]
    if cfg.sliding_window is not None:
        raise NotImplementedError(
            "ring-attention SP path does not implement sliding-window masks"
        )
    b, l = ids.shape
    assert l % sp == 0, f"L={l} must divide over sp={sp}"
    c = l // sp

    def body(params, ids_local):
        my = jax.lax.axis_index("seq")
        positions = my * c + jnp.broadcast_to(jnp.arange(c), (b, c))
        cos, sin = rope_for_cfg(positions, cfg)
        x = params["embed"][ids_local]
        if cfg.embed_scale is not None:  # Gemma: x *= sqrt(hidden)
            x = x * jnp.asarray(cfg.embed_scale, x.dtype)
        for lp in params["layers"]:
            h = rmsnorm(x, lp["input_norm"], cfg.norm_eps)
            q = (h @ lp["q_proj"]["w"]).reshape(b, c, cfg.num_heads, cfg.head_dim)
            k = (h @ lp["k_proj"]["w"]).reshape(b, c, cfg.num_kv_heads, cfg.head_dim)
            v = (h @ lp["v_proj"]["w"]).reshape(b, c, cfg.num_kv_heads, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            attn = ring_attention(q, k, v, "seq", cfg.num_kv_groups, causal=True)
            x = x + attn @ lp["o_proj"]["w"]
            h = rmsnorm(x, lp["post_norm"], cfg.norm_eps)
            gate = h @ lp["gate_proj"]["w"]
            up = h @ lp["up_proj"]["w"]
            act = act_fn(cfg.act, gate.astype(jnp.float32)).astype(gate.dtype) * up
            x = x + act @ lp["down_proj"]["w"]
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
        head = params.get("lm_head")
        if head is None:
            head = params["embed"].T
        return x @ head.astype(x.dtype)  # local [B, C, V]

    specs = jax.tree_util.tree_map(lambda _: P(), params)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(None, "seq")),
        out_specs=P(None, "seq", None),
        check_vma=False,
    )
    return fn(params, ids)
