"""Pallas flash-prefill attention: causal multi-query attention over the KV
cache, for the prefill / chunked-prefill / speculative-verify paths.

The jnp blockwise path (models/llama.py::_attention_blockwise) still
materializes every [Lq, chunk] score tile in HBM between the QK^T dot and
the PV dot (~0.9 GB of score traffic per 7B layer at L=2048 — XLA cannot
fuse through two matmuls). This kernel keeps the score tile in VMEM:

  grid (batch, query-head, q-block); each step streams ONLY the key blocks
  at or below its causal diagonal — the same manual double-buffered DMA loop
  with a data-dependent trip count as flash_decode (kernels/flash_decode.py,
  design lessons 1-3) — and runs the online-softmax recurrence with the
  [bq, bs] score tile never leaving VMEM.

GQA reads the kv head `h // g` directly from the cache (no repeated-K/V
materialization). Dots run in the CACHE dtype (bf16 on the serving path;
f32 caches — the CPU test configuration — stay exact). Reference parity:
this replaces GptContextAttentionLayer's unfused fp16 softmax core
(e2e GptContextAttentionLayer.cc:353 invokeMaskedSoftmax), which is full
O(L·S) with materialized scores, like the jnp fallback.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import round_up, use_interpret

_NEG = -1e30  # finite -inf stand-in (exp(_NEG - m) == 0, no NaNs)


def _flash_prefill_kernel(
    meta_ref,  # int32 [2] scalar prefetch: [layer_idx, lq_total]
    lens_ref,  # int32 [B] scalar prefetch: query-end positions (pos+Lq)
    q_ref,  # VMEM [1, 1, bq, D] (q pre-transposed to [B, H, Lq, D]: a
    #       [*, bq, 1, D] block would violate Mosaic's 8/128 block rule on
    #       the second-minor dim)
    k_hbm,  # ANY [L, B, KVH, S, D] FULL cache (see flash_decode: a per-layer
    #       slice operand would materialize a copy every call)
    ks_hbm,  # ANY [L, B, KVH, S] f32 (int8 cache only) | None
    v_hbm,  # ANY like k_hbm
    vs_hbm,  # ANY like ks_hbm | None
    o_ref,  # VMEM [1, 1, bq, D]
    k_buf,  # VMEM scratch [2, bs, D] (cache dtype)
    v_buf,  # VMEM scratch [2, bs, D]
    ks_buf,  # VMEM scratch [2, KVH, bs] f32 (int8 cache only) | None
    vs_buf,
    sem,  # DMA semaphores [2, 4]
    *,
    bs: int,
    bq: int,
    inv_sqrt_d: float,
    g: int,
    s_total: int,
    quant: bool,
    window: Optional[int] = None,
):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    li = meta_ref[0]
    lq_total = meta_ref[1]
    kv = hi // g
    # query rows of this block sit at absolute positions q0 .. q0+bq-1
    q0 = lens_ref[bi] - lq_total + qi * bq
    # stream key blocks only up to the causal diagonal (clamped to the cache)
    q_end = jnp.clip(q0 + bq, 1, s_total)
    nblk = (q_end + bs - 1) // bs
    # sliding window (Mistral): the block's OLDEST query (position q0) sets
    # the lower key bound q0-window+1; younger rows re-tighten via the mask.
    # Out-of-window key blocks are never read.
    sblk = (
        jnp.int32(0)
        if window is None
        else jnp.maximum(q0 - window + 1, 0) // bs
    )

    def dmas(slot, i):
        ds = pl.ds
        out = [
            pltpu.make_async_copy(
                k_hbm.at[li, bi, kv, ds(i * bs, bs), :], k_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[li, bi, kv, ds(i * bs, bs), :], v_buf.at[slot],
                sem.at[slot, 1],
            ),
        ]
        if quant:
            # ALL kv heads' scales per block: slicing one head at a dynamic
            # offset on the (8,128)-tiled (KVH, S) pair doesn't legalize;
            # scales are tiny so the over-read is noise, and the kernel
            # picks its head with a dynamic SUBLANE slice (allowed in VMEM)
            out.append(pltpu.make_async_copy(
                ks_hbm.at[li, bi, :, ds(i * bs, bs)], ks_buf.at[slot],
                sem.at[slot, 2],
            ))
            out.append(pltpu.make_async_copy(
                vs_hbm.at[li, bi, :, ds(i * bs, bs)], vs_buf.at[slot],
                sem.at[slot, 3],
            ))
        return out

    for dma in dmas(sblk % 2, sblk):
        dma.start()

    # compute dtype: the cache dtype (bf16 serve / f32 tests), or bf16 dots
    # over the int8 cache (int8 values upcast after the HBM read)
    cdt = jnp.bfloat16 if quant else k_buf.dtype
    qb = q_ref[0, 0].astype(cdt)  # [bq, D]
    d = qb.shape[1]
    pos_q = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    def body(i, carry):
        m, l, acc = carry  # [bq,1], [bq,1], [bq,D] f32
        slot = i % 2

        @pl.when(i + 1 < nblk)
        def _():
            for dma in dmas(1 - slot, i + 1):
                dma.start()

        for dma in dmas(slot, i):
            dma.wait()

        sco = jax.lax.dot_general(
            qb, k_buf[slot].astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d  # [bq, bs]
        if quant:
            # K dequant folded in after the dot: (q·K8)·ks == q·(K8·ks)
            sco = sco * ks_buf[slot, pl.ds(kv, 1), :]
        pos_k = i * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        ok = pos_k <= pos_q
        if window is not None:
            ok &= pos_k > pos_q - window
        sco = jnp.where(ok, sco, _NEG)

        m_new = jnp.maximum(m, jnp.max(sco, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sco - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            # V dequant folded into p: (p·vs)·V8 == p·(vs·V8)
            p = p * vs_buf[slot, pl.ds(kv, 1), :]
        pv = jax.lax.dot_general(
            p.astype(cdt), v_buf[slot].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, D]
        return m_new, l_new, acc * alpha + pv

    init = (
        jnp.full((bq, 1), _NEG, jnp.float32),
        jnp.zeros((bq, 1), jnp.float32),
        jnp.zeros((bq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(sblk, nblk, body, init)
    # fully-masked rows (padded q tail) have l == 0; guard the divide
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pick_bs(s: int, cap: int = 512) -> int:
    for t in range(min(cap, s) // 128, 0, -1):
        if s % (t * 128) == 0:
            return t * 128
    raise ValueError(f"cache length {s} must be a multiple of 128")


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_s", "interpret", "out_dtype", "window"),
)
def flash_prefill(
    q: jax.Array,  # [B, Lq, H, D] query block (bf16/f32)
    k: jax.Array,  # [L?, B, KVH, S, D] FULL cache keys (bf16/f32/int8)
    v: jax.Array,  # like k
    lengths: jax.Array,  # int32 [B]: query-end positions (cache_pos + Lq)
    k_scale: Optional[jax.Array] = None,  # f32 [L?, B, KVH, S] (int8 cache)
    v_scale: Optional[jax.Array] = None,
    *,
    layer_idx=None,  # int32 scalar for a 5-D cache
    block_q: Optional[int] = None,
    block_s: Optional[int] = None,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    window: Optional[int] = None,
) -> jax.Array:
    """Causal attention of Lq queries over the cache: query i of batch b is
    at position lengths[b]-Lq+i and attends cache keys at positions <= its
    own. Passing scale arrays selects the int8 quantized cache (scales
    folded into the math as in flash_decode / attention_core_quant).
    Returns [B, Lq, H*D]."""
    if k.ndim == 4:
        k = k[None]
        v = v[None]
        if k_scale is not None:
            k_scale = k_scale[None]
            v_scale = v_scale[None]
        layer_idx = 0
    assert layer_idx is not None, "5-D cache requires layer_idx"
    b, lq, h, d = q.shape
    _, _, kvh, s, _ = k.shape
    assert h % kvh == 0, (h, kvh)
    g = h // kvh
    quant = k_scale is not None
    if interpret is None:
        interpret = use_interpret()
    bq = block_q or min(512, round_up(lq, 128))
    lqp = round_up(lq, bq)
    if lqp != lq:
        q = jnp.pad(q, ((0, 0), (0, lqp - lq), (0, 0), (0, 0)))
    bs = block_s or _pick_bs(s)
    assert s % bs == 0

    qdt = jnp.bfloat16 if quant else k.dtype
    q = q.astype(qdt).transpose(0, 2, 1, 3)  # [B, H, Lqp, D]
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    meta = jnp.stack(
        [jnp.asarray(layer_idx, jnp.int32).reshape(()), jnp.int32(lq)]
    )

    def qo_map(bi, hi, qi, meta_, lens):
        return bi, hi, qi, 0

    kernel = functools.partial(
        _flash_prefill_kernel,
        bs=bs,
        bq=bq,
        inv_sqrt_d=1.0 / math.sqrt(d),
        g=g,
        s_total=s,
        quant=quant,
        window=window,
    )
    in_specs = [pl.BlockSpec((1, 1, bq, d), qo_map, memory_space=pltpu.VMEM)]
    args = [q, k]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(k_scale.astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(v)
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(v_scale.astype(jnp.float32))

    scratch = [
        pltpu.VMEM((2, bs, d), k.dtype),
        pltpu.VMEM((2, bs, d), v.dtype),
    ]
    if quant:
        scratch += [
            pltpu.VMEM((2, kvh, bs), jnp.float32),
            pltpu.VMEM((2, kvh, bs), jnp.float32),
        ]

        def kfull(meta_ref, lens_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm,
                  o_ref, k_buf, v_buf, ks_buf, vs_buf, sem):
            return kernel(
                meta_ref, lens_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm,
                o_ref, k_buf, v_buf, ks_buf, vs_buf, sem,
            )
    else:

        def kfull(meta_ref, lens_ref, q_ref, k_hbm, v_hbm, o_ref, k_buf,
                  v_buf, sem):
            return kernel(
                meta_ref, lens_ref, q_ref, k_hbm, None, v_hbm, None, o_ref,
                k_buf, v_buf, None, None, sem,
            )

    scratch.append(pltpu.SemaphoreType.DMA((2, 4)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, lqp // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), qo_map, memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    # causal: each q block reads ~half the diagonal's worth of K/V blocks
    out = pl.pallas_call(
        kfull,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * lq * s * d,
            bytes_accessed=b * kvh * s * d * k.dtype.itemsize + b * lq * h * d * 4,
            transcendentals=b * h * lq * s,
        ),
        interpret=interpret,
    )(meta, lengths, *args)
    out = out.transpose(0, 2, 1, 3)  # [B, Lqp, H, D]
    if lqp != lq:
        out = out[:, :lq]
    return out.reshape(b, lq, h * d)


def flash_prefill_ref(q, k, v, lengths, k_scale=None, v_scale=None,
                      window=None):
    """jnp golden model: f32 full-softmax causal attention over the cache."""
    b, lq, h, d = q.shape
    kvh, s = k.shape[1], k.shape[2]
    g = h // kvh
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale[..., None].astype(jnp.float32)
        vf = vf * v_scale[..., None].astype(jnp.float32)
    kf = jnp.repeat(kf, g, axis=1)  # [B, H, S, D]
    vf = jnp.repeat(vf, g, axis=1)
    qf = q.astype(jnp.float32)
    sco = jnp.einsum("bqhd,bhsd->bhqs", qf, kf) / math.sqrt(d)
    pos_q = (lengths[:, None] - lq + jnp.arange(lq)[None])[:, None, :, None]
    pos_k = jnp.arange(s)[None, None, None, :]
    ok = pos_k <= pos_q
    if window is not None:
        ok &= pos_k > pos_q - window
    sco = jnp.where(ok, sco, -jnp.inf)
    p = jax.nn.softmax(sco, axis=-1)
    out = jnp.einsum("bhqs,bhsd->bqhd", p, vf)
    return out.reshape(b, lq, h * d)
