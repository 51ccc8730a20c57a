"""Pallas flash-decode attention: single-query attention over the KV cache.

TPU-native replacement for the reference's decoder masked-MHA kernel family
(e2e kernels/decoder_masked_multihead_attention/*.cu — one CUDA block per
batch×head streaming the fp16 cache). Decode attention is purely
HBM-bandwidth-bound on the KV cache, so the design goals are:

  1. Read the int8 quantized cache + per-(token, head) scales *in-kernel*
     (int8 → bf16 convert on VPU after the HBM read). The XLA fallback
     materializes a dequantized bf16 copy of the cache in HBM, which made
     the int8 cache *slower* than bf16 (13.4 vs 11.5 ms/step at 7B).
  2. Read ONLY ceil(len/BS) key blocks per sequence: K/V stay in HBM and the
     kernel runs its own double-buffered DMA loop with a *data-dependent*
     trip count from the prefetched lengths. (A grid-over-blocks version
     that clamped the index map — relying on Pallas's revisited-block DMA
     skip — measured as if it streamed the full cache every step on real
     TPU; manual DMA makes the saving unconditional.)
  3. One grid step per (batch, kv-head-block): head-batched dots amortize
     per-step overhead (a grid step per (batch, head) pair cost ~16 ms/step
     at 7B B=4 — more than the model's matmuls).
  4. GQA without materializing repeated K/V: the G = H/KVH query heads of a
     group attend to their kv-head's blocks inside one grid step.

Cache layout: [B, KVH, S, D] (sequence second-minor) so each (batch,
head-block, seq-block) DMA is one dense strided copy. Online softmax carries
(m, l, acc) as fori_loop values — the same flash recurrence as
models/llama.py::_attention_blockwise.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import use_interpret

_NEG = -1e30  # finite -inf stand-in: exp(-1e30 - m) == 0, no NaNs on masked blocks


def _flash_decode_kernel(
    meta_ref,  # int32 [2] (scalar prefetch): [layer_idx, unused]
    lens_ref,  # int32 [B] (scalar prefetch)
    table_ref,  # int32 [B, MAXPAGES] (scalar prefetch; paged mode) | None
    q_ref,  # VMEM [1, HB, G, D] bf16
    k_hbm,  # ANY  [L, B, KVH, S, D] — or paged pool [L, P, KVH, PS, D].
    #        FULL buffers: passing a per-layer slice would make XLA
    #        materialize a copy of the slice as the custom-call operand
    #        (~8.6 GB/step at 7B B=4)
    ks_hbm,  # ANY [L, B, KVH, S] f32 (quant only) | pool [L, P, KVH, PS]
    v_hbm,  # ANY  like k_hbm
    vs_hbm,  # ANY like ks_hbm (quant only)
    o_ref,  # VMEM [1, HB, G, D]
    k_buf,  # VMEM scratch [2, HB, BS, D]
    v_buf,  # VMEM scratch [2, HB, BS, D]
    ks_buf,  # VMEM scratch [2, HB, BS] f32 (quant only; else None)
    vs_buf,
    sem,  # DMA semaphores [2, 4]
    *,
    bs: int,
    hb: int,
    inv_sqrt_d: float,
    quant: bool,
    s_total: int,
    window: Optional[int] = None,
):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    li = meta_ref[0]
    ln = jnp.clip(lens_ref[b], 1, s_total)
    nblk = (ln + bs - 1) // bs
    # sliding window (Mistral): the query at ln-1 attends keys in
    # [ln-window, ln) only — start the DMA loop at the window's first block
    # so out-of-window cache blocks are never read (the window REDUCES
    # decode reads at long fill, unlike the mask-only jnp path)
    lo = jnp.int32(0) if window is None else jnp.maximum(ln - window, 0)
    sblk = lo // bs
    h0 = hi * hb
    paged = table_ref is not None

    def dmas(slot, i):
        ds = pl.ds
        if paged:
            # block i of sequence b lives in pool page table[b, i]
            pg = table_ref[b, i]
            k_src = k_hbm.at[li, pg, ds(h0, hb), :, :]
            v_src = v_hbm.at[li, pg, ds(h0, hb), :, :]
            ks_src = ks_hbm.at[li, pg, ds(h0, hb), :] if quant else None
            vs_src = vs_hbm.at[li, pg, ds(h0, hb), :] if quant else None
        else:
            k_src = k_hbm.at[li, b, ds(h0, hb), ds(i * bs, bs), :]
            v_src = v_hbm.at[li, b, ds(h0, hb), ds(i * bs, bs), :]
            ks_src = ks_hbm.at[li, b, ds(h0, hb), ds(i * bs, bs)] if quant else None
            vs_src = vs_hbm.at[li, b, ds(h0, hb), ds(i * bs, bs)] if quant else None
        out = [
            pltpu.make_async_copy(k_src, k_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(v_src, v_buf.at[slot], sem.at[slot, 1]),
        ]
        if quant:
            out.append(pltpu.make_async_copy(ks_src, ks_buf.at[slot], sem.at[slot, 2]))
            out.append(pltpu.make_async_copy(vs_src, vs_buf.at[slot], sem.at[slot, 3]))
        return out

    for dma in dmas(sblk % 2, sblk):
        dma.start()

    qb = q_ref[0].astype(jnp.bfloat16)  # [HB, G, D]
    g, d = qb.shape[1], qb.shape[2]

    def body(i, carry):
        m, l, acc = carry  # [HB,G,1], [HB,G,1], [HB,G,D] f32
        slot = i % 2

        @pl.when(i + 1 < nblk)
        def _():
            for dma in dmas(1 - slot, i + 1):
                dma.start()

        for dma in dmas(slot, i):
            dma.wait()

        kb = k_buf[slot].astype(jnp.bfloat16)  # [HB, BS, D]
        sco = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, G, BS]
        sco = sco * inv_sqrt_d
        if quant:
            # K dequant folded in after the dot: (q·K8)·ks == q·(K8·ks)
            sco = sco * ks_buf[slot][:, None, :]
        pos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs), 2)
        ok = pos < ln
        if window is not None:
            ok &= pos >= lo
        sco = jnp.where(ok, sco, _NEG)

        m_new = jnp.maximum(m, jnp.max(sco, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sco - m_new)  # [HB, G, BS]
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            # V dequant folded into p: (p·vs)·V8 == p·(vs·V8)
            p = p * vs_buf[slot][:, None, :]
        vb = v_buf[slot].astype(jnp.bfloat16)  # [HB, BS, D]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, G, D]
        return m_new, l_new, acc * alpha + pv

    init = (
        jnp.full((hb, g, 1), _NEG, jnp.float32),
        jnp.zeros((hb, g, 1), jnp.float32),
        jnp.zeros((hb, g, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(sblk, nblk, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_bs(s: int, cap: int = 512) -> int:
    for t in range(min(cap, s) // 128, 0, -1):
        if s % (t * 128) == 0:
            return t * 128
    raise ValueError(f"cache length {s} must be a multiple of 128")


def _pick_hb(kvh: int, bs: int, d: int, itemsize: int, budget: int = 2 << 20) -> int:
    """Largest divisor of kvh whose per-slot K buffer fits the VMEM budget.

    Head-block starts land at multiples of hb, and the scale arrays carry
    (KVH, S) as their tiled (8, 128) pair — so hb must be a multiple of 8
    (or the full extent, offset always 0) for the HBM slice to legalize.
    13B's kvh=40 picked hb=20 under the old rule and failed to compile
    (offset 20 is not sublane-aligned); kvh=32's hb=16 was legal by luck.
    """
    for hb in range(kvh, 0, -1):
        if kvh % hb or (hb % 8 and hb != kvh):
            continue
        if hb * bs * d * itemsize <= budget:
            return hb
    return 8 if kvh % 8 == 0 else kvh


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "block_h", "interpret", "out_dtype", "window"),
)
def flash_decode(
    q: jax.Array,  # [B, H, D] single-step queries
    k: jax.Array,  # [L?, B, KVH, S, D] FULL cache keys (bf16 or int8)
    v: jax.Array,  # [L?, B, KVH, S, D] cache values
    lengths: jax.Array,  # int32 [B] valid tokens per sequence
    k_scale: Optional[jax.Array] = None,  # f32 [L?, B, KVH, S] (int8 cache)
    v_scale: Optional[jax.Array] = None,
    *,
    layer_idx=None,  # int32 scalar: which layer of a 5-D cache to attend over
    block_s: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    window: Optional[int] = None,
) -> jax.Array:
    """Single-token attention over a (possibly int8-quantized) KV cache.

    ``window`` (static) applies Mistral sliding-window attention: only keys
    at positions [len-window, len) are attended — and only their cache
    blocks are read.

    Accepts either a per-layer [B, KVH, S, D] view (4-D; layer_idx ignored)
    or the FULL [L, B, KVH, S, D] cache with `layer_idx` — preferred in the
    serving graph: handing XLA a per-layer slice as a custom-call operand
    materializes a copy of that slice every step (measured ~10.7 ms/step of
    pure copies at 7B B=4 bf16), while the full-cache form stays a view and
    the kernel DMAs [layer, batch, heads, block] directly.

    Returns [B, H*D]. Math (quant case) matches
    models/llama.py::attention_core_quant: scores = (q·K8)·ks/√d,
    out = Σ (softmax(scores)·vs)·V8 — scales folded in, never a dequantized
    cache copy in HBM.
    """
    if k.ndim == 4:
        k = k[None]
        v = v[None]
        if k_scale is not None:
            k_scale = k_scale[None]
            v_scale = v_scale[None]
        layer_idx = 0
    assert layer_idx is not None, "5-D cache requires layer_idx"
    b, h, d = q.shape
    _, _, kvh, s, _ = k.shape
    assert h % kvh == 0, (h, kvh)
    g = h // kvh
    quant = k_scale is not None
    if interpret is None:
        interpret = use_interpret()
    bs = block_s or _pick_bs(s)
    assert s % bs == 0
    hb = block_h or _pick_hb(kvh, bs, d, k.dtype.itemsize)
    assert kvh % hb == 0

    qg = q.reshape(b, kvh, g, d).astype(jnp.bfloat16)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    meta = jnp.asarray(layer_idx, jnp.int32).reshape(-1)[:1]
    meta = jnp.concatenate([meta, jnp.zeros((1,), jnp.int32)])

    def qo_map(bi, hi, meta, lens):
        return bi, hi, 0, 0

    in_specs = [
        pl.BlockSpec((1, hb, g, d), qo_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [qg, k]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(k_scale.astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(v)
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(v_scale.astype(jnp.float32))

    kernel = functools.partial(
        _flash_decode_kernel,
        bs=bs,
        hb=hb,
        inv_sqrt_d=1.0 / math.sqrt(d),
        quant=quant,
        s_total=s,
        window=window,
    )
    scratch = [
        pltpu.VMEM((2, hb, bs, d), k.dtype),
        pltpu.VMEM((2, hb, bs, d), v.dtype),
    ]
    if quant:
        scratch += [
            pltpu.VMEM((2, hb, bs), jnp.float32),
            pltpu.VMEM((2, hb, bs), jnp.float32),
        ]

        def kfull(meta_ref, lens_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm,
                  o_ref, k_buf, v_buf, ks_buf, vs_buf, sem):
            return kernel(
                meta_ref, lens_ref, None, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm,
                o_ref, k_buf, v_buf, ks_buf, vs_buf, sem,
            )
    else:

        def kfull(meta_ref, lens_ref, q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sem):
            return kernel(
                meta_ref, lens_ref, None, q_ref, k_hbm, None, v_hbm, None, o_ref,
                k_buf, v_buf, None, None, sem,
            )

    scratch.append(pltpu.SemaphoreType.DMA((2, 4)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvh // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, g, d), qo_map, memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kv_bytes = 2 * b * kvh * s * d * k.dtype.itemsize
    out = pl.pallas_call(
        kfull,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * d,
            bytes_accessed=kv_bytes + b * h * d * 4,
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(meta, lengths, *args)
    return out.reshape(b, h * d)


def flash_decode_ref(q, k, v, lengths, k_scale=None, v_scale=None,
                     window=None):
    """jnp golden model (f32 softmax over the valid prefix)."""
    b, h, d = q.shape
    _, kvh, s, _ = k.shape
    g = h // kvh
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale[..., None].astype(jnp.float32)
        vf = vf * v_scale[..., None].astype(jnp.float32)
    qg = q.reshape(b, kvh, g, d).astype(jnp.float32)
    sco = jnp.einsum("bhgd,bhsd->bhgs", qg, kf) / math.sqrt(d)
    pos = jnp.arange(s)[None, None, None, :]
    ok = pos < lengths[:, None, None, None]
    if window is not None:
        ok &= pos >= lengths[:, None, None, None] - window
    sco = jnp.where(ok, sco, -jnp.inf)
    p = jax.nn.softmax(sco, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, vf)
    return out.reshape(b, h * d)


@functools.partial(
    jax.jit, static_argnames=("block_h", "interpret", "out_dtype", "window")
)
def flash_decode_paged(
    q: jax.Array,  # [B, H, D] single-step queries
    pool_k: jax.Array,  # [L, P, KVH, PS, D] page pool (bf16 or int8)
    pool_v: jax.Array,
    page_table: jax.Array,  # int32 [B, MAXPAGES]: logical block i -> page id
    lengths: jax.Array,  # int32 [B] valid tokens per sequence
    k_scale: Optional[jax.Array] = None,  # f32 [L, P, KVH, PS] (int8 pool)
    v_scale: Optional[jax.Array] = None,
    *,
    layer_idx,
    block_h: Optional[int] = None,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    window: Optional[int] = None,
) -> jax.Array:
    """Single-token attention over a PAGED KV cache (vLLM-style).

    The manual-DMA loop makes paging nearly free: instead of a contiguous
    block index, each iteration fetches pool page `page_table[b, i]` from
    the prefetched table. The reference has no paging (dense per-GPU cache,
    Llama.cc:112-115); this exceeds parity. Same math as flash_decode.
    """
    b, h, d = q.shape
    _, npages_pool, kvh, ps, _ = pool_k.shape
    assert h % kvh == 0
    g = h // kvh
    assert ps % 128 == 0, f"page size {ps} must be a multiple of 128"
    quant = k_scale is not None
    if interpret is None:
        interpret = use_interpret()
    # Mosaic memref_slice requires minor-dim (lane) extents in 128-tile
    # multiples on real TPU; there is no jnp fallback for the paged pool, so
    # fail with a clear message instead of an AOT compile error.
    assert interpret or d % 128 == 0, (
        f"paged flash decode needs head_dim % 128 == 0 on TPU (got {d}); "
        "use a dense cache for sub-128 head dims"
    )
    hb = block_h or _pick_hb(kvh, ps, d, pool_k.dtype.itemsize)
    assert kvh % hb == 0
    max_pages = page_table.shape[1]
    s_virtual = max_pages * ps  # logical capacity bound

    qg = q.reshape(b, kvh, g, d).astype(jnp.bfloat16)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    meta = jnp.asarray(layer_idx, jnp.int32).reshape(-1)[:1]
    meta = jnp.concatenate([meta, jnp.zeros((1,), jnp.int32)])
    table = jnp.asarray(page_table, jnp.int32)

    def qo_map(bi, hi, meta_, lens, tbl):
        return bi, hi, 0, 0

    in_specs = [
        pl.BlockSpec((1, hb, g, d), qo_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [qg, pool_k]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(k_scale.astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(pool_v)
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(v_scale.astype(jnp.float32))

    kernel = functools.partial(
        _flash_decode_kernel,
        bs=ps,
        hb=hb,
        inv_sqrt_d=1.0 / math.sqrt(d),
        quant=quant,
        s_total=s_virtual,
        window=window,
    )
    if quant:

        def kfull(meta_ref, lens_ref, tbl_ref, q_ref, k_hbm, ks_hbm, v_hbm,
                  vs_hbm, o_ref, k_buf, v_buf, ks_buf, vs_buf, sem):
            return kernel(
                meta_ref, lens_ref, tbl_ref, q_ref, k_hbm, ks_hbm, v_hbm,
                vs_hbm, o_ref, k_buf, v_buf, ks_buf, vs_buf, sem,
            )
    else:

        def kfull(meta_ref, lens_ref, tbl_ref, q_ref, k_hbm, v_hbm, o_ref,
                  k_buf, v_buf, sem):
            return kernel(
                meta_ref, lens_ref, tbl_ref, q_ref, k_hbm, None, v_hbm, None,
                o_ref, k_buf, v_buf, None, None, sem,
            )

    scratch = [
        pltpu.VMEM((2, hb, ps, d), pool_k.dtype),
        pltpu.VMEM((2, hb, ps, d), pool_v.dtype),
    ]
    if quant:
        scratch += [
            pltpu.VMEM((2, hb, ps), jnp.float32),
            pltpu.VMEM((2, hb, ps), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, 4)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kvh // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, g, d), qo_map, memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kfull,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, lengths, table, *args)
    return out.reshape(b, h * d)
