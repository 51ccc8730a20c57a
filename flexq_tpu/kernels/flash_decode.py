"""Pallas flash-decode attention: single-query attention over the KV cache.

TPU-native replacement for the reference's decoder masked-MHA kernel family
(e2e kernels/decoder_masked_multihead_attention/*.cu — one CUDA block per
batch×head streaming the fp16 cache). Decode attention is purely
HBM-bandwidth-bound on the KV cache, so the design goals are:

  1. Read the int8 quantized cache + per-(token, head) scales *in-kernel*
     (int8 → bf16 convert on VPU after the HBM read). The XLA fallback
     materializes a dequantized bf16 copy of the cache in HBM, which made
     the int8 cache *slower* than bf16 (13.4 vs 11.5 ms/step at 7B).
  2. Stream only ceil(len/BS) key blocks per batch row: the block index map
     clamps past-length grid steps to the last valid block, and Pallas
     skips the DMA when the block index does not change — the XLA path
     must read (and mask) the full max_seq_len cache every step.
  3. Process a BLOCK of kv-heads per grid step (batched head-wise dots):
     one grid step per (batch, head) drowned in per-step overhead
     (measured 16 ms/step of pure grid overhead at 7B B=4 — more than the
     whole model's matmuls), so heads ride the second block axis instead.
  4. GQA without materializing repeated K/V: the G = H/KVH query heads of a
     group attend to their kv-head's blocks inside one grid step.

Cache layout: [B, KVH, S, D] (sequence second-minor) so each (batch,
head-block) DMA is contiguous per head row. Online softmax carries
(m, l, acc) in VMEM scratch across the sequence grid axis — the same flash
recurrence as models/llama.py::_attention_blockwise.
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
    lens_ref,  # int32 [B] (scalar prefetch)
    q_ref,  # [1, HB, G, D] bf16
    k_ref,  # [1, HB, BS, D] int8 | bf16
    ks_ref,  # [1, HB, 1, 1, BS] f32 (quant only; see scale reshape in wrapper)
    v_ref,  # [1, HB, BS, D]
    vs_ref,  # [1, HB, 1, 1, BS] f32 (quant only)
    o_ref,  # [1, HB, G, D]
    m_scr,  # f32 [HB, G, 128]
    l_scr,  # f32 [HB, G, 128]
    acc_scr,  # f32 [HB, G, D]
    *,
    bs: int,
    inv_sqrt_d: float,
    quant: bool,
):
    b = pl.program_id(0)
    s = pl.program_id(2)
    ns = pl.num_programs(2)
    ln = jnp.clip(lens_ref[b], 1, ns * bs)

    @pl.when(s == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(s * bs < ln)
    def _():
        qb = q_ref[0].astype(jnp.bfloat16)  # [HB, G, D]
        kb = k_ref[0].astype(jnp.bfloat16)  # [HB, BS, D]
        # head-batched q·kᵀ: contract D, batch over the head block
        sco = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, G, BS]
        sco = sco * inv_sqrt_d
        if quant:
            # K dequant folded in after the dot: (q·K8)·ks == q·(K8·ks)
            sco = sco * ks_ref[0, :, 0, 0][:, None, :]
        pos = s * bs + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs), 2)
        sco = jnp.where(pos < ln, sco, _NEG)

        m_old = m_scr[:, :, :1]  # [HB, G, 1]
        m_new = jnp.maximum(m_old, jnp.max(sco, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(sco - m_new)  # [HB, G, BS]
        l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            # V dequant folded into p: (p·vs)·V8 == p·(vs·V8)
            p = p * vs_ref[0, :, 0, 0][:, None, :]
        vb = v_ref[0].astype(jnp.bfloat16)  # [HB, BS, D]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, G, D]
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(s == ns - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :, :1]).astype(o_ref.dtype)


def _pick_bs(s: int, cap: int = 512) -> int:
    for t in range(min(cap, s) // 128, 0, -1):
        if s % (t * 128) == 0:
            return t * 128
    raise ValueError(f"cache length {s} must be a multiple of 128")


def _pick_hb(kvh: int, bs: int, d: int, itemsize: int, budget: int = 2 << 20) -> int:
    """Largest divisor of kvh whose K block fits the VMEM budget."""
    for hb in range(kvh, 0, -1):
        if kvh % hb == 0 and hb * bs * d * itemsize <= budget:
            return hb
    return 1


@functools.partial(
    jax.jit, static_argnames=("block_s", "block_h", "interpret", "out_dtype")
)
def flash_decode(
    q: jax.Array,  # [B, H, D] single-step queries
    k: jax.Array,  # [B, KVH, S, D] cache keys (bf16 or int8)
    v: jax.Array,  # [B, KVH, S, D] cache values
    lengths: jax.Array,  # int32 [B] valid tokens per sequence
    k_scale: Optional[jax.Array] = None,  # f32 [B, KVH, S] (int8 cache)
    v_scale: Optional[jax.Array] = None,
    *,
    block_s: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Single-token attention over a (possibly int8-quantized) KV cache.

    Returns [B, H*D]. Math (quant case) matches
    models/llama.py::attention_core_quant: scores = (q·K8)·ks/√d,
    out = Σ (softmax(scores)·vs)·V8 — scales folded in, never a dequantized
    cache copy in HBM.
    """
    b, h, d = q.shape
    _, kvh, s, _ = k.shape
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
    ns = s // bs

    def _last_block(lens, bi):
        # clamp past-length steps to the last valid block: same index ⇒
        # Pallas skips the DMA, so only ceil(len/bs) blocks are ever read;
        # the clip guards callers passing lengths > S
        last = (jnp.clip(lens[bi], 1, s) + bs - 1) // bs - 1
        return jnp.maximum(last, 0)

    def kv_map(bi, hi, si, lens):
        return bi, hi, jnp.minimum(si, _last_block(lens, bi)), 0

    def sc_map(bi, hi, si, lens):
        # scales are host-reshaped to [B, KVH, NS, 1, BS] — a (1,HB,1,1,BS)
        # block keeps the last two dims Mosaic-legal ((1, BS): full extent ×
        # lane multiple), which a (1,HB,BS) block of [B, KVH, S] is not
        return bi, hi, jnp.minimum(si, _last_block(lens, bi)), 0, 0

    def qo_map(bi, hi, si, lens):
        return bi, hi, 0, 0

    sc_block = pl.BlockSpec((1, hb, 1, 1, bs), sc_map, memory_space=pltpu.VMEM)

    def sc_reshape(sc):
        return sc.astype(jnp.float32).reshape(b, kvh, ns, 1, bs)

    in_specs = [
        pl.BlockSpec((1, hb, g, d), qo_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, bs, d), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [qg, k]
    if quant:
        in_specs.append(sc_block)
        args.append(sc_reshape(k_scale))
    in_specs.append(pl.BlockSpec((1, hb, bs, d), kv_map, memory_space=pltpu.VMEM))
    args.append(v)
    if quant:
        in_specs.append(sc_block)
        args.append(sc_reshape(v_scale))

    kernel = functools.partial(
        _flash_decode_kernel,
        bs=bs,
        inv_sqrt_d=1.0 / math.sqrt(d),
        quant=quant,
    )
    if not quant:
        # keep kernel signature uniform: drop the scale refs
        def kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):  # noqa: F811
            return _flash_decode_kernel(
                lens_ref, q_ref, k_ref, None, v_ref, None, o_ref,
                m_scr, l_scr, acc_scr,
                bs=bs, inv_sqrt_d=1.0 / math.sqrt(d), quant=False,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh // hb, ns),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, g, d), qo_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hb, g, 128), jnp.float32),
            pltpu.VMEM((hb, g, 128), jnp.float32),
            pltpu.VMEM((hb, g, d), jnp.float32),
        ],
    )
    kv_bytes = 2 * b * kvh * s * d * k.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * d,
            bytes_accessed=kv_bytes + b * h * d * 4,
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(lengths, *args)
    return out.reshape(b, h * d)


def flash_decode_ref(q, k, v, lengths, k_scale=None, v_scale=None):
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
    sco = jnp.where(pos < lengths[:, None, None, None], sco, -jnp.inf)
    p = jax.nn.softmax(sco, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, vf)
    return out.reshape(b, h * d)
