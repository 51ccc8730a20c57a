"""Pallas W4 quantized matmul for TPU (weight-only W4A16 + exact W4A8).

The reference benchmarks FlexQ against a W4A16 weight-only GEMM (CUTLASS
fpA_intB runners, int8_mode=4 — e2e README.md:157-162) inherited from
FasterTransformer. This module is the TPU-native equivalent of that baseline
path, built on the same design as kernels/w6_matmul.py:

  HBM:  4-bit packed nibble plane (packing/pack4.py) + per-group(128)
        scales — 4 bits/weight of traffic, 1.5x less than W6.
  VMEM: SWAR unpack — `pltpu.bitcast` packs 4 consecutive K-rows into one
        int32 lane word; two masked shifts reconstruct the biased-unsigned
        int8 tile (values in [0, 15], BIAS4 = 8).
  MXU:  int8 dots (W4A8) or bf16 dots after in-kernel dequant (W4A16).
  VPU:  fused per-group dequant; the bias correction is exact integer
        algebra:  Σ_k x·(u−8) = Σ_k x·u − 8·Σ_k x.

`w4_matmul`      — W4A8: int8 per-token-group activations, exact-int path
                   (exceeds the reference, whose W4 path is activation-fp16
                   only). The decode analogue of w6_matmul.
`w4_matmul_bf16` — W4A16: bf16 activations, weights dequantized in-kernel
                   (the direct parity path for int8_mode=4).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import (
    GROUP_SIZE,
    rope_epilogue,
    round_up,
    use_interpret,
)
from flexq_tpu.kernels.w6_matmul import _pick_blocks
from flexq_tpu.packing.pack4 import BIAS4, PACK_KT

_M0F = 0x0F0F0F0F


def _unpack_w4_block(plane_blk: jax.Array, bk: int, bn: int) -> jax.Array:
    """SWAR-unpack a [bk/2, bn] nibble plane into biased-unsigned int8
    [bk, bn] (values in [0, 15]).

    Same word-wide trick as w6_matmul._unpack_w_block: bitcast(int8→int32)
    packs 4 consecutive sublanes (K-rows) per word, so the two masked shifts
    below unpack 4 rows at once with no per-byte sign handling.
    """
    nt = bk // PACK_KT
    p32 = pltpu.bitcast(plane_blk, jnp.int32).reshape(nt, 16, bn)
    a = p32 & _M0F  # K-rows [0, 64): low nibbles
    b = (p32 >> 4) & _M0F  # K-rows [64, 128): high nibbles
    w32 = jnp.concatenate([a, b], axis=1)  # [nt, 32, bn] words == 128 rows
    return pltpu.bitcast(w32.reshape(bk // 4, bn), jnp.int8)


def _w4_matmul_kernel(
    x_ref,  # int8 [bm, bk]
    xs_ref,  # f32  [bk/G, bm, 1]
    w_ref,  # int8 [bk/2, bn] packed nibbles
    ws_ref,  # f32  [bk/G, 1, bn]
    o_ref,  # out  [bm, bn]
    acc_ref,  # f32 scratch [bm, bn]
    *,
    bk: int,
    out_dtype,
):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_w4_block(w_ref[:], bk, w_ref.shape[1])  # biased [0, 15]

    acc = acc_ref[:]
    for g in range(bk // GROUP_SIZE):
        xg = x_ref[:, g * GROUP_SIZE : (g + 1) * GROUP_SIZE]
        wg = w[g * GROUP_SIZE : (g + 1) * GROUP_SIZE, :]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        rowsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
        part = part - BIAS4 * rowsum  # exact bias correction
        acc = acc + part.astype(jnp.float32) * (xs_ref[g] * ws_ref[g])
    acc_ref[:] = acc

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def w4_matmul(
    x_q: jax.Array,  # int8 [M, K] quantized activations
    x_scale: jax.Array,  # f32 [M, K/128]
    w_q4: jax.Array,  # int8 [K/2, N] packed (biased) nibbles
    w_scale: jax.Array,  # f32 [K/128, N]
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """W4A8 exact-int GEMM: out = Σ_g (Σ_{k∈g} x·w) · xs[m,g] · ws[g,n]."""
    m, k = x_q.shape
    n = w_q4.shape[1]
    assert k % GROUP_SIZE == 0 and w_q4.shape == (k // 2, n)
    assert x_scale.shape == (m, k // GROUP_SIZE)
    assert w_scale.shape == (k // GROUP_SIZE, n)
    if interpret is None:
        interpret = use_interpret()

    abm, abn, abk = _pick_blocks(m, n, k, exact_int=True)
    bm = block_m or abm
    bn = block_n or abn
    bk = block_k or abk
    mp = round_up(m, bm)
    if mp != m:
        x_q = jnp.pad(x_q, ((0, mp - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, mp - m), (0, 0)))

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    xs_t = x_scale.astype(jnp.float32).T.reshape(ng, mp, 1)
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)

    out = pl.pallas_call(
        functools.partial(_w4_matmul_kernel, bk=bk, out_dtype=out_dtype),
        grid=(mp // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ngb, bm, 1), lambda i, j, kk: (kk, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + k * n // 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, xs_t, w_q4, ws_t)
    return out[:m] if mp != m else out


def _w4_bf16_kernel(
    x_ref,  # bf16 [bm, bk]
    w_ref,  # int8 [bk/2, bn]
    ws_ref,  # f32  [bk/G, 1, bn]
    *rest,  # with rope: (cos_ref [bm,128] f32, sin2_ref [bm,128] f32) then
    #         o_ref [bm, bn], acc_ref f32 scratch [bm, bn]
    bm: int,
    bk: int,
    out_dtype,
    rope: bool = False,
):
    """W4A16 tile kernel; ``rope=True`` adds the fused RoPE epilogue (see
    w6_matmul.py _w6_bf16_kernel — same contract: head_dim == 128)."""
    if rope:
        cos_ref, sin2_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bn = w_ref.shape[1]
    w_u = _unpack_w4_block(w_ref[:], bk, bn)  # biased [0, 15]
    ngroups = bk // GROUP_SIZE
    ws = ws_ref[:].reshape(ngroups, 1, bn)
    ws_rep = pltpu.repeat(ws, GROUP_SIZE, axis=1).reshape(bk, bn)
    w_deq = ((w_u.astype(jnp.float32) - BIAS4) * ws_rep).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_deq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_step == nk - 1)
    def _():
        if rope:
            o_ref[:] = rope_epilogue(
                acc_ref[:], cos_ref, sin2_ref, bm, bn, out_dtype
            )
        else:
            o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def w4_matmul_bf16(
    x: jax.Array,  # bf16/f32 [M, K] full-precision activations
    w_q4: jax.Array,  # int8 [K/2, N]
    w_scale: jax.Array,  # f32 [K/128, N]
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    rope_cos: Optional[jax.Array] = None,  # f32 [M, 128]: fused rope epilogue
    rope_sin2: Optional[jax.Array] = None,  # f32 [M, 128] = (-sin | sin)
) -> jax.Array:
    """W4A16 weight-only GEMM: the reference's int8_mode=4 parity path.

    ``rope_cos``/``rope_sin2``: fused RoPE on the f32 accumulator (q/k
    projections at prefill; head_dim == 128) — see w6_matmul_bf16."""
    m, k = x.shape
    n = w_q4.shape[1]
    assert k % GROUP_SIZE == 0 and w_q4.shape == (k // 2, n)
    rope = rope_cos is not None
    if rope:
        assert rope_sin2 is not None and rope_cos.shape == (m, 128)
    if interpret is None:
        interpret = use_interpret()

    abm, abn, abk = _pick_blocks(m, n, k, rope=rope)
    bm = block_m or abm
    bn = block_n or abn
    bk = block_k or abk
    mp = round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    x = x.astype(jnp.bfloat16)

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM
        ),
    ]
    operands = [x, w_q4, ws_t]
    kernel = functools.partial(
        _w4_bf16_kernel, bm=bm, bk=bk, out_dtype=out_dtype, rope=rope
    )
    if rope:
        cs_spec = pl.BlockSpec(
            (bm, 128), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs += [cs_spec, cs_spec]

        def pad_cs(a):
            a = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a
            return a.astype(jnp.float32)

        operands += [pad_cs(rope_cos), pad_cs(rope_sin2)]

    out = pl.pallas_call(
        kernel,
        grid=(mp // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + k * n // 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m] if mp != m else out


def w4_matmul_ref(x_q, x_scale, w_q4, w_scale, out_dtype=jnp.float32):
    """Golden reference via unpacked int8 in plain jnp (analogue of the
    reference's CPU compute_ref, engine/test_bgemm_kernel.cu:113-146)."""
    from flexq_tpu.packing.pack4 import unpack4

    m, k = x_q.shape
    w = unpack4(w_q4)  # signed int8 [K, N]
    n = w.shape[1]
    ng = k // GROUP_SIZE
    xg = x_q.astype(jnp.int32).reshape(m, ng, GROUP_SIZE)
    wg = w.astype(jnp.int32).reshape(ng, GROUP_SIZE, n)
    parts = jnp.einsum("mgk,gkn->mgn", xg, wg).astype(jnp.float32)
    out = jnp.einsum(
        "mgn,mg,gn->mn", parts, x_scale.astype(jnp.float32),
        w_scale.astype(jnp.float32),
    )
    return out.astype(out_dtype)


def w4_matmul_bf16_ref(x, w_q4, w_scale, out_dtype=jnp.float32):
    from flexq_tpu.packing.pack4 import unpack4

    k = x.shape[1]
    w = unpack4(w_q4).astype(jnp.float32)
    ws = jnp.repeat(w_scale.astype(jnp.float32), GROUP_SIZE, axis=0)
    wdq = (w * ws).astype(jnp.bfloat16)
    return (x.astype(jnp.bfloat16) @ wdq).astype(out_dtype)
