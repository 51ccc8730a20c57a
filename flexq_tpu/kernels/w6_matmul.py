"""Pallas W6Ax quantized matmul for TPU.

TPU-native replacement for the reference's bit-serial BTC GEMM
(engine/src/bgemm/flexq_bmma_kernel.h:97-447). The reference emulates W6A6/
W6A8 with 1-bit `and.popc` MMAs because GPUs lack a native INT6 MMA; the TPU
MXU has native int8×int8→int32, so the speed-of-light design is:

  HBM:  6-bit packed weight planes (hi-nibble + lo-crumb, packing/pack6.py)
        + per-group(128) scales — 6 bits/weight of traffic, the decode
        bottleneck.
  VMEM: unpack planes → int8 tile (shift/mask on int32 lanes, sublane concat)
  MXU:  one int8 dot per K-group (contraction 128 == one systolic pass)
  VPU:  per-group dequant fused into the accumulation:
        acc_f32 += P_g(int32) · x_scale[m,g] · w_scale[g,n]
        (the analogue of the reference's in-loop cfrag dequant,
        flexq_bmma_kernel.h:360-373)

W6A6 and W6A8 are the same kernel: activation values are quantized to the
6- or 8-bit range upstream but both live in an int8 container — int6
activations would only shave activation bytes, which are negligible next to
weight bytes, and the MXU computes int8 natively either way.

Exactness: the integer dot and f32 scale algebra reproduce the fake-quant
oracle (quant/quantizer.py) to f32 rounding, so perplexity measured on the
fake-quant path transfers to the serving path.
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
    largest_divisor_tile,
    round_up,
    use_interpret,
)
from flexq_tpu.packing.pack6 import PACK_KT


def _unpack_w_block(hi_blk: jax.Array, lo_blk: jax.Array, bk: int, bn: int) -> jax.Array:
    """Unpack a [bk/2, bn] hi plane + [bk/4, bn] lo plane into int8 [bk, bn].

    Mirrors packing/pack6.py:unpack6 with kt=PACK_KT; runs on int32 lanes.
    """
    nt = bk // PACK_KT
    h, q = PACK_KT // 2, PACK_KT // 4
    hi32 = hi_blk.astype(jnp.int32) & 0xFF
    lo32 = lo_blk.astype(jnp.int32) & 0xFF
    hi_t = hi32.reshape(nt, h, bn)
    lo_t = lo32.reshape(nt, q, bn)
    lo_nib = ((hi_t & 0xF) << 28) >> 26  # hi*4 for rows [0, kt/2)
    hi_nib = ((hi_t >> 4) << 28) >> 26  # hi*4 for rows [kt/2, kt)
    hi_full = jnp.concatenate([lo_nib, hi_nib], axis=1)
    crumbs = jnp.concatenate(
        [lo_t & 3, (lo_t >> 2) & 3, (lo_t >> 4) & 3, (lo_t >> 6) & 3], axis=1
    )
    return (hi_full | crumbs).reshape(bk, bn).astype(jnp.int8)


def _w6_matmul_kernel(
    x_ref,  # int8 [bm, bk]
    xs_ref,  # f32  [bk/G, bm, 1]  (group axis leading: static sublane index)
    hi_ref,  # int8 [bk/2, bn]
    lo_ref,  # int8 [bk/4, bn]
    ws_ref,  # f32  [bk/G, 1, bn]
    o_ref,  # out  [bm, bn]
    acc_ref,  # f32 scratch [bm, bn]
    *,
    bm: int,
    bn: int,
    bk: int,
    out_dtype,
):
    # Scales carry the group axis as the *leading* dim so each group's
    # [bm,1] / [1,bn] factor is a static index — Mosaic cannot lower dynamic
    # lane-dim offsets, and this layout needs no in-kernel transpose.
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_w_block(hi_ref[:], lo_ref[:], bk, bn)

    ngroups = bk // GROUP_SIZE
    acc = acc_ref[:]
    for g in range(ngroups):
        xg = x_ref[:, g * GROUP_SIZE : (g + 1) * GROUP_SIZE]
        wg = w[g * GROUP_SIZE : (g + 1) * GROUP_SIZE, :]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # fused per-group dequant: int32 partial × (x_scale ⊗ w_scale)
        sg = xs_ref[g] * ws_ref[g]
        acc = acc + part.astype(jnp.float32) * sg
    acc_ref[:] = acc

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def w6_matmul(
    x_q: jax.Array,  # int8 [M, K] quantized activations (6- or 8-bit values)
    x_scale: jax.Array,  # f32 [M, K/128] per-token per-group scales
    w_hi: jax.Array,  # int8 [K/2, N] packed hi nibbles
    w_lo: jax.Array,  # int8 [K/4, N] packed lo crumbs
    w_scale: jax.Array,  # f32 [K/128, N] per-group weight scales
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """out[m,n] = Σ_g (Σ_{k∈g} x_q·w_q) · x_scale[m,g] · w_scale[g,n].

    The serving-path analogue of FLEXQGEMMWrapper::gemm
    (e2e .../flexq_gemm_wrapper.cu:21-97), with block sizes chosen per shape
    instead of a hand-tuned 325-config table.
    """
    m, k = x_q.shape
    n = w_hi.shape[1]
    assert k % GROUP_SIZE == 0, f"K={k} must be a multiple of {GROUP_SIZE}"
    assert w_hi.shape == (k // 2, n) and w_lo.shape == (k // 4, n)
    assert x_scale.shape == (m, k // GROUP_SIZE)
    assert w_scale.shape == (k // GROUP_SIZE, n)

    if interpret is None:
        interpret = use_interpret()

    # M is ragged at serve time (decode batch); pad to the f32 sublane tile.
    bm = block_m or min(round_up(m, 8), 256)
    mp = round_up(m, bm)
    if mp != m:
        x_q = jnp.pad(x_q, ((0, mp - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, mp - m), (0, 0)))
    bn = block_n or min(largest_divisor_tile(n), 512)
    bk = block_k or min(largest_divisor_tile(k), 512)

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    # group axis leading (see kernel docstring)
    xs_t = x_scale.astype(jnp.float32).T.reshape(ng, mp, 1)
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)

    grid = (mp // bm, n // bn, k // bk)
    kernel = functools.partial(
        _w6_matmul_kernel, bm=bm, bn=bn, bk=bk, out_dtype=out_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ngb, bm, 1), lambda i, j, kk: (kk, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 4, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
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
            bytes_accessed=mp * k + (k * n * 3) // 4 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, xs_t, w_hi, w_lo, ws_t)
    return out[:m] if mp != m else out


def w6_matmul_ref(x_q, x_scale, w_hi, w_lo, w_scale, out_dtype=jnp.float32):
    """Golden reference: same math via unpacked int8 in plain jnp.

    TPU analogue of the reference's CPU bit-serial compute_ref
    (engine/test_bgemm_kernel.cu:113-146).
    """
    from flexq_tpu.packing.pack6 import unpack6

    m, k = x_q.shape
    w = unpack6(w_hi, w_lo)  # int8 [K, N]
    n = w.shape[1]
    ng = k // GROUP_SIZE
    xg = x_q.astype(jnp.int32).reshape(m, ng, GROUP_SIZE)
    wg = w.astype(jnp.int32).reshape(ng, GROUP_SIZE, n)
    # exact integer per-group partials, then f32 scale algebra
    parts = jnp.einsum("mgk,gkn->mgn", xg, wg).astype(jnp.float32)
    out = jnp.einsum(
        "mgn,mg,gn->mn", parts, x_scale.astype(jnp.float32), w_scale.astype(jnp.float32)
    )
    return out.astype(out_dtype)
