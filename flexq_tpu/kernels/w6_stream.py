"""Manual-DMA decode W6Ax matmul (triple-buffered weight streaming).

Experimental alternative to kernels/w6_matmul.py's auto-pipelined kernel for
the decode case (M ≤ 32): the measured e2e stream rate is ~74% of HBM peak,
consistent with a per-grid-step bubble that Mosaic's 2-stage auto-pipeline
cannot hide. Here the weight planes stay in HBM (ANY) and the kernel runs
its own 3-deep DMA pipeline over K blocks (the structure that made
flash_decode bandwidth-exact), with activations/scales resident in VMEM.

Same math as w6_matmul: biased SWAR unpack, int8 MXU dot per 128-group,
exact −32·Σx bias correction, per-group f32 scale accumulate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import GROUP_SIZE, largest_divisor_tile, round_up, use_interpret
from flexq_tpu.kernels.w6_matmul import _unpack_w_block
from flexq_tpu.packing.pack6 import BIAS

NBUF = 3


def _kernel(
    x_ref,  # VMEM [bm, K] int8 (whole activations)
    xs_ref,  # VMEM [K/G, bm, 1] f32 (group leading)
    hi_hbm,  # ANY [K/2, N]
    lo_hbm,  # ANY [K/4, N]
    ws_ref,  # VMEM [K/G, 1, bn] f32 (this n-block's scales)
    o_ref,  # VMEM [bm, bn]
    hi_buf,  # VMEM scratch [NBUF, bk/2, bn]
    lo_buf,  # VMEM scratch [NBUF, bk/4, bn]
    acc_ref,  # VMEM scratch [bm, bn] f32
    sem,  # DMA [NBUF, 2]
    *,
    bm: int,
    bn: int,
    bk: int,
    out_dtype,
    nbuf: int = NBUF,
):
    NBUF = nbuf
    j = pl.program_id(0)
    k_total = x_ref.shape[1]
    nk = k_total // bk
    n0 = j * bn

    def dmas(slot, i):
        ds = pl.ds
        return [
            pltpu.make_async_copy(
                hi_hbm.at[ds(i * (bk // 2), bk // 2), ds(n0, bn)],
                hi_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                lo_hbm.at[ds(i * (bk // 4), bk // 4), ds(n0, bn)],
                lo_buf.at[slot],
                sem.at[slot, 1],
            ),
        ]

    for i in range(min(NBUF - 1, nk)):
        for d in dmas(i % NBUF, i):
            d.start()

    ngb = bk // GROUP_SIZE

    def body(i, acc):
        slot = i % NBUF

        @pl.when(i + (NBUF - 1) < nk)
        def _():
            for d in dmas((i + NBUF - 1) % NBUF, i + NBUF - 1):
                d.start()

        for d in dmas(slot, i):
            d.wait()

        w = _unpack_w_block(hi_buf[slot], lo_buf[slot], bk, bn)  # biased u8
        for g in range(ngb):
            gi = i * ngb + g
            xg = x_ref[:, pl.ds(gi * GROUP_SIZE, GROUP_SIZE)]
            wg = w[g * GROUP_SIZE : (g + 1) * GROUP_SIZE, :]
            part = jax.lax.dot_general(
                xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            rowsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
            part = part - BIAS * rowsum
            sg = xs_ref[gi] * ws_ref[gi]
            acc = acc + part.astype(jnp.float32) * sg
        return acc

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((bm, bn), jnp.float32))
    o_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_n", "block_k", "interpret", "nbuf")
)
def w6_matmul_stream(
    x_q: jax.Array,  # int8 [M, K]
    x_scale: jax.Array,  # f32 [M, K/128]
    w_hi: jax.Array,  # int8 [K/2, N]
    w_lo: jax.Array,  # int8 [K/4, N]
    w_scale: jax.Array,  # f32 [K/128, N]
    *,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    nbuf: int = NBUF,
) -> jax.Array:
    m, k = x_q.shape
    n = w_hi.shape[1]
    assert m <= 32, "stream kernel is decode-only"
    if interpret is None:
        interpret = use_interpret()
    bn = block_n or largest_divisor_tile(n, cap=8192)
    bk = block_k or largest_divisor_tile(k, cap=256)
    bm = round_up(m, 8)
    if bm != m:
        x_q = jnp.pad(x_q, ((0, bm - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, bm - m), (0, 0)))
    ng = k // GROUP_SIZE
    xs_t = x_scale.astype(jnp.float32).T.reshape(ng, bm, 1)
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)

    out = pl.pallas_call(
        functools.partial(
            _kernel, bm=bm, bn=bn, bk=bk, out_dtype=out_dtype, nbuf=nbuf
        ),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, bm, 1), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ng, 1, bn), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, bk // 2, bn), jnp.int8),
            pltpu.VMEM((nbuf, bk // 4, bn), jnp.int8),
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * k,
            bytes_accessed=bm * k + (k * n * 3) // 4 + bm * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, xs_t, w_hi, w_lo, ws_t)
    return out[:m] if bm != m else out
