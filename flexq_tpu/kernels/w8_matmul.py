"""W8A8 dense-int8 matmul — the SmoothQuant-baseline GEMM path.

The reference benchmarks FlexQ against SmoothQuant W8A8 (cublasINT8MMWrapper,
int8_mode=2; e2e headline 1.25-1.33x over it, README.md:157-162,193). This
kernel provides the equivalent TPU baseline: int8 weights stored dense
[K, N] with per-group(128) scales, int8 per-token-group activations, native
int8 MXU dots with the same exact per-group f32 dequant accumulation as
w6_matmul — just without the 6-bit unpack. Weight traffic is 8 bits/value
vs w6's 6, so FlexQ's e2e advantage on TPU is measurable apples-to-apples.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import GROUP_SIZE, largest_divisor_tile, round_up, use_interpret


def _w8_kernel(
    x_ref,  # int8 [bm, bk]
    xs_ref,  # f32 [bk/G, bm, 1]
    w_ref,  # int8 [bk, bn]
    ws_ref,  # f32 [bk/G, 1, bn]
    o_ref,  # [bm, bn]
    acc_ref,  # f32 [bm, bn]
    *,
    bk: int,
    out_dtype,
):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    for g in range(bk // GROUP_SIZE):
        xg = x_ref[:, g * GROUP_SIZE : (g + 1) * GROUP_SIZE]
        wg = w_ref[g * GROUP_SIZE : (g + 1) * GROUP_SIZE, :]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = acc + part.astype(jnp.float32) * (xs_ref[g] * ws_ref[g])
    acc_ref[:] = acc

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret")
)
def w8_matmul(
    x_q: jax.Array,  # int8 [M, K]
    x_scale: jax.Array,  # f32 [M, K/128]
    w_q: jax.Array,  # int8 [K, N]
    w_scale: jax.Array,  # f32 [K/128, N]
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    m, k = x_q.shape
    n = w_q.shape[1]
    assert k % GROUP_SIZE == 0
    if interpret is None:
        interpret = use_interpret()
    bk = block_k or largest_divisor_tile(k, cap=256)
    if m <= 32:
        bm = block_m or round_up(m, 8)
        bn = block_n or largest_divisor_tile(n, cap=8192)
    else:
        bm = block_m or min(512, round_up(m, 256))
        bn = block_n or largest_divisor_tile(n, cap=2048)
    mp = round_up(m, bm)
    if mp != m:
        x_q = jnp.pad(x_q, ((0, mp - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, mp - m), (0, 0)))
    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    xs_t = x_scale.astype(jnp.float32).T.reshape(ng, mp, 1)
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)
    out = pl.pallas_call(
        functools.partial(_w8_kernel, bk=bk, out_dtype=out_dtype),
        grid=(mp // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngb, bm, 1), lambda i, j, kk: (kk, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, xs_t, w_q, ws_t)
    return out[:m] if mp != m else out


def w8_matmul_ref(x_q, x_scale, w_q, w_scale, out_dtype=jnp.float32):
    m, k = x_q.shape
    n = w_q.shape[1]
    ng = k // GROUP_SIZE
    xg = x_q.astype(jnp.int32).reshape(m, ng, GROUP_SIZE)
    wg = w_q.astype(jnp.int32).reshape(ng, GROUP_SIZE, n)
    parts = jnp.einsum("mgk,gkn->mgn", xg, wg).astype(jnp.float32)
    out = jnp.einsum(
        "mgn,mg,gn->mn", parts, x_scale.astype(jnp.float32),
        w_scale.astype(jnp.float32),
    )
    return out.astype(out_dtype)
