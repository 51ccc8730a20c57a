"""Fused producer-epilogue quantization kernels (Pallas).

The FlexQ co-design seam (SURVEY.md §3.4): quantization lives in the
*producer's* epilogue so no full-precision activation round-trips HBM between
norm/activation and the quantized GEMM. TPU-native equivalents of:

  * fused residual-add + RMSNorm/LayerNorm + per-group quant
    (reference e2e .../layernorm_kernels.cu:316,1856-2049)
  * fused SiLU/GeLU-gated activation + per-group quant for the down/fc2 input
    (reference e2e .../activation_kernels.cu:246-446)
  * standalone dynamic per-group quant for fp inputs packed on the fly
    (reference e2e .../pack/bit_packing.cu:80-199, half→pack path)

Divergence from the reference, by design: activations are emitted as int8
values (6- or 8-bit range) + f32 group scales, not bit-planes — the MXU
consumes int8 natively and activation bytes are negligible next to weight
bytes, so bit-packing activations would cost VPU work for no bandwidth win.

All kernels use symmetric per-group(128) quantization, matching the serving
engine's only supported mode (scale = absmax / (2^(b-1)-1), clamped to
[CLIPMIN, CLIPMAX] — quant/quantizer.py semantics, so the fake-quant oracle
transfers).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import GROUP_SIZE, round_up, use_interpret
from flexq_tpu.quant.quantizer import CLIPMAX, CLIPMIN


def _group_quant(y: jax.Array, bits: int) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-group(128) quant of f32 [bm, bk] -> (int8, f32 scales)."""
    bm, bk = y.shape
    ng = bk // GROUP_SIZE
    qmax = 2 ** (bits - 1) - 1
    yg = y.reshape(bm, ng, GROUP_SIZE)
    absmax = jnp.max(jnp.abs(yg), axis=-1)  # [bm, ng]
    scale = jnp.clip(absmax / qmax, CLIPMIN, CLIPMAX)
    q = jnp.round(yg / scale[:, :, None])
    q = jnp.clip(q, -(qmax + 1), qmax).astype(jnp.int8)
    return q.reshape(bm, bk), scale


def _quant_act_kernel(x_ref, q_ref, s_ref, *, bits):
    q, s = _group_quant(x_ref[:].astype(jnp.float32), bits)
    q_ref[:] = q
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("bits", "block_m", "interpret"))
def quant_act(
    x: jax.Array,
    bits: int = 8,
    *,
    block_m: int = 256,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-group symmetric quant of activations [M, K]."""
    m, k = x.shape
    assert k % GROUP_SIZE == 0
    if interpret is None:
        interpret = use_interpret()
    bm = min(round_up(m, 8), block_m, _rows_for_vmem(k, nbufs=3))
    mp = round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    ng = k // GROUP_SIZE
    q, s = pl.pallas_call(
        functools.partial(_quant_act_kernel, bits=bits),
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, ng), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, ng), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return (q[:m], s[:m]) if mp != m else (q, s)


def _rmsnorm_quant_kernel(x_ref, g_ref, q_ref, s_ref, *, bits, eps, out_dtype):
    h = x_ref[:].astype(jnp.float32)
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    y = h * jax.lax.rsqrt(var + eps)
    y = y.astype(out_dtype).astype(jnp.float32) * g_ref[0:1, :].astype(jnp.float32)
    q, s = _group_quant(y, bits)
    q_ref[:] = q
    s_ref[:] = s


def _rmsnorm_quant_res_kernel(
    x_ref, res_ref, g_ref, q_ref, s_ref, ro_ref, *, bits, eps, out_dtype
):
    h = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    ro_ref[:] = h.astype(out_dtype)
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    y = h * jax.lax.rsqrt(var + eps)
    y = y.astype(out_dtype).astype(jnp.float32) * g_ref[0:1, :].astype(jnp.float32)
    q, s = _group_quant(y, bits)
    q_ref[:] = q
    s_ref[:] = s


@functools.partial(
    jax.jit, static_argnames=("bits", "eps", "block_m", "interpret")
)
def rmsnorm_quant(
    x: jax.Array,
    gamma: jax.Array,
    bits: int = 6,
    *,
    residual: Optional[jax.Array] = None,
    eps: float = 1e-5,
    block_m: int = 64,
    interpret: Optional[bool] = None,
):
    """Fused [residual-add +] RMSNorm + per-group quant.

    Returns (q int8 [M,K], scales f32 [M,K/128][, residual_out]).
    HF-Llama RMSNorm semantics: stats in f32, cast to model dtype *before*
    the gamma multiply (so the fake-quant eval path matches bit-for-bit).
    """
    m, k = x.shape
    assert k % GROUP_SIZE == 0
    if interpret is None:
        interpret = use_interpret()
    out_dtype = x.dtype
    bm = min(round_up(m, 8), block_m, _rows_for_vmem(k, nbufs=4))
    mp = round_up(m, bm)
    pad = mp - m
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad), (0, 0)))
    ng = k // GROUP_SIZE
    gamma2d = gamma.reshape(1, k)

    row_spec = pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((bm, ng), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if residual is None:
        q, s = pl.pallas_call(
            functools.partial(
                _rmsnorm_quant_kernel, bits=bits, eps=eps, out_dtype=out_dtype
            ),
            grid=(mp // bm,),
            in_specs=[row_spec, g_spec],
            out_specs=(q_spec, s_spec),
            out_shape=(
                jax.ShapeDtypeStruct((mp, k), jnp.int8),
                jax.ShapeDtypeStruct((mp, ng), jnp.float32),
            ),
            interpret=interpret,
        )(x, gamma2d)
        return (q[:m], s[:m]) if pad else (q, s)

    q, s, ro = pl.pallas_call(
        functools.partial(
            _rmsnorm_quant_res_kernel, bits=bits, eps=eps, out_dtype=out_dtype
        ),
        grid=(mp // bm,),
        in_specs=[row_spec, row_spec, g_spec],
        out_specs=(q_spec, s_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, ng), jnp.float32),
            jax.ShapeDtypeStruct((mp, k), out_dtype),
        ),
        interpret=interpret,
    )(x, residual, gamma2d)
    return (q[:m], s[:m], ro[:m]) if pad else (q, s, ro)


def _layernorm_quant_res_kernel(
    x_ref, res_ref, g_ref, b_ref, q_ref, s_ref, ro_ref, *, bits, eps, out_dtype, with_residual
):
    h = x_ref[:].astype(jnp.float32)
    if with_residual:
        h = h + res_ref[:].astype(jnp.float32)
        ro_ref[:] = h.astype(out_dtype)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) * (h - mu), axis=-1, keepdims=True)
    y = (h - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0:1, :].astype(jnp.float32) + b_ref[0:1, :].astype(jnp.float32)
    q, s = _group_quant(y, bits)
    q_ref[:] = q
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("bits", "eps", "block_m", "interpret"))
def layernorm_quant(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    bits: int = 6,
    *,
    residual: Optional[jax.Array] = None,
    eps: float = 1e-5,
    block_m: int = 64,
    interpret: Optional[bool] = None,
):
    """Fused [residual-add +] LayerNorm + per-group quant (OPT path)."""
    m, k = x.shape
    assert k % GROUP_SIZE == 0
    if interpret is None:
        interpret = use_interpret()
    out_dtype = x.dtype
    bm = min(round_up(m, 8), block_m, _rows_for_vmem(k, nbufs=5))
    mp = round_up(m, bm)
    pad = mp - m
    with_res = residual is not None
    res = residual if with_res else jnp.zeros_like(x)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        res = jnp.pad(res, ((0, pad), (0, 0)))
    ng = k // GROUP_SIZE

    row_spec = pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q, s, ro = pl.pallas_call(
        functools.partial(
            _layernorm_quant_res_kernel,
            bits=bits,
            eps=eps,
            out_dtype=out_dtype,
            with_residual=with_res,
        ),
        grid=(mp // bm,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, ng), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, ng), jnp.float32),
            jax.ShapeDtypeStruct((mp, k), out_dtype),
        ),
        interpret=interpret,
    )(x, res, gamma.reshape(1, k), beta.reshape(1, k))
    if with_res:
        return (q[:m], s[:m], ro[:m]) if pad else (q, s, ro)
    return (q[:m], s[:m]) if pad else (q, s)


def _glu_quant_kernel(g_ref, u_ref, q_ref, s_ref, *, bits, act):
    g = g_ref[:].astype(jnp.float32)
    u = u_ref[:].astype(jnp.float32)
    if act == "silu":
        y = g * jax.nn.sigmoid(g) * u
    elif act == "gelu":
        # tanh approximation — matches HF gelu_pytorch_tanh (Gemma GeGLU)
        # and the w6 GLU kernels' jax.nn.gelu default
        y = jax.nn.gelu(g) * u
    else:
        raise ValueError(act)
    q, s = _group_quant(y, bits)
    q_ref[:] = q
    s_ref[:] = s


def _rows_for_vmem(k: int, nbufs: int, budget: int = 6 * 2**20) -> int:
    """Rows per block so nbufs f32 row-copies fit the VMEM budget."""
    rows = budget // (k * 4 * nbufs)
    rows = max(8, min(256, (rows // 8) * 8))
    return rows


@functools.partial(
    jax.jit, static_argnames=("bits", "act", "block_m", "block_k", "interpret")
)
def glu_quant(
    gate: jax.Array,
    up: jax.Array,
    bits: int = 8,
    *,
    act: str = "silu",
    block_m: int = 128,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused act(gate)·up + per-group quant — the down_proj input producer.

    (Reference: flexq_generic_activation, activation_kernels.cu:246-446;
    fc2 input always quantized at 8-bit buffer width, FfnLayer.h:83-85.)
    """
    m, k = gate.shape
    assert k % GROUP_SIZE == 0
    if interpret is None:
        interpret = use_interpret()
    # full-K rows per block: the grid runs over M only (Mosaic cannot store
    # scale slices at dynamic lane offsets, so K-tiling the scales is out)
    bm = min(round_up(m, 8), block_m, _rows_for_vmem(k, nbufs=4))
    mp = round_up(m, bm)
    if mp != m:
        gate = jnp.pad(gate, ((0, mp - m), (0, 0)))
        up = jnp.pad(up, ((0, mp - m), (0, 0)))
    tile = pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    q, s = pl.pallas_call(
        functools.partial(_glu_quant_kernel, bits=bits, act=act),
        grid=(mp // bm,),
        in_specs=[tile, tile],
        out_specs=(
            tile,
            pl.BlockSpec(
                (bm, k // GROUP_SIZE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, k // GROUP_SIZE), jnp.float32),
        ),
        interpret=interpret,
    )(gate, up)
    return (q[:m], s[:m]) if mp != m else (q, s)


@functools.partial(jax.jit, static_argnames=("bits", "block_m", "block_k", "interpret"))
def relu_quant(
    x: jax.Array,
    bits: int = 6,
    *,
    block_m: int = 128,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused ReLU + per-group quant (OPT fc1→fc2 producer)."""

    m, k = x.shape
    assert k % GROUP_SIZE == 0
    if interpret is None:
        interpret = use_interpret()
    bm = min(round_up(m, 8), block_m, _rows_for_vmem(k, nbufs=3))
    mp = round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))

    def kernel(x_ref, q_ref, s_ref):
        y = jnp.maximum(x_ref[:].astype(jnp.float32), 0.0)
        q, s = _group_quant(y, bits)
        q_ref[:] = q
        s_ref[:] = s

    tile = pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    q, s = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[tile],
        out_specs=(
            tile,
            pl.BlockSpec(
                (bm, k // GROUP_SIZE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, k // GROUP_SIZE), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return (q[:m], s[:m]) if mp != m else (q, s)
