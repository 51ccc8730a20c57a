"""Shared kernel utilities: platform detection, block-size selection.

The TPU analogue of the reference's engine/common/base.h (shape/config
templates) — but config selection is a small heuristic + tuning table
instead of 325 template instantiations, because XLA/Mosaic handles the
software pipelining the CUDA code spells out by hand.
"""

from __future__ import annotations

import functools

import jax

GROUP_SIZE = 128  # quant group along K; fixed, like the reference (MMA_K==128)


@functools.cache
def default_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def use_interpret() -> bool:
    """Pallas interpreter mode on CPU so the same kernels run in tests."""
    return not default_backend_is_tpu()


def largest_divisor_tile(dim: int, cap: int = 4096) -> int:
    """Largest divisor of dim that is a multiple of 128 and <= cap.

    Non-power-of-two tiles (e.g. 2816 = 22·128) are fine for Mosaic and keep
    DMA blocks deep for awkward widths like 11264.
    """
    if dim % 128:
        raise ValueError(f"dim {dim} is not a multiple of 128")
    for t in range(min(cap, dim) // 128, 0, -1):
        if dim % (t * 128) == 0:
            return t * 128
    raise AssertionError


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def rope_epilogue(acc, cos_ref, sin2_ref, bm: int, bn: int, out_dtype):
    """HF half-rotate RoPE on a GEMM accumulator tile (q/k projections).

    Each 128-lane group of the output is one head (caller gates on
    head_dim == 128). rotate_half(t)*sin is rewritten as roll(t, 64)*sin2
    (sin2 = (-sin_half | sin_half), built by models.llama.rope_gemm_operands)
    so the epilogue is one lane-roll + 2 mul + add — no sub-128 lane slicing,
    which Mosaic does not legalize. Shared by the W6/W4 bf16 kernels."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    h = bn // 128
    t = acc.reshape(bm, h, 128)
    rot = pltpu.roll(t, 64, 2)  # partner swap within each head
    c = cos_ref[:].reshape(bm, 1, 128)
    s2 = sin2_ref[:].reshape(bm, 1, 128)
    return (t * c + rot * s2).reshape(bm, bn).astype(out_dtype)
