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
