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


def largest_divisor_tile(dim: int, candidates=(1024, 512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} is not a multiple of 128")


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
