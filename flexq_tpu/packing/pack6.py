"""Sub-byte bit packing for 6-bit weights (TPU-native layout, biased SWAR v2).

The reference packs int6 matrices into 1-bit planes shaped for binary tensor
cores (engine/src/pack/bit_packing.cu:41-99, layout [K/128, M/chunk, BITS,
chunk, 4]) because NVIDIA GPUs have no native INT6 MMA and FlexQ emulates the
GEMM with b1.and.popc MMAs. TPUs have native int8 MXU matmul, so bit-serial
planes would be the wrong representation: the speed-of-light design stores
6 bits/value in a form the kernel can unpack with a handful of *word-wide*
(SWAR) vector ops.

Format ("biased nibble + crumb planes"): a signed 6-bit value w in [-32, 31]
is stored biased-unsigned, u = w + 32 in [0, 63], split as
    u = (hi << 2) | lo,   hi = u >> 2 (4-bit, [0, 15]),  lo = u & 3
and packed along the contraction (K) axis in K-tiles of ``PACK_KT`` rows:

    hi plane: int8 [K/2, N] — byte r of K-tile t holds hi of rows (t*kt + r)
              in its low nibble and (t*kt + r + kt/2) in its high nibble.
    lo plane: int8 [K/4, N] — byte holds lo of rows r, r+kt/4, r+kt/2,
              r+3*kt/4 in bit pairs 0-1, 2-3, 4-5, 6-7.

Exactly 6 bits/value. Why biased: the kernel bitcasts four consecutive K-rows
into one int32 lane word and unpacks with masked shifts; unsigned nibbles
need no per-byte sign extension (which SWAR cannot do without cross-byte
borrows). The GEMM corrects the bias exactly:
    Σ_k x·(u-32) = Σ_k x·u − 32·Σ_k x   (per 128-group, in int32).
The half/quarter-tile row interleaving means unpacking is pure sublane
concatenation — no per-row shuffles.

Group scales (group_size 128 along K) stay aligned because kt == 128.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# K-tile for packing: equals the quant group size and the MXU contraction tile.
PACK_KT = 128
BIAS = 32


def _check_shape(k: int, kt: int) -> None:
    if k % kt != 0:
        raise ValueError(f"K={k} must be a multiple of the pack K-tile {kt}")
    if kt % 4 != 0:
        raise ValueError(f"pack K-tile must be a multiple of 4, got {kt}")


def pack6(w_int: jax.Array, kt: int = PACK_KT) -> Tuple[jax.Array, jax.Array]:
    """Pack a signed-int6 matrix [K, N] into (hi [K/2, N], lo [K/4, N]) int8.

    ``w_int`` may be any integer dtype holding values in [-32, 31]; storage is
    biased-unsigned (see module docstring).
    """
    k, n = w_int.shape
    _check_shape(k, kt)
    u = w_int.astype(jnp.int32) + BIAS  # [0, 63]
    hi_t = (u >> 2).reshape(k // kt, kt, n)
    lo_t = (u & 3).reshape(k // kt, kt, n)
    h, q = kt // 2, kt // 4
    hi_packed = hi_t[:, :h] | (hi_t[:, h:] << 4)
    lo_packed = (
        lo_t[:, :q]
        | (lo_t[:, q : 2 * q] << 2)
        | (lo_t[:, 2 * q : 3 * q] << 4)
        | (lo_t[:, 3 * q :] << 6)
    )
    return (
        hi_packed.reshape(k // 2, n).astype(jnp.int8),
        lo_packed.reshape(k // 4, n).astype(jnp.int8),
    )


def unpack6(hi: jax.Array, lo: jax.Array, kt: int = PACK_KT) -> jax.Array:
    """Inverse of :func:`pack6`: returns SIGNED int8 [K, N] in [-32, 31]."""
    k2, n = hi.shape
    k = k2 * 2
    _check_shape(k, kt)
    h, q = kt // 2, kt // 4
    hi32 = hi.astype(jnp.int32) & 0xFF
    lo32 = lo.astype(jnp.int32) & 0xFF
    hi_t = hi32.reshape(k // kt, h, n)
    lo_t = lo32.reshape(k // kt, q, n)
    lo_nib = (hi_t & 0xF) << 2
    hi_nib = (hi_t >> 2) & 0x3C
    u_hi = jnp.concatenate([lo_nib, hi_nib], axis=1)  # biased hi*4
    crumbs = jnp.concatenate(
        [lo_t & 3, (lo_t >> 2) & 3, (lo_t >> 4) & 3, (lo_t >> 6) & 3], axis=1
    )
    w = (u_hi | crumbs) - BIAS
    return w.reshape(k, n).astype(jnp.int8)


def packed_nbytes(k: int, n: int) -> int:
    """Bytes used by the packed representation (exactly 6 bits/value)."""
    return k * n // 2 + k * n // 4


# NumPy twins for the offline exporter (no device round-trip for 70B ckpts).
# Outputs forced C-contiguous: ufuncs propagate a transposed input's F-order
# (order='K') and safetensors save_file writes raw buffers ignoring strides.
def pack6_np(w_int: np.ndarray, kt: int = PACK_KT) -> Tuple[np.ndarray, np.ndarray]:
    k, n = w_int.shape
    _check_shape(k, kt)
    u = w_int.astype(np.int32) + BIAS
    hi_t = (u >> 2).reshape(k // kt, kt, n)
    lo_t = (u & 3).reshape(k // kt, kt, n)
    h, q = kt // 2, kt // 4
    hi_packed = hi_t[:, :h] | (hi_t[:, h:] << 4)
    lo_packed = (
        lo_t[:, :q]
        | (lo_t[:, q : 2 * q] << 2)
        | (lo_t[:, 2 * q : 3 * q] << 4)
        | (lo_t[:, 3 * q :] << 6)
    )
    return (
        np.ascontiguousarray(hi_packed.reshape(k // 2, n).astype(np.int8)),
        np.ascontiguousarray(lo_packed.reshape(k // 4, n).astype(np.int8)),
    )


def unpack6_np(hi: np.ndarray, lo: np.ndarray, kt: int = PACK_KT) -> np.ndarray:
    k = hi.shape[0] * 2
    n = hi.shape[1]
    _check_shape(k, kt)
    h, q = kt // 2, kt // 4
    hi32 = hi.astype(np.int32) & 0xFF
    lo32 = lo.astype(np.int32) & 0xFF
    hi_t = hi32.reshape(k // kt, h, n)
    lo_t = lo32.reshape(k // kt, q, n)
    lo_nib = (hi_t & 0xF) << 2
    hi_nib = (hi_t >> 2) & 0x3C
    u_hi = np.concatenate([lo_nib, hi_nib], axis=1)
    crumbs = np.concatenate(
        [lo_t & 3, (lo_t >> 2) & 3, (lo_t >> 4) & 3, (lo_t >> 6) & 3], axis=1
    )
    return ((u_hi | crumbs) - BIAS).reshape(k, n).astype(np.int8)
