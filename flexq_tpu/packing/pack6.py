"""Sub-byte bit packing for 6-bit weights (TPU-native layout).

The reference packs int6 matrices into 1-bit planes shaped for binary tensor
cores (engine/src/pack/bit_packing.cu:41-99, layout [K/128, M/chunk, BITS,
chunk, 4]) because NVIDIA GPUs have no native INT6 MMA and FlexQ emulates the
GEMM with b1.and.popc MMAs. TPUs have native int8 MXU matmul, so bit-serial
planes would be the wrong representation: the speed-of-light path is to store
6 bits/value in a form that unpacks to int8 tiles with a few vector ops.

Layout ("nibble + crumb planes"): a signed 6-bit value w in [-32, 31] is split
    w = (hi << 2) | lo,   hi = w >> 2 (arithmetic, 4-bit signed, [-8, 7])
                          lo = w & 3  (2-bit unsigned)
and packed along the contraction (K) axis in K-tiles of ``kt`` rows:

    hi plane: int8 [K/2, N] — byte b of K-tile t holds hi of rows (t*kt + r)
              in its low nibble and (t*kt + r + kt/2) in its high nibble.
    lo plane: int8 [K/4, N] — byte holds lo of rows r, r+kt/4, r+kt/2,
              r+3*kt/4 of its K-tile in bit pairs 0-1, 2-3, 4-5, 6-7.

Total 6 bits/value exactly. The half/quarter-tile interleaving (instead of
adjacent rows) means a kernel unpacking one K-tile reconstructs the int8 tile
with pure shift/mask ops followed by *sublane concatenation* — no per-row
shuffles, which the TPU VPU has no cheap primitive for.

Group scales (group_size 128 along K) stay aligned because kt divides 128.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# K-tile for packing. Must divide the quant group size (128) and the kernel's
# K block. 128 matches both the MXU contraction tile and the group size.
PACK_KT = 128


def _check_shape(k: int, kt: int) -> None:
    if k % kt != 0:
        raise ValueError(f"K={k} must be a multiple of the pack K-tile {kt}")
    if kt % 4 != 0:
        raise ValueError(f"pack K-tile must be a multiple of 4, got {kt}")


def pack6(w_int: jax.Array, kt: int = PACK_KT) -> Tuple[jax.Array, jax.Array]:
    """Pack a signed-int6 matrix [K, N] into (hi [K/2, N], lo [K/4, N]) int8.

    ``w_int`` may be any integer dtype holding values in [-32, 31].
    """
    k, n = w_int.shape
    _check_shape(k, kt)
    w = w_int.astype(jnp.int32)
    hi = w >> 2  # arithmetic shift: signed 4-bit
    lo = w & 3
    # [K/kt, kt, N] tiles
    hi_t = hi.reshape(k // kt, kt, n)
    lo_t = lo.reshape(k // kt, kt, n)
    h = kt // 2
    q = kt // 4
    hi_packed = (hi_t[:, :h] & 0xF) | ((hi_t[:, h:] & 0xF) << 4)
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
    """Inverse of :func:`pack6`: (hi [K/2, N], lo [K/4, N]) -> int8 [K, N].

    Written with the exact op sequence the Pallas kernel uses (shift/mask in
    int32 lanes, concat along sublanes) so it doubles as the golden reference.
    """
    k2, n = hi.shape
    k = k2 * 2
    _check_shape(k, kt)
    h = kt // 2
    q = kt // 4
    hi32 = hi.astype(jnp.int32) & 0xFF
    lo32 = lo.astype(jnp.int32) & 0xFF
    hi_t = hi32.reshape(k // kt, h, n)
    lo_t = lo32.reshape(k // kt, q, n)
    # sign-extend 4-bit: (x << 28) >> 28 on int32 lanes
    lo_nib = ((hi_t & 0xF) << 28) >> 26  # == hi * 4, rows [0, kt/2)
    hi_nib = ((hi_t >> 4) << 28) >> 26  # rows [kt/2, kt)
    hi_full = jnp.concatenate([lo_nib, hi_nib], axis=1)  # [K/kt, kt, N] == hi<<2
    crumbs = jnp.concatenate(
        [lo_t & 3, (lo_t >> 2) & 3, (lo_t >> 4) & 3, (lo_t >> 6) & 3], axis=1
    )
    w = hi_full | crumbs
    return w.reshape(k, n).astype(jnp.int8)


def packed_nbytes(k: int, n: int) -> int:
    """Bytes used by the packed representation (exactly 6 bits/value)."""
    return k * n // 2 + k * n // 4


# NumPy twins for the offline exporter (no device round-trip for 70B ckpts).
def pack6_np(w_int: np.ndarray, kt: int = PACK_KT) -> Tuple[np.ndarray, np.ndarray]:
    k, n = w_int.shape
    _check_shape(k, kt)
    w = w_int.astype(np.int32)
    hi_t = (w >> 2).reshape(k // kt, kt, n)
    lo_t = (w & 3).reshape(k // kt, kt, n)
    h, q = kt // 2, kt // 4
    hi_packed = (hi_t[:, :h] & 0xF) | ((hi_t[:, h:] & 0xF) << 4)
    lo_packed = (
        lo_t[:, :q]
        | (lo_t[:, q : 2 * q] << 2)
        | (lo_t[:, 2 * q : 3 * q] << 4)
        | (lo_t[:, 3 * q :] << 6)
    )
    return (
        hi_packed.reshape(k // 2, n).astype(np.int8),
        lo_packed.reshape(k // 4, n).astype(np.int8),
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
    lo_nib = ((hi_t & 0xF) << 28) >> 26
    hi_nib = ((hi_t >> 4) << 28) >> 26
    hi_full = np.concatenate([lo_nib, hi_nib], axis=1)
    crumbs = np.concatenate(
        [lo_t & 3, (lo_t >> 2) & 3, (lo_t >> 4) & 3, (lo_t >> 6) & 3], axis=1
    )
    return (hi_full | crumbs).reshape(k, n).astype(np.int8)
