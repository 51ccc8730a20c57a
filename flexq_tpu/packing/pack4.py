"""Sub-byte packing for 4-bit weights (biased nibble plane).

The reference ships a W4A16 weight-only baseline GEMM (CUTLASS
fpA_intB runners selected by int8_mode=4, e2e FfnLayer.cc:176 /
README.md int8_mode legend) that FlexQ benchmarks against. This module is
the TPU-native 4-bit storage for that path — and for the exceeds-parity
W4A8 kernel (`kernels/w4_matmul.py`).

Format: a signed 4-bit value w in [-8, 7] is stored biased-unsigned,
u = w + 8 in [0, 15], one nibble per value, packed along the contraction
(K) axis in K-tiles of ``PACK_KT`` rows:

    plane: int8 [K/2, N] — byte r of K-tile t holds u of rows (t*kt + r)
           in its low nibble and (t*kt + r + kt/2) in its high nibble.

This is exactly the hi-plane layout of packing/pack6.py with the nibble
carrying the whole value, so the kernel-side SWAR unpack
(pltpu.bitcast → two masked shifts → sublane concat) is a strict subset of
the 6-bit unpack. Bias correction in the GEMM is identical algebra with
BIAS4 = 8:  Σ_k x·(u−8) = Σ_k x·u − 8·Σ_k x  (per 128-group, int32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.packing.pack6 import PACK_KT, _check_shape

BIAS4 = 8


def pack4(w_int: jax.Array, kt: int = PACK_KT) -> jax.Array:
    """Pack a signed-int4 matrix [K, N] into a nibble plane [K/2, N] int8.

    ``w_int`` may be any integer dtype holding values in [-8, 7].
    """
    k, n = w_int.shape
    _check_shape(k, kt)
    u = w_int.astype(jnp.int32) + BIAS4  # [0, 15]
    u_t = u.reshape(k // kt, kt, n)
    h = kt // 2
    packed = u_t[:, :h] | (u_t[:, h:] << 4)
    return packed.reshape(k // 2, n).astype(jnp.int8)


def unpack4(plane: jax.Array, kt: int = PACK_KT) -> jax.Array:
    """Inverse of :func:`pack4`: returns SIGNED int8 [K, N] in [-8, 7]."""
    k2, n = plane.shape
    k = k2 * 2
    _check_shape(k, kt)
    h = kt // 2
    p32 = plane.astype(jnp.int32) & 0xFF
    p_t = p32.reshape(k // kt, h, n)
    lo = p_t & 0xF
    hi = (p_t >> 4) & 0xF
    u = jnp.concatenate([lo, hi], axis=1) - BIAS4
    return u.reshape(k, n).astype(jnp.int8)


def packed4_nbytes(k: int, n: int) -> int:
    """Bytes used by the packed representation (exactly 4 bits/value)."""
    return k * n // 2


# NumPy twins for the offline exporter. Outputs are forced C-contiguous:
# numpy ufuncs propagate the INPUT's memory order (order='K'), so a
# transposed source silently yields F-ordered planes — and
# safetensors.numpy.save_file serializes the raw buffer without honoring
# strides, corrupting the checkpoint.
def pack4_np(w_int: np.ndarray, kt: int = PACK_KT) -> np.ndarray:
    k, n = w_int.shape
    _check_shape(k, kt)
    u = w_int.astype(np.int32) + BIAS4
    u_t = u.reshape(k // kt, kt, n)
    h = kt // 2
    packed = u_t[:, :h] | (u_t[:, h:] << 4)
    return np.ascontiguousarray(packed.reshape(k // 2, n).astype(np.int8))


def unpack4_np(plane: np.ndarray, kt: int = PACK_KT) -> np.ndarray:
    k = plane.shape[0] * 2
    n = plane.shape[1]
    _check_shape(k, kt)
    h = kt // 2
    p32 = plane.astype(np.int32) & 0xFF
    p_t = p32.reshape(k // kt, h, n)
    u = np.concatenate([p_t & 0xF, (p_t >> 4) & 0xF], axis=1) - BIAS4
    return np.ascontiguousarray(u.reshape(k, n).astype(np.int8))
