"""Uniform affine quantization core (pure functions, JAX).

TPU-native re-implementation of the FlexQ PTQ quantizer semantics
(reference: algorithm/flexq_quantize/quantizer.py:29-171). All behaviour that
decides perplexity parity is preserved exactly:

  * symmetric: scale = max(|xmin|, |xmax|) / (2^(b-1) - 1), no zero point
    (reference forces disable_zero_point with --symmetric, main.py:222-223),
    q in [-2^(b-1), 2^(b-1)-1].
  * asymmetric: scale = (xmax - xmin) / (2^b - 1) (for b > 2), zero point
    round(clamp(-xmin/scale, -1e4, 1e4)), q in [0, 2^b - 1].
  * scale clamped to [CLIPMIN, 1e4] (quantizer.py:24,158,166).
  * per-token / per-channel: min/max reduced over the last axis
    (quantizer.py:152-154 — both methods share reduce_shape=[-1]).
  * per-group: reshape(-1, group_size) over the trailing axis, zero padding
    when the axis is not divisible ("deficiency", quantizer.py:94-96,146-151).

Unlike the reference these are stateless pure functions — calibration and
fake-quant compose under jit/vmap/shard_map with no module state.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CLIPMIN = 1e-5
CLIPMAX = 1e4


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of one tensor's quantization.

    Mirrors the reference's per-tensor param dicts (algorithm/main.py:256-320).
    ``bits >= 16`` means "keep full precision" (quantizer.py:129).
    """

    bits: int = 8
    symmetric: bool = False
    group_size: Optional[int] = None  # None => per-token / per-channel (last axis)

    @property
    def enabled(self) -> bool:
        return self.bits < 16

    @property
    def qmin(self) -> int:
        # symmetric implies disable_zero_point (main.py:222-223)
        return -(2 ** (self.bits - 1)) if self.symmetric else 0

    @property
    def qmax(self) -> int:
        return 2 ** (self.bits - 1) - 1 if self.symmetric else 2**self.bits - 1

    def __post_init__(self):
        if self.group_size is not None and self.group_size <= 0:
            raise ValueError(f"group_size must be positive, got {self.group_size}")


def _grouped_view(x: jax.Array, group_size: Optional[int]) -> Tuple[jax.Array, int]:
    """Reshape trailing axis into groups, padding with zeros if needed.

    Returns the [..., n_groups, group_size] view (flattened to 2D rows like the
    reference's reshape(-1, G)) and the pad amount ("deficiency").
    """
    if group_size is None:
        return x.reshape(-1, x.shape[-1]), 0
    d = x.shape[-1]
    deficiency = (-d) % group_size
    if deficiency:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, deficiency)]
        x = jnp.pad(x, pad)
    return x.reshape(-1, group_size), deficiency


def compute_scale_zp(
    x: jax.Array, spec: QuantSpec
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dynamic min/max calibration (quantizer.py:144-171).

    Returns (scale, round_zero_point); zero point is None for symmetric.
    Scale/zp have shape [rows, 1] over the grouped view of x.
    """
    xg, _ = _grouped_view(x, spec.group_size)
    xg = xg.astype(jnp.float32)
    xmin = jnp.min(xg, axis=-1, keepdims=True)
    xmax = jnp.max(xg, axis=-1, keepdims=True)
    if spec.symmetric:
        abs_max = jnp.maximum(jnp.abs(xmax), jnp.abs(xmin))
        scale = abs_max / (2 ** (spec.bits - 1) - 1)
        scale = jnp.clip(scale, CLIPMIN, CLIPMAX)
        return scale, None
    rng = xmax - xmin
    denom = 2**spec.bits if spec.bits <= 2 else 2**spec.bits - 1
    scale = jnp.clip(rng / denom, CLIPMIN, CLIPMAX)
    zp = jnp.round(jnp.clip(-xmin / scale, -CLIPMAX, CLIPMAX))
    return scale, zp


def quantize(
    x: jax.Array, spec: QuantSpec
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Quantize to integers (int8 container) + scales (+ zero points).

    The integer path consumed by the Pallas kernels; exact same rounding and
    clamping as fake_quant (quantizer.py:107-111).
    """
    orig_shape = x.shape
    xg, _ = _grouped_view(x, spec.group_size)
    scale, zp = compute_scale_zp(x, spec)
    q = jnp.round(xg.astype(jnp.float32) / scale)
    if zp is not None:
        q = q + zp
    container = jnp.int8 if spec.qmax <= 127 else jnp.int16
    q = jnp.clip(q, spec.qmin, spec.qmax).astype(container)
    if spec.group_size is None:
        q = q.reshape(orig_shape)
    return q, scale, zp


def dequantize(
    q: jax.Array,
    scale: jax.Array,
    zp: Optional[jax.Array],
    spec: QuantSpec,
    orig_shape: Tuple[int, ...],
    out_dtype=jnp.float32,
) -> jax.Array:
    """Inverse of :func:`quantize` (quantizer.py:112-125)."""
    d = orig_shape[-1]
    deficiency = 0 if spec.group_size is None else (-d) % spec.group_size
    qf = q.astype(jnp.float32)
    if spec.group_size is not None:
        qf = qf.reshape(-1, spec.group_size)
    else:
        qf = qf.reshape(-1, d)
    if zp is not None:
        qf = qf - zp
    dq = qf * scale
    if spec.group_size is not None:
        dq = dq.reshape(orig_shape[:-1] + (d + deficiency,))
        if deficiency:
            dq = dq[..., :d]
    else:
        dq = dq.reshape(orig_shape)
    return dq.astype(out_dtype)


def fake_quant(x: jax.Array, spec: QuantSpec) -> jax.Array:
    """Quantize-dequantize in the input dtype (quantizer.py:93-142).

    The accuracy oracle: the serving kernels must match this bit-for-bit on
    the integer side. Pass-through when bits >= 16.
    """
    if not spec.enabled:
        return x
    q, scale, zp = quantize(x, spec)
    return dequantize(q, scale, zp, spec, x.shape, out_dtype=x.dtype)


def fake_quant_ste(x: jax.Array, spec: QuantSpec) -> jax.Array:
    """fake_quant with a straight-through gradient (quantizer.py:29-33).

    Only needed if QAT-style tuning is layered on top of PTQ.
    """
    if not spec.enabled:
        return x
    zero = x - jax.lax.stop_gradient(x)
    return zero + jax.lax.stop_gradient(fake_quant(x, spec))
