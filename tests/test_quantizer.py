"""Quantizer parity tests.

Golden model: an independent NumPy implementation of the reference semantics
(algorithm/flexq_quantize/quantizer.py:93-171) written from the spec — the
constants and corner cases here (CLIPMIN, qmin/qmax conventions, group
padding, asym zero-point rounding) are exactly what decides ppl parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flexq_tpu.quant import QuantSpec, fake_quant, quantize, dequantize

CLIPMIN, CLIPMAX = 1e-5, 1e4


def golden_fake_quant(x, bits, symmetric, group_size):
    """NumPy golden: reference quantizer.py fake-quant semantics."""
    if bits >= 16:
        return x
    x = np.asarray(x, np.float32)
    orig = x.shape
    d = x.shape[-1]
    if group_size:
        pad = (-d) % group_size
        if pad:
            x = np.concatenate([x, np.zeros(x.shape[:-1] + (pad,), x.dtype)], -1)
        xg = x.reshape(-1, group_size)
    else:
        pad = 0
        xg = x.reshape(-1, d)
    xmin = xg.min(-1, keepdims=True)
    xmax = xg.max(-1, keepdims=True)
    if symmetric:
        scale = np.maximum(np.abs(xmin), np.abs(xmax)) / (2 ** (bits - 1) - 1)
        scale = np.clip(scale, CLIPMIN, CLIPMAX)
        zp = None
        qmin, qmax = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    else:
        denom = 2**bits if bits <= 2 else 2**bits - 1
        scale = np.clip((xmax - xmin) / denom, CLIPMIN, CLIPMAX)
        zp = np.round(np.clip(-xmin / scale, -CLIPMAX, CLIPMAX))
        qmin, qmax = 0, 2**bits - 1
    q = np.round(xg / scale)
    if zp is not None:
        q = q + zp
    q = np.clip(q, qmin, qmax)
    if zp is not None:
        q = q - zp
    dq = (q * scale).reshape(orig[:-1] + (d + pad,))
    if pad:
        dq = dq[..., :d]
    return dq


CASES = [
    dict(bits=6, symmetric=True, group_size=128),   # canonical FlexQ W6
    dict(bits=8, symmetric=True, group_size=128),   # A8 sensitive layers
    dict(bits=6, symmetric=False, group_size=None),  # asym per-token default
    dict(bits=8, symmetric=False, group_size=None),
    dict(bits=6, symmetric=True, group_size=None),   # per-channel sym
    dict(bits=4, symmetric=False, group_size=64),
    dict(bits=2, symmetric=False, group_size=None),  # 2-bit denom corner
    dict(bits=16, symmetric=True, group_size=128),   # pass-through
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"b{c['bits']}_s{c['symmetric']}_g{c['group_size']}")
def test_fake_quant_matches_golden(case):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 384)).astype(np.float32) * 3.0
    spec = QuantSpec(**case)
    got = np.asarray(fake_quant(jnp.asarray(x), spec))
    want = golden_fake_quant(x, **case)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_group_padding_deficiency():
    # trailing dim 200 with group 128 -> pad 56 zeros, result sliced back
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 200)).astype(np.float32)
    spec = QuantSpec(bits=6, symmetric=True, group_size=128)
    got = np.asarray(fake_quant(jnp.asarray(x), spec))
    want = golden_fake_quant(x, bits=6, symmetric=True, group_size=128)
    assert got.shape == (4, 200)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_quantize_dequantize_roundtrip_equals_fake_quant():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    for spec in [QuantSpec(6, True, 128), QuantSpec(8, False, None)]:
        q, s, zp = quantize(jnp.asarray(x), spec)
        assert q.dtype in (jnp.int8, jnp.int16)
        dq = dequantize(q, s, zp, spec, x.shape)
        fq = fake_quant(jnp.asarray(x), spec)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(fq), rtol=1e-6, atol=1e-6)


def test_int_range():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 128)).astype(np.float32) * 100
    q, _, _ = quantize(jnp.asarray(x), QuantSpec(6, True, 128))
    assert q.min() >= -32 and q.max() <= 31
    q8, _, _ = quantize(jnp.asarray(x), QuantSpec(8, True, 128))
    assert q8.min() >= -128 and q8.max() <= 127


def test_extreme_values_scale_clamp():
    # all-zero input: scale clamps to CLIPMIN, output zero (no NaN/inf)
    x = jnp.zeros((2, 128))
    out = fake_quant(x, QuantSpec(6, True, 128))
    assert np.all(np.isfinite(np.asarray(out))) and np.all(np.asarray(out) == 0)
    # huge input: scale clamps to CLIPMAX
    x = jnp.full((2, 128), 1e9, jnp.float32)
    out = fake_quant(x, QuantSpec(6, True, 128))
    assert np.all(np.isfinite(np.asarray(out)))


def test_3d_input_per_token():
    # activations come in [batch, seq, hidden]
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 256)).astype(np.float32)
    spec = QuantSpec(8, False, None)
    got = np.asarray(fake_quant(jnp.asarray(x), spec))
    want = golden_fake_quant(x, 8, False, None)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
