"""Fused producer-epilogue kernels vs composition of plain ops + quantizer."""

import numpy as np
import pytest
import jax.numpy as jnp

from flexq_tpu.kernels import (
    glu_quant,
    layernorm_quant,
    quant_act,
    relu_quant,
    rmsnorm_quant,
)
from flexq_tpu.kernels.common import GROUP_SIZE
from flexq_tpu.quant import QuantSpec, quantize


def golden_group_quant(y, bits):
    spec = QuantSpec(bits=bits, symmetric=True, group_size=GROUP_SIZE)
    q, s, _ = quantize(jnp.asarray(y), spec)
    m = y.shape[0]
    return (
        np.asarray(q).reshape(m, -1),
        np.asarray(s).reshape(m, -1),
    )


def test_quant_act_matches_quantizer():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 384)).astype(np.float32)
    q, s = quant_act(jnp.asarray(x), bits=8)
    qg, sg = golden_group_quant(x, 8)
    np.testing.assert_array_equal(np.asarray(q), qg)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-6)


@pytest.mark.parametrize("bits", [6, 8])
def test_rmsnorm_quant(bits):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 256)).astype(np.float32)
    g = rng.standard_normal((256,)).astype(np.float32)
    eps = 1e-5
    q, s = rmsnorm_quant(jnp.asarray(x), jnp.asarray(g), bits=bits, eps=eps)
    # golden: HF Llama RMSNorm then group quant
    var = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    y = (x / np.sqrt(var + eps)).astype(np.float32) * g
    qg, sg = golden_group_quant(y, bits)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-4)
    # rounding boundary cases may differ by 1 ulp of scale; allow tiny mismatch
    diff = np.abs(np.asarray(q).astype(int) - qg.astype(int))
    assert (diff > 1).sum() == 0 and (diff == 1).mean() < 0.01


def test_rmsnorm_quant_residual():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    r = rng.standard_normal((4, 256)).astype(np.float32)
    g = np.ones(256, np.float32)
    q, s, ro = rmsnorm_quant(
        jnp.asarray(x), jnp.asarray(g), bits=6, residual=jnp.asarray(r)
    )
    np.testing.assert_allclose(np.asarray(ro), x + r, rtol=1e-5)
    h = x + r
    var = (h**2).mean(-1, keepdims=True)
    y = h / np.sqrt(var + 1e-5) * g
    _, sg = golden_group_quant(y, 6)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-4)


def test_layernorm_quant():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 256)).astype(np.float32) * 2 + 0.5
    g = rng.standard_normal((256,)).astype(np.float32)
    b = rng.standard_normal((256,)).astype(np.float32)
    q, s = layernorm_quant(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), bits=6)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + 1e-5) * g + b
    qg, sg = golden_group_quant(y, 6)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-4)
    diff = np.abs(np.asarray(q).astype(int) - qg.astype(int))
    assert (diff > 1).sum() == 0


def test_glu_quant_silu():
    rng = np.random.default_rng(4)
    gate = rng.standard_normal((3, 256)).astype(np.float32)
    up = rng.standard_normal((3, 256)).astype(np.float32)
    q, s = glu_quant(jnp.asarray(gate), jnp.asarray(up), bits=8, act="silu")
    y = gate / (1 + np.exp(-gate)) * up
    qg, sg = golden_group_quant(y, 8)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-4)
    diff = np.abs(np.asarray(q).astype(int) - qg.astype(int))
    assert (diff > 1).sum() == 0


def test_relu_quant():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 256)).astype(np.float32)
    q, s = relu_quant(jnp.asarray(x), bits=6)
    y = np.maximum(x, 0)
    qg, sg = golden_group_quant(y, 6)
    np.testing.assert_allclose(np.asarray(s), sg, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(q), qg)


def test_bf16_inputs():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    g = jnp.ones((256,), jnp.bfloat16)
    q, s = rmsnorm_quant(x, g, bits=6)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    assert np.asarray(q).min() >= -32 and np.asarray(q).max() <= 31
