"""W4 matmul kernel + pack4 tests vs golden integer reference.

Covers the TPU equivalent of the reference's W4A16 weight-only baseline
(int8_mode=4, CUTLASS fpA_intB) plus the exceeds-parity exact W4A8 path.
Same pattern as test_w6_matmul.py (itself mirroring the reference's
engine/test_bgemm_kernel.cu golden-model check).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from flexq_tpu.kernels import w4_matmul, w4_matmul_bf16, w4_matmul_ref
from flexq_tpu.kernels.common import GROUP_SIZE
from flexq_tpu.kernels.w4_matmul import w4_matmul_bf16_ref
from flexq_tpu.packing import pack4, pack4_np, unpack4, unpack4_np


def test_pack4_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.integers(-8, 8, (512, 256), dtype=np.int64).astype(np.int8)
    plane = pack4(jnp.asarray(w))
    assert plane.shape == (256, 256) and plane.dtype == jnp.int8
    back = np.asarray(unpack4(plane))
    np.testing.assert_array_equal(back, w)
    # NumPy twins agree with the jnp implementation
    plane_np = pack4_np(w)
    np.testing.assert_array_equal(np.asarray(plane), plane_np)
    np.testing.assert_array_equal(unpack4_np(plane_np), w)


def make_case(rng, m, n, k):
    x_q = rng.integers(-128, 128, (m, k), dtype=np.int64).astype(np.int8)
    w_q = rng.integers(-8, 8, (k, n), dtype=np.int64).astype(np.int8)
    x_s = rng.uniform(0.01, 0.1, (m, k // GROUP_SIZE)).astype(np.float32)
    w_s = rng.uniform(0.01, 0.1, (k // GROUP_SIZE, n)).astype(np.float32)
    plane = pack4(jnp.asarray(w_q))
    return jnp.asarray(x_q), jnp.asarray(x_s), plane, jnp.asarray(w_s)


SHAPES = [(1, 256, 256), (8, 256, 512), (4, 512, 384), (128, 256, 256)]


@pytest.mark.parametrize("m,n,k", SHAPES)
def test_w4a8_matches_golden(m, n, k):
    rng = np.random.default_rng(m * 1000 + n + k)
    args = make_case(rng, m, n, k)
    got = np.asarray(
        w4_matmul(*args, out_dtype=jnp.float32, block_m=8, block_n=128, block_k=128)
    )
    want = np.asarray(w4_matmul_ref(*args))
    assert got.shape == (m, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_w4a8_ragged_m():
    rng = np.random.default_rng(1)
    args = make_case(rng, 3, 128, 256)
    got = np.asarray(
        w4_matmul(*args, out_dtype=jnp.float32, block_m=8, block_n=128, block_k=128)
    )
    want = np.asarray(w4_matmul_ref(*args))
    assert got.shape == (3, 128)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("m,n,k", [(4, 256, 256), (64, 128, 512)])
def test_w4a16_matches_golden(m, n, k):
    rng = np.random.default_rng(m + n + k)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w_q = rng.integers(-8, 8, (k, n), dtype=np.int64).astype(np.int8)
    w_s = jnp.asarray(
        rng.uniform(0.01, 0.1, (k // GROUP_SIZE, n)).astype(np.float32)
    )
    plane = pack4(jnp.asarray(w_q))
    got = np.asarray(
        w4_matmul_bf16(
            x, plane, w_s, out_dtype=jnp.float32,
            block_m=8 if m <= 8 else 64, block_n=128, block_k=128,
        )
    )
    want = np.asarray(w4_matmul_bf16_ref(x, plane, w_s))
    # bf16 MXU math: compare loosely
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_w4_end_to_end_vs_fake_quant():
    """W4A8 serving path == 4-bit fake-quant oracle (the parity seam)."""
    from flexq_tpu.quant import QuantSpec, fake_quant, quantize

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05  # [K, N]

    wspec = QuantSpec(bits=4, symmetric=True, group_size=GROUP_SIZE)
    aspec = QuantSpec(bits=8, symmetric=True, group_size=GROUP_SIZE)

    w_fq = np.asarray(fake_quant(jnp.asarray(w.T), wspec))
    x_fq = np.asarray(fake_quant(jnp.asarray(x), aspec))
    want = x_fq @ w_fq.T

    wq, ws, _ = quantize(jnp.asarray(w.T), wspec)
    wq = np.asarray(wq).reshape(128, 256).T
    ws = np.asarray(ws).reshape(128, 256 // GROUP_SIZE).T
    xq, xs, _ = quantize(jnp.asarray(x), aspec)
    xq = np.asarray(xq).reshape(4, 256)
    xs = np.asarray(xs).reshape(4, 256 // GROUP_SIZE)
    plane = pack4(jnp.asarray(wq))
    got = np.asarray(
        w4_matmul(
            jnp.asarray(xq), jnp.asarray(xs), plane, jnp.asarray(ws),
            out_dtype=jnp.float32, block_m=8, block_n=128, block_k=128,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_weight_only_policy_forward():
    """A tiny llama under QuantPolicy.weight_only(wbits=4) runs the bf16
    (activation-unquantized) layer path end-to-end and tracks the 4-bit
    fake-quant oracle — the int8_mode=4 parity seam."""
    pytest.importorskip("torch")
    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.models.llama import fake_quant_weights, forward
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from test_serve import tiny_model

    cfg, params = tiny_model()
    policy = QuantPolicy.weight_only("llama", wbits=4)
    assert policy.is_weight_only
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    assert "q4" in qparams["layers"][0]["q_proj"]

    ids = jnp.asarray(np.random.default_rng(7).integers(0, 256, (1, 8)))
    # oracle: fake-quant weights, full-precision activations
    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.06
    agree = (got.argmax(-1) == oracle.argmax(-1)).mean()
    assert agree >= 0.75
