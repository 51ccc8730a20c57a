"""W6Ax matmul kernel tests vs golden integer reference.

Pattern mirrors the reference's engine/test_bgemm_kernel.cu: random int
matrices + random group scales → pack → golden reference → kernel → compare.
On CPU the Pallas kernel runs in interpreter mode (auto-detected).
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from flexq_tpu.kernels import w6_matmul, w6_matmul_ref
from flexq_tpu.kernels.common import GROUP_SIZE
from flexq_tpu.packing import pack6


def make_case(rng, m, n, k, x_bits=8):
    xmax = 2 ** (x_bits - 1) - 1
    x_q = rng.integers(-xmax - 1, xmax + 1, (m, k), dtype=np.int64).astype(np.int8)
    w_q = rng.integers(-32, 32, (k, n), dtype=np.int64).astype(np.int8)
    x_s = rng.uniform(0.01, 0.1, (m, k // GROUP_SIZE)).astype(np.float32)
    w_s = rng.uniform(0.01, 0.1, (k // GROUP_SIZE, n)).astype(np.float32)
    hi, lo = pack6(jnp.asarray(w_q))
    return (
        jnp.asarray(x_q),
        jnp.asarray(x_s),
        hi,
        lo,
        jnp.asarray(w_s),
    )


# decode (M small) and prefill-ish shapes; K=256 exercises multi-K-block
SHAPES = [(1, 256, 256), (8, 256, 512), (4, 512, 384), (16, 128, 128), (128, 256, 256)]


@pytest.mark.parametrize("m,n,k", SHAPES)
@pytest.mark.parametrize("x_bits", [6, 8])
def test_matches_golden(m, n, k, x_bits):
    rng = np.random.default_rng(m * 1000 + n + k + x_bits)
    args = make_case(rng, m, n, k, x_bits)
    got = np.asarray(
        w6_matmul(*args, out_dtype=jnp.float32, block_m=8, block_n=128, block_k=128)
    )
    want = np.asarray(w6_matmul_ref(*args))
    assert got.shape == (m, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_multi_kblock_accumulation():
    # K spans 4 K-blocks: checks the acc-scratch revisiting logic
    rng = np.random.default_rng(0)
    args = make_case(rng, 8, 128, 512)
    got = np.asarray(
        w6_matmul(*args, out_dtype=jnp.float32, block_m=8, block_n=128, block_k=128)
    )
    want = np.asarray(w6_matmul_ref(*args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_ragged_m_padding():
    # M=3 not a multiple of the block: wrapper pads and slices back
    rng = np.random.default_rng(1)
    args = make_case(rng, 3, 128, 256)
    got = np.asarray(
        w6_matmul(*args, out_dtype=jnp.float32, block_m=8, block_n=128, block_k=128)
    )
    want = np.asarray(w6_matmul_ref(*args))
    assert got.shape == (3, 128)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_bf16_output():
    rng = np.random.default_rng(2)
    args = make_case(rng, 4, 128, 128)
    got = w6_matmul(*args, block_m=8, block_n=128, block_k=128)
    assert got.dtype == jnp.bfloat16
    want = np.asarray(w6_matmul_ref(*args))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=8e-3, atol=0.5
    )


def test_end_to_end_vs_fake_quant():
    """Serving-path numerics == fake-quant oracle numerics (the parity seam)."""
    from flexq_tpu.quant import QuantSpec, fake_quant, quantize

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05  # [K, N]

    wspec = QuantSpec(bits=6, symmetric=True, group_size=GROUP_SIZE)
    aspec = QuantSpec(bits=8, symmetric=True, group_size=GROUP_SIZE)

    # fake-quant path: fp matmul of fake-quant tensors (quant along K for both)
    w_fq = np.asarray(fake_quant(jnp.asarray(w.T), wspec))  # [N, K] rows=out-ch
    x_fq = np.asarray(fake_quant(jnp.asarray(x), aspec))
    want = x_fq @ w_fq.T

    # serving path: integer kernel
    wq, ws, _ = quantize(jnp.asarray(w.T), wspec)  # [N*K/G rows]
    wq = np.asarray(wq).reshape(128, 256).T  # [K, N] int
    ws = np.asarray(ws).reshape(128, 256 // GROUP_SIZE).T  # [K/G, N]
    xq, xs, _ = quantize(jnp.asarray(x), aspec)
    xq = np.asarray(xq).reshape(4, 256)
    xs = np.asarray(xs).reshape(4, 256 // GROUP_SIZE)
    hi, lo = pack6(jnp.asarray(wq))
    got = np.asarray(
        w6_matmul(
            jnp.asarray(xq),
            jnp.asarray(xs),
            hi,
            lo,
            jnp.asarray(ws),
            out_dtype=jnp.float32,
            block_m=8,
            block_n=128,
            block_k=128,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_autotune_table_roundtrip(tmp_path):
    from flexq_tpu.kernels import autotune

    table = {(8, 4096, 4096): (8, 2048, 256), (32, 4096, 12288): (32, 4096, 128)}
    path = str(tmp_path / "t.json")
    autotune.save_table(path, table)
    n = autotune.load_table(path)
    assert n == 2
    assert autotune.lookup(5, 4096, 4096) == (8, 2048, 256)  # bucket 8
    assert autotune.lookup(20, 4096, 12288) == (32, 4096, 128)
    assert autotune.lookup(8, 999, 999) is None
    autotune._TABLE.clear()


def test_candidate_configs_valid():
    from flexq_tpu.kernels.autotune import candidate_configs

    for bm, bn, bk in candidate_configs(8, 11008, 4096):
        assert 11008 % bk == 0 and 4096 % bn == 0 and bm == 8


def test_stream_kernel_matches_golden():
    """Manual-DMA streaming decode kernel (k-tall dispatch target)."""
    import jax.numpy as jnp2
    from flexq_tpu.kernels.w6_stream import w6_matmul_stream
    from flexq_tpu.kernels.w6_matmul import w6_matmul_ref
    from flexq_tpu.packing import pack6 as _p6

    rng = np.random.default_rng(4)
    for m, k, n in [(1, 768, 256), (8, 512, 128), (13, 1024, 384)]:
        xq = jnp.asarray(rng.integers(-32, 32, (m, k)), jnp.int8)
        xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // 128)), jnp.float32)
        wq = jnp.asarray(rng.integers(-32, 32, (k, n)), jnp.int8)
        ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // 128, n)), jnp.float32)
        hi, lo = _p6(wq)
        got = np.asarray(
            w6_matmul_stream(xq, xs, hi, lo, ws, out_dtype=jnp.float32,
                             block_n=128, block_k=128)
        )
        want = np.asarray(w6_matmul_ref(xq, xs, hi, lo, ws))
        assert np.abs(got - want).max() < 1e-3 * max(1.0, np.abs(want).max()), (m, k, n)


def test_ktall_dispatch_routes_to_stream():
    """w6_matmul with k>n, m<=32 must produce identical results through the
    stream dispatch path (exactness is the contract either way)."""
    rng = np.random.default_rng(5)
    m, k, n = 4, 1024, 256
    xq = jnp.asarray(rng.integers(-32, 32, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // 128)), jnp.float32)
    wq = jnp.asarray(rng.integers(-32, 32, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // 128, n)), jnp.float32)
    hi, lo = pack6(wq)
    got = np.asarray(w6_matmul(xq, xs, hi, lo, ws, out_dtype=jnp.float32))
    want = np.asarray(w6_matmul_ref(xq, xs, hi, lo, ws))
    assert np.abs(got - want).max() < 1e-3 * max(1.0, np.abs(want).max())


def test_glu_bf16_matches_unfused():
    """Fused GLU kernel (silu(x@gate) * (x@up) in one pallas_call) must match
    the unfused pair of w6_matmul_bf16 calls + elementwise epilogue."""
    from flexq_tpu.kernels.w6_matmul import w6_glu_matmul_bf16, w6_matmul_bf16

    rng = np.random.default_rng(3)
    m, k, n = 96, 256, 384
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    gs, us = [], []
    planes = []
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        w_q = r.integers(-32, 32, (k, n), dtype=np.int64).astype(np.int8)
        w_s = r.uniform(0.01, 0.1, (k // GROUP_SIZE, n)).astype(np.float32)
        hi, lo = pack6(jnp.asarray(w_q))
        planes.append((hi, lo, jnp.asarray(w_s)))
    (ghi, glo, gsc), (uhi, ulo, usc) = planes

    gate = w6_matmul_bf16(x, ghi, glo, gsc, out_dtype=jnp.float32)
    up = w6_matmul_bf16(x, uhi, ulo, usc, out_dtype=jnp.float32)
    want = np.asarray(jax.nn.silu(gate) * up)

    got = np.asarray(
        w6_glu_matmul_bf16(x, ghi, glo, gsc, uhi, ulo, usc, out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # multi-K-block path
    got2 = np.asarray(
        w6_glu_matmul_bf16(
            x, ghi, glo, gsc, uhi, ulo, usc, out_dtype=jnp.float32,
            block_m=32, block_n=128, block_k=128,
        )
    )
    np.testing.assert_allclose(got2, want, rtol=2e-2, atol=2e-2)


def test_glu_fused_plane_matches_split():
    """w6_glu_fused_bf16 (single gate|up plane, two index-mapped views) must
    match the split-plane GLU kernel."""
    from flexq_tpu.kernels.w6_matmul import w6_glu_fused_bf16, w6_glu_matmul_bf16

    rng = np.random.default_rng(5)
    m, k, nh = 64, 256, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wq = rng.integers(-32, 32, (k, 2 * nh), dtype=np.int64).astype(np.int8)
    ws = rng.uniform(0.01, 0.1, (k // GROUP_SIZE, 2 * nh)).astype(np.float32)
    hi, lo = pack6(jnp.asarray(wq))
    want = np.asarray(
        w6_glu_matmul_bf16(
            x, hi[:, :nh], lo[:, :nh], jnp.asarray(ws[:, :nh]),
            hi[:, nh:], lo[:, nh:], jnp.asarray(ws[:, nh:]),
            out_dtype=jnp.float32,
        )
    )
    got = np.asarray(
        w6_glu_fused_bf16(
            x, hi, lo, jnp.asarray(ws), out_dtype=jnp.float32,
            block_m=32, block_n=128, block_k=128,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_prefill_fused_params_match_unfused():
    """fuse=True (qkv_proj + gate_up planes) through the W6A16 prefill layer
    path must match fuse=False logits."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.models import config_from_hf, from_hf_llama
    from flexq_tpu.models.quantized import forward_serve, quantize_params

    torch.manual_seed(0)
    lc = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    mm = LlamaForCausalLM(lc).eval()
    mcfg = config_from_hf(mm.config)
    params = from_hf_llama(mm, dtype=jnp.float32)
    pol = QuantPolicy.llama_flex()
    q0 = quantize_params(params, mcfg, pol, dtype=jnp.float32, fuse=False)
    q1 = quantize_params(params, mcfg, pol, dtype=jnp.float32, fuse=True)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)), jnp.int32)
    l0, _ = forward_serve(q0, mcfg, pol, ids, prefill_bf16=True)
    l1, _ = forward_serve(q1, mcfg, pol, ids, prefill_bf16=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=2e-3, atol=2e-2)
