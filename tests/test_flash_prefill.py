"""flash_prefill kernel vs jnp golden model (causal attention over cache)."""

import numpy as np
import pytest
import jax.numpy as jnp

from flexq_tpu.kernels.flash_prefill import flash_prefill, flash_prefill_ref


def make_case(rng, b, lq, h, kvh, s, d, start):
    q = jnp.asarray(rng.standard_normal((b, lq, h, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kvh, s, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kvh, s, d)) * 0.3, jnp.float32)
    lengths = jnp.full((b,), start + lq, jnp.int32)
    return q, k, v, lengths


@pytest.mark.parametrize(
    "b,lq,h,kvh,s,start",
    [
        (1, 128, 4, 4, 256, 0),     # plain prefill from position 0
        (2, 128, 4, 2, 256, 0),     # GQA
        (1, 128, 4, 4, 512, 128),   # chunked prefill: window at offset
        (1, 64, 2, 2, 256, 100),    # ragged Lq (pads to 128) + odd offset
        (1, 256, 2, 1, 256, 0),     # multiple q blocks at block_q=128
    ],
)
def test_matches_golden(b, lq, h, kvh, s, start):
    rng = np.random.default_rng(b * 100 + lq + s + start)
    q, k, v, lengths = make_case(rng, b, lq, h, kvh, s, 64, start)
    got = np.asarray(
        flash_prefill(q, k, v, lengths, out_dtype=jnp.float32, block_q=128,
                      block_s=128)
    )
    want = np.asarray(flash_prefill_ref(q, k, v, lengths))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_five_dim_cache_layer_select():
    rng = np.random.default_rng(9)
    b, lq, h, kvh, s, d = 1, 128, 2, 2, 256, 64
    q, k1, v1, lengths = make_case(rng, b, lq, h, kvh, s, d, 0)
    k = jnp.stack([jnp.zeros_like(k1), k1])  # layer 1 holds the real cache
    v = jnp.stack([jnp.zeros_like(v1), v1])
    got = np.asarray(
        flash_prefill(q, k, v, lengths, layer_idx=jnp.int32(1),
                      out_dtype=jnp.float32, block_q=128, block_s=128)
    )
    want = np.asarray(flash_prefill_ref(q, k1, v1, lengths))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_matches_jnp_attention_core_over_cache():
    """Same numbers as the attention_core('bhkd') path the serve graph used
    before: garbage cache beyond the prompt must not leak in."""
    from flexq_tpu.models.llama import attention_core

    rng = np.random.default_rng(3)
    b, lq, h, kvh, s, d = 2, 128, 4, 2, 256, 64
    q, k, v, lengths = make_case(rng, b, lq, h, kvh, s, d, 0)
    # poison the unwritten cache tail
    k = k.at[:, :, lq:].set(1e4)
    v = v.at[:, :, lq:].set(1e4)
    got = np.asarray(
        flash_prefill(q, k, v, lengths, out_dtype=jnp.float32, block_q=128,
                      block_s=128)
    )
    qi = jnp.arange(lq)[:, None]
    ki = jnp.arange(s)[None, :]
    mask = jnp.where(ki <= qi, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    want = np.asarray(attention_core(q, k, v, mask, h // kvh, kv_layout="bhkd"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("start", [0, 128])
def test_quant_cache_matches_golden(start):
    rng = np.random.default_rng(start + 11)
    b, lq, h, kvh, s, d = 2, 128, 4, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, lq, h, d)) * 0.3, jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (b, kvh, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (b, kvh, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (b, kvh, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (b, kvh, s)), jnp.float32)
    lengths = jnp.full((b,), start + lq, jnp.int32)
    got = np.asarray(
        flash_prefill(q, k8, v8, lengths, ks, vs, out_dtype=jnp.float32,
                      block_q=128, block_s=128)
    )
    want = np.asarray(flash_prefill_ref(q, k8, v8, lengths, ks, vs))
    # bf16 dots over the int8 cache
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_quant_matches_attention_core_quant():
    from flexq_tpu.models.llama import attention_core_quant

    rng = np.random.default_rng(12)
    b, lq, h, kvh, s, d = 1, 128, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, lq, h, d)) * 0.3, jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (b, kvh, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (b, kvh, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (b, kvh, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (b, kvh, s)), jnp.float32)
    lengths = jnp.full((b,), lq, jnp.int32)
    got = np.asarray(
        flash_prefill(q, k8, v8, lengths, ks, vs, out_dtype=jnp.float32,
                      block_q=128, block_s=128)
    )
    qi = jnp.arange(lq)[:, None]
    ki = jnp.arange(s)[None, :]
    mask = jnp.where(ki <= qi, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    want = np.asarray(attention_core_quant(q, k8, ks, v8, vs, mask, h // kvh))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_sub128_head_dim_routes_to_jnp_fallback(monkeypatch):
    """head_dim % 128 != 0 must NOT reach the flash kernels on the serve
    path: Mosaic memref_slice rejects minor-dim extents that aren't 128-tile
    multiples on real TPU (found serving a head_dim=64 model; CPU interpret
    mode never checks it)."""
    import jax
    import flexq_tpu.kernels.flash_prefill as fp
    import flexq_tpu.kernels.flash_decode as fd
    from flexq_tpu.models import quantized as qz

    import flexq_tpu.kernels.common as kc

    calls = []
    monkeypatch.setattr(fp, "flash_prefill", lambda *a, **k: calls.append("p"))
    monkeypatch.setattr(fd, "flash_decode", lambda *a, **k: calls.append("d"))
    # interpret mode legitimately keeps the kernel path (no Mosaic); the
    # gate under test is the real-TPU lowering one
    monkeypatch.setattr(kc, "use_interpret", lambda: False)

    b, l, h, kvh, d, s = 1, 4, 4, 2, 64, 128
    q = jnp.zeros((b, l, h, d), jnp.float32)
    ck = jnp.zeros((2, b, kvh, s, d), jnp.float32)
    cv = jnp.zeros_like(ck)
    lengths = jnp.full((b,), l, jnp.int32)
    out = qz._attend(q, ("cache", ck, cv, 0), None, h // kvh, lengths)
    assert out.shape == (b, l, h * d)
    q1 = jnp.zeros((b, 1, h, d), jnp.float32)
    out1 = qz._attend(q1, ("cache", ck, cv, 0), None, h // kvh, lengths)
    assert out1.shape == (b, 1, h * d)
    assert calls == []  # both prefill and decode took the jnp path


def test_paged_flash_asserts_on_sub128_head_dim():
    from flexq_tpu.kernels.flash_decode import flash_decode_paged

    b, h, kvh, d, ps = 1, 4, 2, 64, 128
    q = jnp.zeros((b, h, d), jnp.float32)
    pool = jnp.zeros((1, 4, kvh, ps, d), jnp.bfloat16)
    table = jnp.zeros((b, 2), jnp.int32)
    lengths = jnp.ones((b,), jnp.int32)
    with pytest.raises(AssertionError, match="head_dim"):
        flash_decode_paged(q, pool, pool, table, lengths, layer_idx=0,
                           interpret=False)
