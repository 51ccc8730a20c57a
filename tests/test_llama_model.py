"""LLaMA model parity vs HuggingFace transformers (torch CPU golden).

The reference validates its quantized model against the HF fp16 model it
wraps (LMClass); here the whole functional reimplementation is pinned to HF
logits on tiny random models — MHA and GQA variants.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.llama import forward, fake_quant_weights


def tiny_hf_llama(num_kv_heads=4, seed=0):
    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    return model


@pytest.mark.parametrize("kv_heads", [4, 2])  # MHA and GQA
def test_logits_match_hf(kv_heads):
    model = tiny_hf_llama(num_kv_heads=kv_heads)
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fake_quant_close_to_dense():
    model = tiny_hf_llama()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (1, 8)))

    dense = np.asarray(forward(params, cfg, ids))
    policy = QuantPolicy.llama_flex(wbits=8, abits=8)
    qparams = fake_quant_weights(params, policy)
    quant = np.asarray(forward(qparams, cfg, ids, policy=policy))
    # W8A8 on a tiny model: logits close but not identical
    assert np.abs(quant - dense).max() < 0.5
    assert np.argmax(quant[0, -1]) == np.argmax(dense[0, -1]) or np.allclose(
        np.sort(dense[0, -1])[-1] - np.sort(dense[0, -1])[-2], 0, atol=0.3
    )


def test_fake_quant_weights_leaves_original_untouched():
    model = tiny_hf_llama()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    before = np.asarray(params["layers"][0]["q_proj"]["w"]).copy()
    policy = QuantPolicy.llama_flex()
    qp = fake_quant_weights(params, policy)
    np.testing.assert_array_equal(np.asarray(params["layers"][0]["q_proj"]["w"]), before)
    assert not np.array_equal(np.asarray(qp["layers"][0]["q_proj"]["w"]), before)


def test_w6_policy_applies_only_to_linears():
    model = tiny_hf_llama()
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    qp = fake_quant_weights(params, policy)
    # norms and embeddings untouched
    np.testing.assert_array_equal(
        np.asarray(qp["layers"][0]["input_norm"]),
        np.asarray(params["layers"][0]["input_norm"]),
    )
    np.testing.assert_array_equal(np.asarray(qp["embed"]), np.asarray(params["embed"]))


def test_blockwise_attention_matches_full():
    import flexq_tpu.models.llama as L

    rng = np.random.default_rng(7)
    b, lq, h, d = 2, 16, 4, 32
    lk = 2048  # > ATTN_CHUNK triggers the blockwise path
    q = jnp.asarray(rng.standard_normal((b, lq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, h, d)), jnp.float32)
    mask = L.causal_mask(lq, lk)

    got = np.asarray(L._attention_blockwise(q, k, v, mask, L.ATTN_CHUNK))
    # full-softmax reference
    scores = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(d)
    scores = scores + np.asarray(mask)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", probs, np.asarray(v)).reshape(b, lq, h * d)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_attention_core_dispatches_blockwise():
    import flexq_tpu.models.llama as L

    rng = np.random.default_rng(8)
    b, l, h, d = 1, 2048, 2, 32
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    mask = L.causal_mask(l, l)
    out = np.asarray(L.attention_core(q, k, v, mask, 1))
    # spot check a few rows vs direct computation
    qs, ks, vs = map(np.asarray, (q, k, v))
    for t in (0, 1000, 2047):
        s = np.einsum("hd,khd->hk", qs[0, t], ks[0, : t + 1]) / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
        w = np.einsum("hk,khd->hd", p, vs[0, : t + 1]).reshape(-1)
        np.testing.assert_allclose(out[0, t], w, rtol=3e-5, atol=3e-5)
