"""Sensitivity-analysis tool test: it must find an injected sensitive layer."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.llama import forward
from flexq_tpu.quant.sensitivity import analyze_act_sensitivity


def test_detects_sensitive_linear():
    torch.manual_seed(0)
    m = LlamaForCausalLM(LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        tie_word_embeddings=False)).eval()
    cfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    # inject outliers into down_proj inputs by scaling up_proj weights:
    # large-magnitude activations make down_proj act-quant lossy -> sensitive
    for lp in params["layers"]:
        lp["up_proj"]["w"] = lp["up_proj"]["w"] * jnp.where(
            jnp.arange(128)[None, :] == 0, 40.0, 1.0
        )
    calib = np.random.default_rng(0).integers(0, 128, (2, 16)).astype(np.int32)
    report = analyze_act_sensitivity(forward, params, cfg, calib, keep_fraction=0.15)
    # down_proj must rank most sensitive and be kept at 8-bit
    top = max(report.per_linear_kl, key=report.per_linear_kl.get)
    assert top == "down_proj", report.per_linear_kl
    assert report.policy.act_bits["down_proj"] == 8
    assert report.policy.act_bits["q_proj"] == 6
    assert "down_proj" in report.summary()


def test_weight_sensitivity_mixed_w4_w6_policy():
    """The weight-bit analyzer must find an injected weight-sensitive linear
    and derive a serve-ready mixed W4/W6 policy."""
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from flexq_tpu.quant.sensitivity import analyze_weight_sensitivity

    torch.manual_seed(1)
    m = LlamaForCausalLM(LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        tie_word_embeddings=False)).eval()
    cfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    # per-group outliers make o_proj WEIGHTS lossy at 4-bit: one huge value
    # per 128-group stretches the group scale so the rest quantize to ~0
    for lp in params["layers"]:
        w = lp["o_proj"]["w"]
        mask = (jnp.arange(w.shape[0])[:, None] % 128 == 0).astype(w.dtype)
        lp["o_proj"]["w"] = w * (1.0 + 59.0 * mask)
    calib = np.random.default_rng(1).integers(0, 128, (2, 16)).astype(np.int32)
    report = analyze_weight_sensitivity(
        forward, params, cfg, calib, keep_fraction=0.15
    )
    top = max(report.per_linear_kl, key=report.per_linear_kl.get)
    assert top == "o_proj", report.per_linear_kl
    assert report.policy.weight_bits["o_proj"] == 6
    assert report.policy.weight_bits["q_proj"] == 4

    # the derived MIXED policy must run through the quantized serve path
    qp = quantize_params(params, cfg, report.policy, dtype=jnp.float32)
    assert "hi" in qp["layers"][0]["o_proj"]   # 6-bit planes
    assert "q4" in qp["layers"][0]["q_proj"]   # 4-bit plane
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (1, 8)))
    logits, _ = forward_serve(qp, cfg, report.policy, ids)
    assert bool(jnp.all(jnp.isfinite(logits)))

    # kl_budget mode: a budget above every solo-drop KL keeps nothing at 6b
    r2 = analyze_weight_sensitivity(
        forward, params, cfg, calib,
        kl_budget=max(report.per_linear_kl.values()) * 10,
    )
    assert all(b == 4 for b in r2.policy.weight_bits.values())
