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
