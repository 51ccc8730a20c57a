"""OPT model parity vs HuggingFace transformers."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import OPTConfig, OPTForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_opt
from flexq_tpu.models.opt import forward, fake_quant_weights


def tiny_hf_opt(seed=0):
    torch.manual_seed(seed)
    cfg = OPTConfig(
        vocab_size=128,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        do_layer_norm_before=True,
        tie_word_embeddings=True,
    )
    return OPTForCausalLM(cfg).eval()


def test_logits_match_hf():
    model = tiny_hf_opt()
    cfg = config_from_hf(model.config)
    params = from_hf_opt(model, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 128, (2, 9))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_opt_flex_policy():
    model = tiny_hf_opt()
    cfg = config_from_hf(model.config)
    params = from_hf_opt(model, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (1, 8)))
    dense = np.asarray(forward(params, cfg, ids))
    policy = QuantPolicy.opt_flex(wbits=8, abits=8)  # q/k/v acts 8-bit
    qp = fake_quant_weights(params, policy)
    quant = np.asarray(forward(qp, cfg, ids, policy=policy))
    assert np.abs(quant - dense).max() < 1.0


def test_opt_serve_tracks_oracle():
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from flexq_tpu.models import from_hf_opt

    model = tiny_hf_opt()
    # OPT tiny has hidden 64 -> not group-aligned; build a 128-wide one
    cfg_hf = OPTConfig(
        vocab_size=128, hidden_size=128, ffn_dim=256, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=True, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = OPTForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(model.config)
    params = from_hf_opt(model, dtype=jnp.float32)
    policy = QuantPolicy.opt_flex()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 8)))

    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.08
    assert (got.argmax(-1) == oracle.argmax(-1)).mean() >= 0.75


@pytest.mark.parametrize("policy_fn", [
    lambda: QuantPolicy.fp16("opt"),
    lambda: QuantPolicy.weight_only("opt", wbits=4),
])
def test_opt_serve_no_act_quant_policies(policy_fn):
    """fp16 / W4A16 weight-only policies route OPT through the bf16 layer
    path (the quantized path would corrupt 16-bit act values in int8
    containers)."""
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from flexq_tpu.models import from_hf_opt

    cfg_hf = OPTConfig(
        vocab_size=128, hidden_size=128, ffn_dim=256, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=True, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = OPTForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(model.config)
    params = from_hf_opt(model, dtype=jnp.float32)
    policy = policy_fn()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 8)))

    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.08
    assert (got.argmax(-1) == oracle.argmax(-1)).mean() >= 0.75
