"""W8A8 baseline GEMM path (reference SmoothQuant int8_mode=2 comparison)."""

import numpy as np
import pytest
import jax.numpy as jnp

from flexq_tpu.kernels.w8_matmul import w8_matmul, w8_matmul_ref


@pytest.mark.parametrize("m,k,n", [(1, 256, 128), (8, 512, 384), (40, 384, 256)])
def test_w8_matmul_matches_golden(m, k, n):
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // 128)), jnp.float32)
    wq = jnp.asarray(rng.integers(-128, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // 128, n)), jnp.float32)
    got = np.asarray(w8_matmul(xq, xs, wq, ws, out_dtype=jnp.float32,
                               block_m=8 if m <= 32 else 256,
                               block_n=128, block_k=128))
    want = np.asarray(w8_matmul_ref(xq, xs, wq, ws))
    assert np.abs(got - want).max() < 1e-3 * max(1.0, np.abs(want).max())


def test_w8a8_serve_path_end_to_end():
    """uniform 8/8 policy routes every linear through the w8 kernel and
    the engine generates deterministically."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.models import config_from_hf, from_hf_llama
    from flexq_tpu.models.llama import forward, fake_quant_weights
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from flexq_tpu.serve import Engine

    torch.manual_seed(0)
    hcfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    mdl = LlamaForCausalLM(hcfg).eval()
    cfg = config_from_hf(mdl.config)
    params = from_hf_llama(mdl, dtype=jnp.float32)
    policy = QuantPolicy.uniform("llama", wbits=8, abits=8)
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    assert "q8" in qparams["layers"][0]["q_proj"]  # w8 storage selected

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 8)))
    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    assert np.abs(got - oracle).max() / np.abs(oracle).max() < 0.05

    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    o1 = eng.generate([[1, 5, 9]], max_new_tokens=5, eos_id=-1)
    o2 = eng.generate([[1, 5, 9]], max_new_tokens=5, eos_id=-1)
    assert o1 == o2


def test_w8a16_weight_only_policy_forward():
    """W8A16 weight-only (the reference's int8_mode=1 cutlass fpA_intB
    baseline, README.md:157-162): quantize_linear emits the dense q8 plane
    and the bf16 layer path dequantizes per group in-graph. Must track the
    8-bit fake-quant oracle tightly."""
    pytest.importorskip("torch")
    import numpy as np
    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.models.llama import fake_quant_weights, forward
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from test_serve import tiny_model

    cfg, params = tiny_model()
    policy = QuantPolicy.weight_only("llama", wbits=8)
    assert policy.is_weight_only and policy.no_act_quant
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    assert "q8" in qparams["layers"][0]["q_proj"]

    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (1, 8)))
    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.02
    agree = (got.argmax(-1) == oracle.argmax(-1)).mean()
    assert agree >= 0.9
