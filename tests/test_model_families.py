"""Model-family breadth: Qwen2 (biased qkv), Mistral (sliding window),
LLaMA-3.1 (llama3 rope scaling) — parity vs HuggingFace transformers and
through the quantized serve path.

The reference supports LLaMA-1/2/3 and OPT only (algorithm/models/LMClass.py,
e2e llama/opt graphs); these families EXCEED parity: one llama-family graph
covers all three via ModelConfig.qkv_bias / sliding_window / rope_scaling.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import (
    LlamaConfig,
    LlamaForCausalLM,
    MistralConfig,
    MistralForCausalLM,
    Qwen2Config,
    Qwen2ForCausalLM,
)

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.llama import causal_mask, fake_quant_weights, forward
from flexq_tpu.models.quantized import forward_serve, quantize_params


def tiny_qwen2(kv_heads=2, seed=0):
    torch.manual_seed(seed)
    cfg = Qwen2Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    return Qwen2ForCausalLM(cfg).eval()


def tiny_mistral(window=6, seed=0, **kw):
    torch.manual_seed(seed)
    cfg = MistralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        sliding_window=window,
        tie_word_embeddings=False,
        **kw,
    )
    return MistralForCausalLM(cfg).eval()


# ------------------------------------------------------------------ Qwen2


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_qwen2_logits_match_hf(kv_heads):
    model = tiny_qwen2(kv_heads=kv_heads)
    cfg = config_from_hf(model.config)
    assert cfg.qkv_bias and cfg.arch == "llama"
    params = from_hf_llama(model, dtype=jnp.float32)
    # Qwen2 biases land on q/k/v only (modeling_qwen2 hardcodes o_proj
    # bias=False)
    lp = params["layers"][0]
    assert "b" in lp["q_proj"] and "b" in lp["k_proj"] and "b" in lp["v_proj"]
    assert "b" not in lp["o_proj"] and "b" not in lp["gate_proj"]

    ids = np.random.default_rng(0).integers(0, 256, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qwen2_serve_tracks_fake_quant_oracle():
    model = tiny_qwen2()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 8)))

    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    assert np.abs(got - oracle).max() / np.abs(oracle).max() < 0.06
    assert (got.argmax(-1) == oracle.argmax(-1)).mean() >= 0.75


def test_qwen2_fused_qkv_bias_matches_unfused():
    model = tiny_qwen2()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 8)))
    got_u, _ = forward_serve(
        quantize_params(params, cfg, policy, dtype=jnp.float32), cfg, policy, ids
    )
    got_f, _ = forward_serve(
        quantize_params(params, cfg, policy, dtype=jnp.float32, fuse=True),
        cfg, policy, ids,
    )
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(got_u), atol=1e-5)


def test_qwen2_weight_only_bias_path():
    """W4A16 routes through the bf16 layer path; biases must still apply."""
    model = tiny_qwen2()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.weight_only(wbits=4)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (1, 8)))
    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    got, _ = forward_serve(
        quantize_params(params, cfg, policy, dtype=jnp.float32), cfg, policy, ids
    )
    assert np.abs(np.asarray(got) - oracle).max() / np.abs(oracle).max() < 0.02


def test_qwen2_export_roundtrip(tmp_path):
    """Exporter emits q/k/v biases; load_packed restores them (padded to the
    plane width per the quantize_params convention)."""
    from safetensors.torch import save_file as torch_save
    import json, os
    from flexq_tpu.export.exporter import export_checkpoint, load_packed

    model = tiny_qwen2()
    hf_dir = tmp_path / "hf"
    os.makedirs(hf_dir)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    torch_save(sd, str(hf_dir / "model.safetensors"))
    with open(hf_dir / "config.json", "w") as f:
        json.dump(model.config.to_dict(), f)

    out_dir = tmp_path / "packed"
    export_checkpoint(str(hf_dir), str(out_dir))
    cfg, policy, params = load_packed(str(out_dir))
    assert cfg.qkv_bias
    lp = params["layers"][0]
    assert "b" in lp["q_proj"] and "b" not in lp["o_proj"]

    ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (1, 8)))
    got, _ = forward_serve(params, cfg, policy, ids)
    want, _ = forward_serve(
        quantize_params(from_hf_llama(model, dtype=jnp.float32), cfg, policy),
        cfg, policy, ids,
    )
    # exporter quantizes from bf16-rounded HF weights; loose but tight enough
    # to catch a dropped/mis-padded bias (bias magnitudes ~1e-2 of logits)
    assert (
        np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
        / np.abs(np.asarray(want, np.float32)).max()
        < 0.05
    )


# ---------------------------------------------------------------- Mistral


def test_mistral_logits_match_hf_with_window():
    model = tiny_mistral(window=4)
    cfg = config_from_hf(model.config)
    assert cfg.sliding_window == 4
    params = from_hf_llama(model, dtype=jnp.float32)
    # L=12 > window=4: the window must actually bite
    ids = np.random.default_rng(1).integers(0, 256, (2, 12))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # and the window is not a no-op: full-causal logits differ
    cfg_full = config_from_hf(dict(model.config.to_dict(), sliding_window=None))
    full = np.asarray(forward(params, cfg_full, jnp.asarray(ids)))
    assert np.abs(full - got).max() > 1e-3


def test_mistral_engine_greedy_matches_hf():
    from flexq_tpu.serve.engine import Engine

    model = tiny_mistral(window=6)
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.fp16()
    qp = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qp, cfg, policy, max_seq_len=64)
    prompt = np.random.default_rng(3).integers(0, 256, (1, 12))
    out = np.asarray(eng.generate(jnp.asarray(prompt), max_new_tokens=8))
    with torch.no_grad():
        hf = model.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False
        ).numpy()
    np.testing.assert_array_equal(out[0], hf[0, 12:])


def test_mistral_scheduler_decode_with_window():
    """Continuous-batching scheduler applies the window in its decode masks."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    model = tiny_mistral(window=6)
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.fp16()
    qp = quantize_params(params, cfg, policy, dtype=jnp.float32)

    sched = BatchScheduler(
        qp, cfg, policy, num_slots=2, max_seq_len=64, kv_dtype=jnp.float32
    )
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 256, 12).tolist()
    rid = sched.add_request(prompt, max_new_tokens=8, eos_id=-1)
    out = sched.run()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        ).numpy()
    np.testing.assert_array_equal(np.asarray(out[rid]), hf[0, 12:])


def test_windowed_causal_mask_semantics():
    m = np.asarray(causal_mask(5, 5, window=2)[0, 0])
    ok = m == 0.0
    want = np.array(
        [
            [1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [0, 1, 1, 0, 0],
            [0, 0, 1, 1, 0],
            [0, 0, 0, 1, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(ok, want)


# ------------------------------------------------- windowed flash kernels


def test_flash_decode_window_matches_golden():
    from flexq_tpu.kernels.flash_decode import flash_decode, flash_decode_ref

    rng = np.random.default_rng(0)
    B, H, KVH, S, D = 2, 8, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
    lens = jnp.asarray([300, 130], jnp.int32)
    for w in (64, 200, 1000):  # windows inside, straddling, beyond the fill
        got = flash_decode(
            q, k, v, lens, interpret=True, window=w, out_dtype=jnp.float32
        )
        want = flash_decode_ref(q, k, v, lens, window=w)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-3


def test_flash_decode_window_int8_matches_golden():
    from flexq_tpu.kernels.flash_decode import flash_decode, flash_decode_ref

    rng = np.random.default_rng(1)
    B, H, KVH, S, D = 2, 8, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 127, (B, KVH, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, (B, KVH, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (B, KVH, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.02, (B, KVH, S)), jnp.float32)
    lens = jnp.asarray([300, 130], jnp.int32)
    got = flash_decode(
        q, k8, v8, lens, ks, vs, interpret=True, window=100,
        out_dtype=jnp.float32,
    )
    want = flash_decode_ref(q, k8, v8, lens, ks, vs, window=100)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-3


def test_flash_prefill_window_matches_golden():
    from flexq_tpu.kernels.flash_prefill import flash_prefill, flash_prefill_ref

    rng = np.random.default_rng(2)
    B, Lq, H, KVH, S, D = 2, 96, 8, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
    lens = jnp.asarray([300, 200], jnp.int32)
    for w in (32, 150, 1000):
        got = flash_prefill(
            q, k, v, lens, interpret=True, window=w, out_dtype=jnp.float32
        )
        want = flash_prefill_ref(q, k, v, lens, window=w)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5


def test_flash_decode_paged_window_matches_golden():
    from flexq_tpu.kernels.flash_decode import (
        flash_decode_paged,
        flash_decode_ref,
    )

    rng = np.random.default_rng(3)
    B, H, KVH, D, PS = 2, 4, 4, 128, 128
    NP, MAXP = 9, 4
    lens = jnp.asarray([400, 170], jnp.int32)
    k = rng.standard_normal((B, KVH, MAXP * PS, D)).astype(np.float32)
    v = rng.standard_normal((B, KVH, MAXP * PS, D)).astype(np.float32)
    # scatter the contiguous caches into a shuffled pool
    pool_k = np.zeros((1, NP, KVH, PS, D), np.float32)
    pool_v = np.zeros((1, NP, KVH, PS, D), np.float32)
    table = np.zeros((B, MAXP), np.int32)
    page = 1
    for b in range(B):
        for i in range(MAXP):
            table[b, i] = page
            pool_k[0, page] = k[b, :, i * PS : (i + 1) * PS]
            pool_v[0, page] = v[b, :, i * PS : (i + 1) * PS]
            page += 1
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    got = flash_decode_paged(
        q, jnp.asarray(pool_k), jnp.asarray(pool_v), jnp.asarray(table),
        lens, layer_idx=0, interpret=True, window=100, out_dtype=jnp.float32,
    )
    want = flash_decode_ref(q, jnp.asarray(k), jnp.asarray(v), lens, window=100)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 5e-3


# ------------------------------------------------------- LLaMA-3.1 rope


def test_llama3_rope_scaling_matches_hf():
    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 16,
        },
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(model.config)
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 16)
    params = from_hf_llama(model, dtype=jnp.float32)
    # positions beyond original_max exercise the scaled band
    ids = np.random.default_rng(2).integers(0, 128, (1, 40))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llama3_rope_scaling_serve_engine():
    """rope_for_cfg must be applied on the serve path too (not just eval)."""
    from flexq_tpu.serve.engine import Engine

    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 16,
        },
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.fp16()
    qp = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qp, cfg, policy, max_seq_len=64)
    prompt = np.random.default_rng(7).integers(0, 128, (1, 24))
    out = np.asarray(eng.generate(jnp.asarray(prompt), max_new_tokens=6))
    with torch.no_grad():
        hf = model.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False
        ).numpy()
    np.testing.assert_array_equal(out[0], hf[0, 24:])


def test_unsupported_rope_type_raises():
    with pytest.raises(ValueError, match="rope_scaling"):
        config_from_hf(
            {
                "model_type": "llama",
                "vocab_size": 128,
                "hidden_size": 64,
                "intermediate_size": 128,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "rope_scaling": {"rope_type": "yarn", "factor": 2.0},
            }
        )


def test_sliding_window_zero_rejected():
    from flexq_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="sliding_window"):
        ModelConfig.llama(sliding_window=0)


def test_qwen2_hybrid_window_layers_rejected():
    """HF windows only layers >= max_window_layers; the global
    cfg.sliding_window cannot represent that hybrid — refuse loudly."""
    with pytest.raises(ValueError, match="max_window_layers"):
        config_from_hf(
            {
                "model_type": "qwen2",
                "vocab_size": 256,
                "hidden_size": 128,
                "intermediate_size": 256,
                "num_hidden_layers": 28,
                "num_attention_heads": 4,
                "use_sliding_window": True,
                "sliding_window": 4096,
                "max_window_layers": 20,
            }
        )


def test_smooth_fold_invariance_with_qwen2_biases():
    """collect_llama_act_stats must apply the q/k/v biases (the residual
    stream it propagates feeds every deeper layer's statistics), and the
    folds must leave the biased forward exactly invariant."""
    from flexq_tpu.quant.smooth import collect_llama_act_stats, smooth_llama
    from flexq_tpu.models.llama import forward as fwd

    model = tiny_qwen2()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 16)))
    stats = collect_llama_act_stats(params, cfg, ids)
    sm = smooth_llama(params, cfg, stats, alpha=0.5, fold_qk=True)
    a = np.asarray(fwd(params, cfg, ids))
    b = np.asarray(fwd(sm, cfg, ids))
    assert np.abs(a - b).max() < 1e-3


# ------------------------------------------------------------------ Gemma


def tiny_gemma(kv_heads=1, seed=0):
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(seed)
    cfg = GemmaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        head_dim=32,  # Gemma-style override (not hidden/heads)
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
    )
    return GemmaForCausalLM(cfg).eval()


@pytest.mark.parametrize("kv_heads", [1, 4])  # MQA (gemma-2b) and MHA (7b)
def test_gemma_logits_match_hf(kv_heads):
    model = tiny_gemma(kv_heads=kv_heads)
    cfg = config_from_hf(model.config)
    assert cfg.act == "gelu" and cfg.norm_offset == 1.0
    assert cfg.embed_scale == pytest.approx(128**0.5)
    assert cfg.head_dim == 32 and cfg.tie_word_embeddings
    params = from_hf_llama(model, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 256, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gemma_serve_tracks_fake_quant_oracle():
    """GeGLU + (1+w)-norm + scaled embeds through the quantized serve path
    (exercises the gelu branch of glu_quant and the W6 GLU kernels)."""
    model = tiny_gemma()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 8)))
    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    got, _ = forward_serve(
        quantize_params(params, cfg, policy, dtype=jnp.float32), cfg, policy, ids
    )
    got = np.asarray(got)
    assert np.abs(got - oracle).max() / np.abs(oracle).max() < 0.06
    assert (got.argmax(-1) == oracle.argmax(-1)).mean() >= 0.75


def test_gemma_engine_greedy_matches_hf():
    from flexq_tpu.serve.engine import Engine

    model = tiny_gemma()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.fp16()
    eng = Engine(
        quantize_params(params, cfg, policy, dtype=jnp.float32), cfg, policy,
        max_seq_len=64,
    )
    prompt = np.random.default_rng(5).integers(0, 256, (1, 12))
    out = np.asarray(eng.generate(jnp.asarray(prompt), max_new_tokens=8))
    with torch.no_grad():
        hf = model.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False
        ).numpy()
    np.testing.assert_array_equal(out[0], hf[0, 12:])


def test_gemma_prefill_bf16_glu_kernel_path():
    """The W6A16 prefill path runs the fused GLU kernel with act=gelu;
    its output must track the dense fake-quant oracle."""
    model = tiny_gemma()
    cfg = config_from_hf(model.config)
    params = from_hf_llama(model, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 8)))
    got, _ = forward_serve(
        quantize_params(params, cfg, policy, dtype=jnp.float32), cfg, policy,
        ids, prefill_bf16=True,
    )
    dense = np.asarray(forward(params, cfg, ids))
    got = np.asarray(got)
    # W6A16: weights quantized, acts exact — close to the dense model
    assert np.abs(got - dense).max() / np.abs(dense).max() < 0.05
