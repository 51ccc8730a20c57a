"""Serve-path integration: quantized kernels end-to-end vs fake-quant oracle.

The key parity property (SURVEY.md §3.4): the serving path (int kernels +
fused producers) must track the fake-quant accuracy path. Exact equality is
not expected — the serve path fuses act-quant *after* norm in f32 while the
oracle quantizes the dense activations — but logits must agree closely and
greedy decoding must be stable.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.llama import forward, fake_quant_weights
from flexq_tpu.models.quantized import forward_serve, quantize_params
from flexq_tpu.serve import Engine, SamplingParams


def tiny_model(kv_heads=2):
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    mcfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    return mcfg, params


def test_forward_serve_tracks_fake_quant_oracle():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()  # W6, A6, down A8
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 8)))

    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)

    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.06
    # top-1 agreement on most positions
    agree = (got.argmax(-1) == oracle.argmax(-1)).mean()
    assert agree >= 0.75


def test_generate_greedy_matches_oracle_prefix():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)

    prompt = [[1, 5, 9, 12]]
    out = eng.generate(prompt, max_new_tokens=6, eos_id=-1)
    assert len(out[0]) == 6

    # incremental decode must equal full-sequence forward argmax chain
    qp = qparams
    seq = list(prompt[0])
    want = []
    for _ in range(6):
        logits, _ = forward_serve(qp, cfg, policy, jnp.asarray([seq]))
        nxt = int(np.asarray(logits)[0, -1].argmax())
        want.append(nxt)
        seq.append(nxt)
    assert out[0] == want


def test_generate_stops_on_eos():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    out = eng.generate([[1, 2, 3]], max_new_tokens=8, eos_id=-1)
    eos = out[0][2] if len(out[0]) > 2 else out[0][-1]
    out2 = eng.generate([[1, 2, 3]], max_new_tokens=8, eos_id=eos)
    assert out2[0][-1] == eos and len(out2[0]) <= 8


def test_generate_batch():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    out = eng.generate([[1, 2, 3], [4, 5, 6]], max_new_tokens=4, eos_id=-1)
    single = eng.generate([[4, 5, 6]], max_new_tokens=4, eos_id=-1)
    assert len(out) == 2 and out[1] == single[0]


def test_prefill_bf16_path_close_to_exact():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (1, 8)))
    exact, _ = forward_serve(qparams, cfg, policy, ids)
    a16, _ = forward_serve(qparams, cfg, policy, ids, prefill_bf16=True)
    exact, a16 = np.asarray(exact), np.asarray(a16)
    # A16 drops act-quant noise; bf16 weight rounding adds a little — close
    assert np.abs(a16 - exact).max() / np.abs(exact).max() < 0.08
    assert (a16.argmax(-1) == exact.argmax(-1)).mean() >= 0.75


def test_int8_kv_cache_close_to_bf16():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng_f = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    eng_q = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.int8)
    prompt = [[1, 5, 9, 12]]
    out_f = eng_f.generate(prompt, max_new_tokens=6, eos_id=-1)
    out_q = eng_q.generate(prompt, max_new_tokens=6, eos_id=-1)
    # int8 KV with per-head scales is near-lossless: greedy chain matches
    assert out_q[0] == out_f[0]


def test_int8_kv_cache_memory_halved():
    import numpy as np
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.int8)
    cache = eng.new_cache(2)
    assert len(cache) == 4 and cache[0].dtype == jnp.int8
    val_bytes = cache[0].size  # int8: 1 byte each
    scale_bytes = cache[2].size * 4
    bf16_bytes = cache[0].size * 2
    assert val_bytes + scale_bytes < bf16_bytes * 0.6  # ~0.52x with D=64


def test_fused_qkv_gateup_matches_unfused():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    unfused = quantize_params(params, cfg, policy, dtype=jnp.float32)
    fused = quantize_params(params, cfg, policy, dtype=jnp.float32, fuse=True)
    assert "qkv_proj" in fused["layers"][0] and "gate_up" in fused["layers"][0]
    ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (1, 8)))
    want, _ = forward_serve(unfused, cfg, policy, ids)
    got, _ = forward_serve(fused, cfg, policy, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_fused_loop_matches_stepwise():
    """The on-device lax.while_loop decode must reproduce the host stepwise
    loop exactly (same sampling-key sequence, count/length update order)."""
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    prompts = [[1, 5, 9], [2, 4, 8]]
    for sp in (
        SamplingParams(),  # greedy
        SamplingParams(greedy=False, temperature=0.8, top_k=20),
        SamplingParams(repetition_penalty=1.3),
    ):
        fused = eng.generate(prompts, max_new_tokens=5, sampling=sp, eos_id=-1, seed=7)
        step = eng.generate(
            prompts, max_new_tokens=5, sampling=sp, eos_id=-1, seed=7, mode="stepwise"
        )
        assert fused == step, (sp, fused, step)


def test_fused_loop_early_stop():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    probe = eng.generate([[1, 2, 3]], max_new_tokens=8, eos_id=-1)
    eos = probe[0][2]
    out = eng.generate([[1, 2, 3]], max_new_tokens=8, eos_id=eos)
    ref = eng.generate([[1, 2, 3]], max_new_tokens=8, eos_id=eos, mode="stepwise")
    # eos may also occur earlier in the chain; stop index just must match
    assert out == ref and out[0][-1] == eos and len(out[0]) <= 3


def test_chunked_prefill_matches_single_pass():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    import jax.numpy as jnp2

    ids = jnp2.asarray(np.random.default_rng(0).integers(0, 256, (2, 11)))
    eng1 = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                  prefill_bf16_threshold=10**9)
    eng2 = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                  prefill_bf16_threshold=10**9, prefill_chunk=4)
    c1 = eng1.new_cache(2)
    l1, c1 = eng1._prefill_jit(eng1.params, ids, c1, prompt_len=11)
    c2 = eng2.new_cache(2)
    l2, c2 = eng2.prefill_chunked(ids, c2, chunk=4)  # chunks 4,4,3
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)
    for a, b in zip(c1, c2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-4, atol=2e-4
        )
    # and the generate() path end-to-end
    out1 = eng1.generate([[1, 5, 9, 12, 3, 7]], max_new_tokens=4, eos_id=-1)
    out2 = eng2.generate([[1, 5, 9, 12, 3, 7]], max_new_tokens=4, eos_id=-1)
    assert out1 == out2


def test_opt_engine_generate_with_cache():
    """OPT serve path through the Engine (cache + flash/fallback attention):
    incremental decode must equal the full-sequence argmax chain."""
    from transformers import OPTConfig, OPTForCausalLM

    from flexq_tpu.models import config_from_hf, from_hf_opt

    torch.manual_seed(0)
    ocfg = OPTConfig(
        vocab_size=128, hidden_size=128, ffn_dim=256, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
        do_layer_norm_before=True, tie_word_embeddings=True,
    )
    m = OPTForCausalLM(ocfg).eval()
    cfg = config_from_hf(m.config)
    params = from_hf_opt(m, dtype=jnp.float32)
    policy = QuantPolicy.opt_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    # max_seq_len 128 => flash decode path active
    eng = Engine(qparams, cfg, policy, max_seq_len=128, kv_dtype=jnp.float32)
    prompt = [4, 9, 17]
    out = eng.generate([prompt], max_new_tokens=5, eos_id=-1)[0]
    seq = list(prompt)
    want = []
    for _ in range(5):
        logits, _ = forward_serve(qparams, cfg, policy, jnp.asarray([seq]))
        nxt = int(np.asarray(logits)[0, -1].argmax())
        want.append(nxt)
        seq.append(nxt)
    assert out == want, (out, want)


def _tiny_model_vocab(vocab):
    """tiny_model with a non-128-multiple vocab to exercise pad slicing."""
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=vocab,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    return config_from_hf(m.config), from_hf_llama(m, dtype=jnp.float32)


def test_quantized_lm_head_tracks_oracle():
    """with_head(6, 8): packed vocab GEMM (exceeds parity — the reference's
    lm_head stays fp16 in every int8_mode, Llama.cc:1090-1130) must track the
    fake-quant oracle with the same tolerance as the body, and the padded
    vocab columns must be sliced off (vocab 250 pads to 256 in the kernel)."""
    cfg, params = _tiny_model_vocab(250)
    policy = QuantPolicy.llama_flex().with_head(6, 8)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 250, (1, 8)))

    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    assert isinstance(qparams["lm_head"], dict) and "hi" in qparams["lm_head"]
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)

    assert got.shape == oracle.shape == (1, 8, 250)
    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.06
    assert (got.argmax(-1) == oracle.argmax(-1)).mean() >= 0.75


def test_weight_only_quantized_lm_head():
    """W4A16 policy + W4 head (abits=16): the head must run the bf16-dequant
    GEMM, not wrap 16-bit activations into an int8 container."""
    cfg, params = _tiny_model_vocab(250)
    policy = QuantPolicy.weight_only("llama", wbits=4).with_head(4, abits=16)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 250, (1, 6)))
    oracle = np.asarray(
        forward(fake_quant_weights(params, policy), cfg, ids, policy=policy)
    )
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    assert "q4" in qparams["lm_head"]
    got, _ = forward_serve(qparams, cfg, policy, ids)
    got = np.asarray(got)
    assert got.shape == (1, 6, 250)
    denom = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / denom < 0.06
    assert (got.argmax(-1) == oracle.argmax(-1)).mean() >= 0.75


def test_quantized_lm_head_engine_decode():
    """Incremental decode with a packed head equals the full-forward chain."""
    cfg, params = _tiny_model_vocab(250)
    policy = QuantPolicy.llama_flex().with_head(6, 8)
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    prompt = [3, 17, 41]
    out = eng.generate([prompt], max_new_tokens=5, eos_id=-1)[0]
    seq = list(prompt)
    want = []
    for _ in range(5):
        logits, _ = forward_serve(qparams, cfg, policy, jnp.asarray([seq]))
        nxt = int(np.asarray(logits)[0, -1].argmax())
        want.append(nxt)
        seq.append(nxt)
    assert out == want, (out, want)
