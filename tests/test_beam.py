"""Beam search vs greedy invariants (reference beam_search_layers parity)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import forward_serve, quantize_params
from flexq_tpu.serve import Engine
from flexq_tpu.serve.beam import BeamParams, beam_search


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    mcfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, mcfg, policy, dtype=jnp.float32)
    eng = Engine(qparams, mcfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    return mcfg, policy, qparams, eng


def _seq_logprob(qparams, cfg, policy, prompt, continuation):
    """Joint log-prob of continuation given prompt via full forwards."""
    seq = list(prompt)
    total = 0.0
    for t in continuation:
        logits, _ = forward_serve(qparams, cfg, policy, jnp.asarray([seq]))
        logp = jax.nn.log_softmax(jnp.asarray(logits)[0, -1].astype(jnp.float32))
        total += float(logp[t])
        seq.append(t)
    return total


def test_beam1_matches_greedy(setup):
    cfg, policy, qparams, eng = setup
    prompt = [[1, 5, 9]]
    greedy = eng.generate(prompt, max_new_tokens=5, eos_id=-1)
    beam = beam_search(
        eng, prompt, BeamParams(beam_width=1, length_penalty=0.0, max_new_tokens=5),
        eos_id=-1,
    )
    assert beam == greedy, (beam, greedy)


def test_beam_score_at_least_greedy(setup):
    cfg, policy, qparams, eng = setup
    prompt = [3, 7, 11]
    greedy = eng.generate([prompt], max_new_tokens=4, eos_id=-1)[0]
    beam = beam_search(
        eng, [prompt], BeamParams(beam_width=4, length_penalty=0.0, max_new_tokens=4),
        eos_id=-1,
    )[0]
    lp_greedy = _seq_logprob(qparams, cfg, policy, prompt, greedy)
    lp_beam = _seq_logprob(qparams, cfg, policy, prompt, beam)
    assert lp_beam >= lp_greedy - 1e-4, (lp_beam, lp_greedy)


def test_beam_batch_and_eos(setup):
    cfg, policy, qparams, eng = setup
    # find a token the model likes to emit, use it as eos
    probe = eng.generate([[1, 2, 3]], max_new_tokens=6, eos_id=-1)[0]
    eos = probe[1]
    out = beam_search(
        eng, [[1, 2, 3], [4, 5, 6]],
        BeamParams(beam_width=3, max_new_tokens=6), eos_id=eos,
    )
    assert len(out) == 2
    for row in out:
        assert 1 <= len(row) <= 6
        if eos in row:
            assert row[-1] == eos and row.count(eos) == 1
