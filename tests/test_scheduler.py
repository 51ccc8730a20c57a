"""Continuous batching scheduler tests: outputs must match the plain Engine."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve import Engine, SamplingParams
from flexq_tpu.serve.scheduler import BatchScheduler


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(from_hf_llama(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32)
    return cfg, policy, qparams


def test_single_request_matches_engine(setup):
    cfg, policy, qparams = setup
    eng = Engine(qparams, cfg, policy, max_seq_len=48, kv_dtype=jnp.float32,
                 prefill_bf16_threshold=10**9)
    want = eng.generate([[3, 14, 15, 9]], max_new_tokens=6, eos_id=-1)[0]

    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=48,
                          kv_dtype=jnp.float32)
    rid = sched.add_request([3, 14, 15, 9], max_new_tokens=6, eos_id=-1)
    out = sched.run()
    assert out[rid] == want


def test_concurrent_ragged_requests(setup):
    cfg, policy, qparams = setup
    eng = Engine(qparams, cfg, policy, max_seq_len=48, kv_dtype=jnp.float32,
                 prefill_bf16_threshold=10**9)
    w1 = eng.generate([[3, 14, 15, 9]], max_new_tokens=5, eos_id=-1)[0]
    w2 = eng.generate([[7, 7]], max_new_tokens=4, eos_id=-1)[0]
    w3 = eng.generate([[100, 2, 30, 4, 55, 6]], max_new_tokens=3, eos_id=-1)[0]

    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=48,
                          kv_dtype=jnp.float32)
    r1 = sched.add_request([3, 14, 15, 9], max_new_tokens=5, eos_id=-1)
    r2 = sched.add_request([7, 7], max_new_tokens=4, eos_id=-1)
    r3 = sched.add_request([100, 2, 30, 4, 55, 6], max_new_tokens=3, eos_id=-1)  # queued
    out = sched.run()
    assert out[r1] == w1
    assert out[r2] == w2
    assert out[r3] == w3


def test_late_arrival_mid_decode(setup):
    cfg, policy, qparams = setup
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=48,
                          kv_dtype=jnp.float32)
    r1 = sched.add_request([3, 14, 15, 9], max_new_tokens=8, eos_id=-1)
    done = {}
    done.update(sched.step())
    done.update(sched.step())
    r2 = sched.add_request([7, 7], max_new_tokens=4, eos_id=-1)  # arrives late
    while sched.has_work:
        done.update(sched.step())

    eng = Engine(qparams, cfg, policy, max_seq_len=48, kv_dtype=jnp.float32,
                 prefill_bf16_threshold=10**9)
    assert done[r1] == eng.generate([[3, 14, 15, 9]], max_new_tokens=8, eos_id=-1)[0]
    assert done[r2] == eng.generate([[7, 7]], max_new_tokens=4, eos_id=-1)[0]
