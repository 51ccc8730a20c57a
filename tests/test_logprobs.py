"""Per-token log-prob outputs (parity with FT's output_log_probs tensor)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve import Engine, SamplingParams
from flexq_tpu.serve.scheduler import BatchScheduler
from test_serve import tiny_model


@pytest.fixture(scope="module")
def setup():
    cfg, params = tiny_model()
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    return cfg, policy, qparams


def test_engine_fused_and_stepwise_agree(setup):
    cfg, policy, qparams = setup
    eng = Engine(qparams, cfg, policy, max_seq_len=48, kv_dtype=jnp.float32,
                 prefill_bf16_threshold=10**9)
    prompt = [[3, 14, 15, 9]]
    out_f, lps_f = eng.generate(prompt, max_new_tokens=6, eos_id=-1,
                                return_logprobs=True, mode="fused")
    out_s, lps_s = eng.generate(prompt, max_new_tokens=6, eos_id=-1,
                                return_logprobs=True, mode="step")
    assert out_f == out_s
    assert len(lps_f[0]) == len(out_f[0]) == 6
    np.testing.assert_allclose(lps_f[0], lps_s[0], rtol=1e-5, atol=1e-6)
    # greedy log probs are the max of the processed distribution -> <= 0
    assert all(lp <= 0.0 for lp in lps_f[0])


def test_greedy_logprob_matches_manual(setup):
    """First generated token's logprob == log_softmax(prefill logits)[tok]."""
    import jax

    cfg, policy, qparams = setup
    eng = Engine(qparams, cfg, policy, max_seq_len=48, kv_dtype=jnp.float32,
                 prefill_bf16_threshold=10**9)
    prompt = [3, 14, 15, 9]
    out, lps = eng.generate([prompt], max_new_tokens=1, eos_id=-1,
                            return_logprobs=True)
    cache = eng.new_cache(1)
    ids = jnp.asarray(np.asarray([prompt], np.int32))
    logits, _ = eng._prefill_jit(eng.params, ids, cache, prompt_len=4)
    lsm = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(lps[0][0], lsm[0, out[0][0]], rtol=1e-5, atol=1e-6)


def test_scheduler_logprobs_match_engine(setup):
    cfg, policy, qparams = setup
    eng = Engine(qparams, cfg, policy, max_seq_len=48, kv_dtype=jnp.float32,
                 prefill_bf16_threshold=10**9)
    _, want = eng.generate([[3, 14, 15, 9]], max_new_tokens=5, eos_id=-1,
                           return_logprobs=True)
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=48,
                           kv_dtype=jnp.float32)
    rid = sched.add_request([3, 14, 15, 9], max_new_tokens=5, eos_id=-1,
                            logprobs=True)
    sched.run()
    got = sched.done_logprobs  # drained into done_logprobs at completion
    assert rid in got and len(got[rid]) == 5
    np.testing.assert_allclose(got[rid], want[0], rtol=1e-5, atol=1e-6)


def test_http_logprobs(setup):
    import json
    import urllib.request

    from flexq_tpu.serve.http import serve_background

    cfg, policy, qparams = setup
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=48,
                           kv_dtype=jnp.float32)
    server, service, port = serve_background(sched, "127.0.0.1", 0)
    try:
        body = json.dumps({"prompt_ids": [3, 14, 15, 9], "max_new_tokens": 4,
                           "eos_id": -1, "logprobs": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", body,
            {"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert len(resp["logprobs"]) == len(resp["tokens"]) == 4
        assert resp["cum_logprob"] == pytest.approx(sum(resp["logprobs"]))
        # no-logprobs request omits the fields
        body = json.dumps({"prompt_ids": [3, 14], "max_new_tokens": 2,
                           "eos_id": -1}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", body,
            {"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert "logprobs" not in resp
    finally:
        service.shutdown()
        server.shutdown()
