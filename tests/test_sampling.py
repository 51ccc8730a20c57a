"""Sampling-layer unit tests (DynamicDecodeLayer parity surface)."""

import numpy as np
import jax
import jax.numpy as jnp

from flexq_tpu.serve.sampling import (
    SamplingParams,
    apply_min_length,
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    process_logits,
    sample,
)

NEG = np.finfo(np.float32).min


def test_top_k():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0
    assert out[0, 0] == NEG and out[0, 3] == NEG


def test_top_p_keeps_top_token():
    # extremely peaked: top-p tiny still keeps argmax
    logits = jnp.asarray([[10.0, 0.0, -5.0]])
    out = np.asarray(apply_top_p(logits, 0.01))
    assert out[0, 0] == 10.0 and out[0, 1] == NEG


def test_top_p_cumulative():
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.asarray(np.log(probs))[None]
    out = np.asarray(apply_top_p(logits, 0.7))
    # 0.5 < 0.7 so second token included (cum before it = 0.5 < p)
    assert out[0, 0] != NEG and out[0, 1] != NEG
    assert out[0, 2] == NEG and out[0, 3] == NEG


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    counts = jnp.asarray([[1, 1, 0]])
    out = np.asarray(apply_repetition_penalty(logits, counts, 2.0))
    assert out[0, 0] == 1.0  # positive divided
    assert out[0, 1] == -4.0  # negative multiplied
    assert out[0, 2] == 1.0  # unseen untouched


def test_min_length_bans_eos():
    logits = jnp.zeros((2, 5))
    cur = jnp.asarray([0, 10])
    out = np.asarray(apply_min_length(logits, cur, 5, eos_id=2))
    assert out[0, 2] == NEG and out[1, 2] == 0.0


def test_greedy_sample():
    logits = jnp.asarray([[0.0, 5.0, 1.0]])
    assert int(sample(logits, SamplingParams(greedy=True))[0]) == 1


def test_categorical_respects_filtering():
    logits = jnp.asarray([[0.0, 5.0, 1.0, 2.0]])
    p = SamplingParams(greedy=False, top_k=1)
    proc = process_logits(logits, p)
    for s in range(5):
        tok = int(sample(proc, p, jax.random.PRNGKey(s))[0])
        assert tok == 1


def test_process_pipeline_composes():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((3, 50)), jnp.float32)
    p = SamplingParams(temperature=0.7, top_k=10, top_p=0.9, repetition_penalty=1.3)
    counts = jnp.zeros((3, 50), jnp.int32).at[:, 0].set(2)
    out = process_logits(logits, p, token_counts=counts, cur_length=jnp.zeros(3, jnp.int32))
    assert out.shape == (3, 50)
    assert np.isfinite(np.asarray(out)).any(axis=1).all()
