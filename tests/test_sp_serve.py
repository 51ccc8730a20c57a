"""Sequence-parallel SERVING (parallel/sp_serve.py) vs the single-device
quantized serve path: logits and greedy generations must agree within the
act-quant compile-noise tolerances established by tests/test_parallel.py.

This is the long-context capacity path the reference architecturally lacks
(one GPU's KV + O(L^2) fp16 softmax; SURVEY.md §5): the prompt KV cache is
sharded over a ``seq`` mesh axis, decode merges per-rank attention partials
with log-sum-exp collectives.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models.quantized import forward_serve, quantize_params
from flexq_tpu.parallel import generate_sp, make_sp_mesh, sp_prefill, sp_decode_step
from flexq_tpu.serve.engine import decode_mask, prefill_mask

from tests.test_parallel import tiny_model


@pytest.fixture(scope="module")
def quantized():
    cfg, params = tiny_model(heads=4, kv_heads=2, hidden=512)  # GQA
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    return cfg, policy, qparams


def _reference_generate(qparams, cfg, policy, ids, max_new, maxlen=32):
    """Single-device prefill(bf16 path)+decode greedy loop, dense bf16 cache
    — numerically the same path sp_serve distributes."""
    b, l = ids.shape
    shape = (cfg.num_layers, b, cfg.num_kv_heads, maxlen, cfg.head_dim)
    kv_k = jnp.zeros(shape, jnp.bfloat16)
    kv_v = jnp.zeros(shape, jnp.bfloat16)
    logits, (kv_k, kv_v) = forward_serve(
        qparams, cfg, policy, ids, kv_k=kv_k, kv_v=kv_v,
        cache_pos=jnp.int32(0), mask=prefill_mask(l, maxlen), prefill_bf16=True,
    )
    toks, logs = [], []
    cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    logs.append(np.asarray(logits[:, -1]))
    for t in range(max_new):
        toks.append(np.asarray(cur)[:, 0])
        if t == max_new - 1:
            break
        pos = l + t
        logits, (kv_k, kv_v) = forward_serve(
            qparams, cfg, policy, cur, kv_k=kv_k, kv_v=kv_v,
            cache_pos=jnp.int32(pos), mask=decode_mask(jnp.int32(pos), maxlen),
            positions=jnp.full((b, 1), pos, jnp.int32),
        )
        logs.append(np.asarray(logits[:, -1]))
        cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    return np.stack(toks, axis=1), np.stack(logs, axis=1)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_prefill_logits_match_single_device(quantized, sp):
    cfg, policy, qparams = quantized
    mesh = make_sp_mesh(sp=sp)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)), jnp.int32)

    want, _ = forward_serve(qparams, cfg, policy, ids, prefill_bf16=True)
    want = np.asarray(want[:, -1])
    got, (pk, pv) = sp_prefill(qparams, cfg, policy, ids, mesh)
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.95

    # the sharded prompt cache holds the same K/V the dense path writes
    assert pk.shape == (cfg.num_layers, 2, cfg.num_kv_heads, 8, cfg.head_dim)


def test_sp_generate_matches_single_device(quantized):
    cfg, policy, qparams = quantized
    mesh = make_sp_mesh(sp=4)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)), jnp.int32)

    want_toks, want_logs = _reference_generate(qparams, cfg, policy, ids, 5)
    got_toks, got_logs = generate_sp(
        qparams, cfg, policy, ids, mesh, max_new_tokens=5, return_logits=True
    )
    # step-0 logits: single-forward act-quant tolerance (test_parallel.py)
    np.testing.assert_allclose(got_logs[:, 0], want_logs[:, 0], rtol=2e-3, atol=3e-2)
    # full trajectory: noise COMPOUNDS over 5 chained forwards (each step's
    # bf16-cache rounding feeds the next), so the bound is looser
    np.testing.assert_allclose(got_logs, want_logs, rtol=5e-3, atol=1.2e-1)
    close0 = np.isclose(got_logs[:, 0], want_logs[:, 0], rtol=2e-3, atol=2e-2)
    assert close0.mean() > 0.95
    close = np.isclose(got_logs, want_logs, rtol=2e-3, atol=2e-2)
    assert close.mean() > 0.75  # rounding flips compound across 5 steps
    # greedy tokens: near-tie argmax flips allowed on random weights, but the
    # two paths must agree on the vast majority of steps
    agree = (got_toks == want_toks).mean()
    assert agree >= 0.8, (got_toks, want_toks)


def test_sp_decode_step_tail_attention(quantized):
    """Generated-token KV (the replicated tail) must actually be attended:
    two decode steps where step 2's logits depend on step 1's token."""
    cfg, policy, qparams = quantized
    mesh = make_sp_mesh(sp=2)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 4)), jnp.int32)
    logits, pc = sp_prefill(qparams, cfg, policy, ids, mesh)
    tail = (cfg.num_layers, 1, cfg.num_kv_heads, 4, cfg.head_dim)
    tk, tv = jnp.zeros(tail, jnp.bfloat16), jnp.zeros(tail, jnp.bfloat16)

    tok_a = jnp.asarray([[7]], jnp.int32)
    tok_b = jnp.asarray([[91]], jnp.int32)
    la, tka, tva = sp_decode_step(
        qparams, cfg, policy, tok_a, mesh, pc, tk, tv, jnp.int32(0), 4
    )
    lb, _, _ = sp_decode_step(
        qparams, cfg, policy, tok_b, mesh, pc, tk, tv, jnp.int32(0), 4
    )
    # different tokens at the same position -> different logits (sanity)
    assert not np.allclose(np.asarray(la), np.asarray(lb))
    # step 2 after token A vs after token B: tail KV must influence it
    n = jnp.asarray([[3]], jnp.int32)
    l2a, _, _ = sp_decode_step(
        qparams, cfg, policy, n, mesh, pc, tka, tva, jnp.int32(1), 4
    )
    lb2, tkb, tvb = sp_decode_step(
        qparams, cfg, policy, tok_b, mesh, pc, tk, tv, jnp.int32(0), 4
    )
    l2b, _, _ = sp_decode_step(
        qparams, cfg, policy, n, mesh, pc, tkb, tvb, jnp.int32(1), 4
    )
    assert not np.allclose(np.asarray(l2a), np.asarray(l2b)), (
        "tail KV ignored: step-2 logits identical regardless of step-1 token"
    )


def test_sp_int8_prompt_cache_matches_bf16(quantized):
    """int8 sharded prompt KV (scales folded in-attend) must track the bf16
    sp path within int8-KV quantization tolerance."""
    cfg, policy, qparams = quantized
    mesh = make_sp_mesh(sp=4)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (1, 8)), jnp.int32)

    t16, l16 = generate_sp(
        qparams, cfg, policy, ids, mesh, max_new_tokens=4, return_logits=True
    )
    t8, l8 = generate_sp(
        qparams, cfg, policy, ids, mesh, max_new_tokens=4, return_logits=True,
        kv_dtype=jnp.int8,
    )
    # prefill logits identical (quantization only affects the stored cache)
    np.testing.assert_allclose(l8[:, 0], l16[:, 0], rtol=1e-4, atol=1e-4)
    # decode steps: int8 cache noise is small on these magnitudes
    np.testing.assert_allclose(l8, l16, rtol=5e-2, atol=2e-1)
    assert (t8 == t16).mean() >= 0.75
