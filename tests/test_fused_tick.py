"""Fused multi-step scheduler ticks must generate exactly what the
per-token host loop generates (greedy), across dense/paged/int8-KV caches
and under the CPU mesh."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve import SamplingParams
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
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32
    )
    return cfg, policy, qparams


PROMPTS = [[3, 14, 15, 9], [7, 7], [100, 2, 30, 4, 55, 6]]
BUDGETS = [9, 4, 6]


def _run(sched):
    rids = [
        sched.add_request(p, max_new_tokens=n, eos_id=-1)
        for p, n in zip(PROMPTS, BUDGETS)
    ]
    out = sched.run()
    return [out[r] for r in rids]


def _mk(cfg, policy, qparams, **kw):
    kw.setdefault("num_slots", 2)
    kw.setdefault("max_seq_len", 256)
    kw.setdefault("kv_dtype", jnp.float32)
    return BatchScheduler(qparams, cfg, policy, **kw)


def test_fused_dense_matches_stepwise(setup):
    cfg, policy, qparams = setup
    want = _run(_mk(cfg, policy, qparams))
    got = _run(_mk(cfg, policy, qparams, fused_tick=4))
    assert got == want


def test_fused_paged_matches_stepwise(setup):
    cfg, policy, qparams = setup
    want = _run(_mk(cfg, policy, qparams))
    got = _run(_mk(cfg, policy, qparams, fused_tick=3, paged=True, page_size=128))
    assert got == want
    # preallocated pages all reclaimed on completion (garbage page stays)
    sched = _mk(cfg, policy, qparams, fused_tick=3, paged=True, page_size=128)
    _run(sched)
    assert sched.pool.free_pages == sched.pool.num_pages - 1


def test_fused_int8_kv_matches_stepwise(setup):
    cfg, policy, qparams = setup
    want = _run(_mk(cfg, policy, qparams, kv_dtype=jnp.int8))
    got = _run(_mk(cfg, policy, qparams, kv_dtype=jnp.int8, fused_tick=4))
    assert got == want


def test_fused_late_arrival(setup):
    """A request arriving mid-fused-run must still match the stepwise
    stream (greedy streams are admission-timing independent)."""
    cfg, policy, qparams = setup
    base = _mk(cfg, policy, qparams)
    r1 = base.add_request(PROMPTS[0], max_new_tokens=8, eos_id=-1)
    r2 = base.add_request(PROMPTS[1], max_new_tokens=5, eos_id=-1)
    want = base.run()

    sched = _mk(cfg, policy, qparams, fused_tick=4)
    f1 = sched.add_request(PROMPTS[0], max_new_tokens=8, eos_id=-1)
    done = dict(sched.step())
    f2 = sched.add_request(PROMPTS[1], max_new_tokens=5, eos_id=-1)
    while sched.has_work:
        done.update(sched.step())
    assert done[f1] == want[r1]
    assert done[f2] == want[r2]


def test_fused_eos_stops_early(setup):
    """Per-slot on-device eos masking: pick the first greedily generated
    token as the eos and check the fused run stops after exactly one."""
    cfg, policy, qparams = setup
    probe = _mk(cfg, policy, qparams)
    rid = probe.add_request(PROMPTS[0], max_new_tokens=3, eos_id=-1)
    first = probe.run()[rid][0]

    sched = _mk(cfg, policy, qparams, fused_tick=4)
    rid = sched.add_request(PROMPTS[0], max_new_tokens=10, eos_id=first)
    out = sched.run()
    assert out[rid] == [first]


def test_fused_logprobs_match_stepwise(setup):
    cfg, policy, qparams = setup
    base = _mk(cfg, policy, qparams)
    r = base.add_request(PROMPTS[0], max_new_tokens=6, eos_id=-1, logprobs=True)
    want_toks = base.run()[r]
    want_lps = base.done_logprobs[r]

    sched = _mk(cfg, policy, qparams, fused_tick=4)
    r = sched.add_request(PROMPTS[0], max_new_tokens=6, eos_id=-1, logprobs=True)
    got_toks = sched.run()[r]
    got_lps = sched.done_logprobs[r]
    assert got_toks == want_toks
    np.testing.assert_allclose(got_lps, want_lps, rtol=1e-5, atol=1e-6)


def test_fused_mixed_sampling_falls_back(setup):
    """Slots with differing SamplingParams are not fusible; the scheduler
    must fall back to the per-token tick and still finish correctly."""
    cfg, policy, qparams = setup
    base = _mk(cfg, policy, qparams)
    r1 = base.add_request(PROMPTS[0], max_new_tokens=5, eos_id=-1)
    want = base.run()[r1]

    sched = _mk(cfg, policy, qparams, fused_tick=4)
    f1 = sched.add_request(PROMPTS[0], max_new_tokens=5, eos_id=-1)
    f2 = sched.add_request(
        PROMPTS[1], max_new_tokens=5, eos_id=-1,
        sampling=SamplingParams(greedy=False, temperature=0.8),
    )
    out = sched.run()
    assert out[f1] == want
    assert len(out[f2]) == 5


def test_fused_repetition_penalty_matches_stepwise(setup):
    cfg, policy, qparams = setup
    sp = SamplingParams(repetition_penalty=1.3)
    base = _mk(cfg, policy, qparams)
    r = base.add_request(PROMPTS[0], max_new_tokens=7, eos_id=-1, sampling=sp)
    want = base.run()[r]

    sched = _mk(cfg, policy, qparams, fused_tick=3)
    r = sched.add_request(PROMPTS[0], max_new_tokens=7, eos_id=-1, sampling=sp)
    assert sched.run()[r] == want


@pytest.fixture(scope="module")
def setup_mesh():
    """Bigger shapes: row-parallel scale rows (K/128) must divide by tp."""
    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=256,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32
    )
    return cfg, policy, qparams


def test_fused_under_mesh_matches_stepwise_mesh(setup_mesh):
    """tp=2 dp=2 dense: fused mesh tick == stepwise mesh tick (same
    compilation family: mesh-vs-mesh, per CLAUDE.md parity guidance)."""
    import jax

    from flexq_tpu.parallel.tp import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg, policy, qparams = setup_mesh
    mesh = make_mesh(tp=2, dp=2)
    want = _run(_mk(cfg, policy, qparams, mesh=mesh))
    got = _run(_mk(cfg, policy, qparams, mesh=mesh, fused_tick=4))
    assert got == want


def test_fused_under_mesh_paged(setup_mesh):
    import jax

    from flexq_tpu.parallel.tp import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    cfg, policy, qparams = setup_mesh
    mesh = make_mesh(tp=2, dp=1)
    want = _run(_mk(cfg, policy, qparams, mesh=mesh, paged=True,
                    kv_dtype=jnp.int8))
    got = _run(_mk(cfg, policy, qparams, mesh=mesh, paged=True,
                   kv_dtype=jnp.int8, fused_tick=3))
    assert got == want


def test_fused_adaptive_k_with_queue(setup):
    """With a request queued, the fused tick shortens (K→4) so the queue
    admits sooner — token streams must still match the stepwise path."""
    cfg, policy, qparams = setup
    want = _run(_mk(cfg, policy, qparams))
    got = _run(_mk(cfg, policy, qparams, fused_tick=16))
    assert got == want
