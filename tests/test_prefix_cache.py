"""Automatic prefix caching (paged scheduler): content-addressed prompt
pages are reused across requests — outputs must be bit-identical to the
no-reuse scheduler, pages must actually be shared, and retained pages must
evict cleanly under pool pressure.

The reference has no KV reuse of any kind (its cache is a per-batch dense
buffer, Llama.cc:112-115); this exceeds parity.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve.paged import PrefixRegistry
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
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32
    )
    return cfg, policy, qparams


def _prompts():
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, 256).tolist()  # exactly 2 pages of shared prefix
    return base + [1, 2, 3], base + [9, 8]


def test_registry_unit():
    reg = PrefixRegistry()
    toks = list(range(300))
    hs = reg.hash_chain(toks, 128)
    assert len(hs) == 2  # only full pages hash
    assert reg.match(hs) == []
    assert reg.register(hs[0], 7) and reg.register(hs[1], 9)
    assert not reg.register(hs[0], 11)  # duplicate publish loses the race
    assert reg.match(hs) == [7, 9]
    # chain property: same second page tokens after a different first page
    # must NOT match
    other = list(range(1, 301))
    assert reg.match(reg.hash_chain(other, 128)) == []
    reg.acquire([7, 9])
    assert reg.release([7, 9, 3]) == [3]  # unregistered page frees now
    assert reg.reclaimable == 0  # rc: register(1) + acquire(1) - release(1)
    assert reg.release([7, 9]) == []
    assert reg.reclaimable == 2
    assert reg.evict(1) == [7]  # LRU order
    assert reg.match(hs) == []  # chain broken at page 0


def test_prefix_reuse_matches_no_reuse(setup):
    cfg, policy, qparams = setup
    p1, p2 = _prompts()

    plain = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                           kv_dtype=jnp.float32, paged=True, page_size=128)
    r1 = plain.add_request(p1, max_new_tokens=4, eos_id=-1)
    r2 = plain.add_request(p2, max_new_tokens=4, eos_id=-1)
    want = plain.run()

    pc = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                        kv_dtype=jnp.float32, paged=True, page_size=128,
                        prefix_cache=True)
    q1 = pc.add_request(p1, max_new_tokens=4, eos_id=-1)
    q2 = pc.add_request(p2, max_new_tokens=4, eos_id=-1)
    got = pc.run()
    assert got[q1] == want[r1]
    assert got[q2] == want[r2]
    # the second request reused both full prefix pages
    assert pc.registry.hits >= 2
    # prefix pages are retained (reclaimable), not freed
    assert pc.registry.reclaimable >= 2


def test_prefix_pages_physically_shared(setup):
    cfg, policy, qparams = setup
    p1, p2 = _prompts()
    pc = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=512,
                        kv_dtype=jnp.float32, paged=True, page_size=128,
                        prefix_cache=True)
    q1 = pc.add_request(p1, max_new_tokens=3, eos_id=-1)
    done = {}
    while q1 not in done:
        done.update(pc.step())
    q2 = pc.add_request(p2, max_new_tokens=3, eos_id=-1)
    # after q2's admission, its table must start with the SAME page ids q1
    # published (retained after q1 finished)
    while pc.slots[0].req_id is None and pc.has_work:
        done.update(pc.step())
    tbl = pc.ptable.table[0, :2].tolist()
    assert sorted(pc.registry.by_hash.values())[:2] == sorted(tbl)
    while pc.has_work:
        done.update(pc.step())
    assert len(done[q2]) == 3


def test_eviction_under_pool_pressure(setup):
    """A pool too small to retain everything must evict LRU prefix pages
    instead of dying with MemoryError."""
    cfg, policy, qparams = setup
    rng = np.random.default_rng(7)
    # fully distinct prompts: every request registers fresh pages, so the
    # pool can only survive by evicting earlier requests' retained pages
    prompts = [rng.integers(0, 256, 257).tolist() for _ in range(3)]
    # each request needs ceil(259/128)=3 pages (+1 garbage); pool of 7 can
    # never hold all 3 requests' retained pages at once
    pc = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                        kv_dtype=jnp.float32, paged=True, page_size=128,
                        num_pages=7, prefix_cache=True)
    rids = [pc.add_request(p, max_new_tokens=3, eos_id=-1) for p in prompts]
    out = pc.run()
    assert all(len(out[r]) == 3 for r in rids)


def test_prefix_cache_int8_pool(setup):
    cfg, policy, qparams = setup
    p1, p2 = _prompts()
    plain = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                           kv_dtype=jnp.int8, paged=True, page_size=128)
    r1 = plain.add_request(p1, max_new_tokens=3, eos_id=-1)
    r2 = plain.add_request(p2, max_new_tokens=3, eos_id=-1)
    want = plain.run()

    pc = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                        kv_dtype=jnp.int8, paged=True, page_size=128,
                        prefix_cache=True)
    q1 = pc.add_request(p1, max_new_tokens=3, eos_id=-1)
    q2 = pc.add_request(p2, max_new_tokens=3, eos_id=-1)
    got = pc.run()
    assert got[q1] == want[r1] and got[q2] == want[r2]
    assert pc.registry.hits >= 2


def test_multi_turn_response_pages_reused(setup):
    """Turn 2's prompt includes turn 1's response: pages filled during
    DECODE must be published at completion and reused (the real-world
    multi-turn chat pattern)."""
    cfg, policy, qparams = setup
    rng = np.random.default_rng(21)
    p1 = rng.integers(0, 256, 130).tolist()

    pc = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                        kv_dtype=jnp.float32, paged=True, page_size=128,
                        prefix_cache=True)
    r1 = pc.add_request(p1, max_new_tokens=130, eos_id=-1)
    done = {}
    while r1 not in done:
        done.update(pc.step())
    gen1 = done[r1]
    assert len(gen1) == 130
    # turn 2: the whole first conversation + a new user message
    p2 = p1 + gen1 + rng.integers(0, 256, 5).tolist()  # 265 tokens, 2 full pages
    hits_before = pc.registry.hits
    r2 = pc.add_request(p2, max_new_tokens=4, eos_id=-1)
    while pc.has_work:
        done.update(pc.step())
    assert len(done[r2]) == 4
    # both full pages of turn 1 (incl. the decode-written one) were reused
    assert pc.registry.hits - hits_before >= 2

    # correctness: a fresh scheduler (no reuse possible) gives identical tokens
    fresh = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=512,
                           kv_dtype=jnp.float32, paged=True, page_size=128,
                           prefix_cache=True)
    f2 = fresh.add_request(p2, max_new_tokens=4, eos_id=-1)
    want = fresh.run()[f2]
    assert done[r2] == want


def test_page_granular_reuse_with_larger_chunks(setup):
    """Reuse is page-granular even when prefill_chunk spans multiple pages:
    a 3-page shared prefix under chunk=256 must reuse all 3 pages (the old
    chunk-aligned clamp kept only 2)."""
    cfg, policy, qparams = setup
    rng = np.random.default_rng(33)
    base = rng.integers(0, 256, 384).tolist()  # 3 full pages
    p1 = base + rng.integers(0, 256, 6).tolist()
    p2 = base + rng.integers(0, 256, 5).tolist()

    plain = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=1024,
                           kv_dtype=jnp.float32, paged=True, page_size=128,
                           prefill_chunk=256)
    r1 = plain.add_request(p1, max_new_tokens=3, eos_id=-1)
    r2 = plain.add_request(p2, max_new_tokens=3, eos_id=-1)
    want = plain.run()

    pc = BatchScheduler(qparams, cfg, policy, num_slots=1, max_seq_len=1024,
                        kv_dtype=jnp.float32, paged=True, page_size=128,
                        prefill_chunk=256, prefix_cache=True)
    q1 = pc.add_request(p1, max_new_tokens=3, eos_id=-1)
    q2 = pc.add_request(p2, max_new_tokens=3, eos_id=-1)
    got = pc.run()
    assert got[q1] == want[r1]
    assert got[q2] == want[r2]
    assert pc.registry.hits == 3  # ALL full prefix pages, not chunk-floored
