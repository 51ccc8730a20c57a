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


def test_paged_scheduler_matches_dense(setup):
    """Paged continuous batching == dense-cache continuous batching."""
    cfg, policy, qparams = setup
    dense = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.float32)
    r1 = dense.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1)
    r2 = dense.add_request([2, 4, 8, 3], max_new_tokens=6, eos_id=-1)
    want = dense.run()

    paged = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.float32, paged=True, page_size=128)
    p1 = paged.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1)
    p2 = paged.add_request([2, 4, 8, 3], max_new_tokens=6, eos_id=-1)
    got = paged.run()
    assert got[p1] == want[r1] and got[p2] == want[r2], (got, want)
    # all non-garbage pages recycled after completion
    assert paged.pool.free_pages == paged.pool.num_pages - 1


def test_paged_pool_allocator():
    from flexq_tpu.serve.paged import PagePool, PageTable

    pool = PagePool(2, 8, 2, 128, 64, dtype=jnp.float32)
    a = pool.alloc(3)
    assert len(set(a)) == 3 and pool.free_pages == 5
    pool.free(a[:2])
    assert pool.free_pages == 7
    assert pool.pages_for(1) == 1 and pool.pages_for(128) == 1
    assert pool.pages_for(129) == 2
    import pytest as _pytest

    with _pytest.raises(MemoryError):
        pool.alloc(100)

    t = PageTable(2, 4)
    t.assign(0, [3, 5])
    t.append(0, 7)
    assert list(t.table[0, :3]) == [3, 5, 7] and t.num_blocks[0] == 3
    assert t.release(0) == [3, 5, 7] and t.num_blocks[0] == 0


def test_int8_scheduler_dense_and_paged(setup):
    """int8 quantized KV works under the scheduler, dense == paged."""
    cfg, policy, qparams = setup
    dense = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.int8)
    r1 = dense.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1)
    want = dense.run()
    paged = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.int8, paged=True, page_size=128)
    p1 = paged.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1)
    got = paged.run()
    assert got[p1] == want[r1], (got, want)
    assert paged.pool.free_pages == paged.pool.num_pages - 1


def test_chunked_prefill_admission_matches_unchunked(setup):
    """prefill_chunk splits admission into per-tick chunks; outputs match."""
    cfg, policy, qparams = setup
    plain = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.float32)
    prompt = [3, 14, 15, 9, 2, 6, 5, 35, 8, 97]
    r = plain.add_request(prompt, max_new_tokens=5, eos_id=-1)
    want = plain.run()[r]

    chunked = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                             kv_dtype=jnp.float32, prefill_chunk=4)
    c = chunked.add_request(prompt, max_new_tokens=5, eos_id=-1)
    # bucket = 12 -> 3 chunk ticks before any token appears
    for _ in range(3):
        assert not chunked.step()
        assert chunked.slots[0].phase == "prefill" or chunked.slots[0].generated
    got = chunked.run()[c]
    assert got == want


def test_chunked_admission_does_not_stall_decoding_slot(setup):
    """A decoding slot keeps emitting tokens while a long prompt admits."""
    cfg, policy, qparams = setup
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.float32, prefill_chunk=4)
    r1 = sched.add_request([7, 7], max_new_tokens=8, eos_id=-1)
    done = {}
    done.update(sched.step())  # r1 admitted (short, one-shot) + 1 decode tick
    n_before = len(sched.slots[0].generated)
    long_prompt = list(range(2, 14))  # 12 tokens, 3 chunks
    r2 = sched.add_request(long_prompt, max_new_tokens=4, eos_id=-1)
    sched.step()  # chunk 1 + decode tick for r1
    assert sched.slots[1].phase == "prefill"
    assert len(sched.slots[0].generated) == n_before + 1  # r1 advanced
    while sched.has_work:
        done.update(sched.step())

    plain = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.float32)
    p1 = plain.add_request([7, 7], max_new_tokens=8, eos_id=-1)
    p2 = plain.add_request(long_prompt, max_new_tokens=4, eos_id=-1)
    want = plain.run()
    assert done[r1] == want[p1]
    assert done[r2] == want[p2]


def test_chunked_prefill_paged_and_int8(setup):
    """Chunked admission under the paged pool and the int8 cache."""
    cfg, policy, qparams = setup
    prompt = list(range(3, 12))
    for kv_dtype, paged in ((jnp.float32, True), (jnp.int8, False)):
        plain = BatchScheduler(qparams, cfg, policy, num_slots=2,
                               max_seq_len=256, kv_dtype=kv_dtype, paged=paged)
        r = plain.add_request(prompt, max_new_tokens=4, eos_id=-1)
        want = plain.run()[r]
        chunked = BatchScheduler(qparams, cfg, policy, num_slots=2,
                                 max_seq_len=256, kv_dtype=kv_dtype,
                                 paged=paged, prefill_chunk=4)
        c = chunked.add_request(prompt, max_new_tokens=4, eos_id=-1)
        got = chunked.run()[c]
        assert got == want, (kv_dtype, paged, got, want)
        if paged:
            assert chunked.pool.free_pages == chunked.pool.num_pages - 1


def test_preemption_under_pool_exhaustion(setup):
    """When the page pool runs dry mid-decode, the youngest request is
    preempted (pages freed, recompute-requeued) instead of crashing, and
    every request still produces exactly the tokens of an uncontended run."""
    cfg, policy, qparams = setup
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, 256, 120).tolist()
    p2 = rng.integers(0, 256, 120).tolist()

    big = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                         kv_dtype=jnp.float32, paged=True, page_size=128)
    r1 = big.add_request(p1, max_new_tokens=20, eos_id=-1)
    r2 = big.add_request(p2, max_new_tokens=20, eos_id=-1)
    want = big.run()

    # 3 usable pages (+1 garbage): both admit with 1 page each, but both
    # crossing position 128 needs 4 — one of them must be preempted
    small = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                           kv_dtype=jnp.float32, paged=True, page_size=128,
                           num_pages=4)
    s1 = small.add_request(p1, max_new_tokens=20, eos_id=-1)
    s2 = small.add_request(p2, max_new_tokens=20, eos_id=-1)
    got = small.run()
    assert got[s1] == want[r1]
    assert got[s2] == want[r2]
    assert len(got[s2]) == 20


def test_preempted_request_not_starved(setup):
    """A preempted request whose prompt grew by its generated tokens must
    still fit the admission check (charge only the REMAINING budget) —
    the old check demanded pages for prompt+generated+max_new and could
    stall the scheduler forever."""
    cfg, policy, qparams = setup
    rng = np.random.default_rng(5)
    # 7 usable pages = 896 tokens; A:(250 prompt + 500 new) needs 6 pages,
    # B small; B admitted second, pool runs dry mid-decode, someone is
    # preempted with a grown prompt — must still re-admit and finish
    pa = rng.integers(0, 256, 250).tolist()
    pb = rng.integers(0, 256, 8).tolist()
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=1024,
                           kv_dtype=jnp.float32, paged=True, page_size=128,
                           num_pages=8)
    ra = sched.add_request(pa, max_new_tokens=500, eos_id=-1)
    rb = sched.add_request(pb, max_new_tokens=500, eos_id=-1)
    out = {}
    for _ in range(3000):
        out.update(sched.step())
        if ra in out and rb in out:
            break
    assert ra in out and rb in out, "scheduler stalled (starved request)"
    assert len(out[ra]) == 500 and len(out[rb]) == 500


def test_max_prefilling_cap(setup):
    """Bounded in-flight chunked prefills: the third long prompt waits for
    a scratch to drain; outputs still match the uncapped scheduler."""
    cfg, policy, qparams = setup
    import numpy as np
    prompts = [
        [int(x) for x in np.random.default_rng(s).integers(0, 256, 12)]
        for s in range(3)
    ]

    def run(**kw):
        sched = BatchScheduler(qparams, cfg, policy, num_slots=3,
                               max_seq_len=64, kv_dtype=jnp.float32,
                               prefill_chunk=4, **kw)
        rids = [sched.add_request(p, max_new_tokens=4, eos_id=-1)
                for p in prompts]
        out = sched.run()
        return [out[r] for r in rids]

    want = run()
    got = run(max_prefilling=1)
    assert got == want


def test_max_prefilling_cap_prefix_cache(setup):
    """Cap + prefix cache: a turned-away request must release its acquired
    prefix pages (registry refcounts stay balanced)."""
    cfg, policy, qparams = setup
    import numpy as np
    base = [int(x) for x in np.random.default_rng(7).integers(0, 256, 256)]
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2,
                           max_seq_len=1024, kv_dtype=jnp.float32,
                           paged=True, page_size=128, prefix_cache=True,
                           max_prefilling=1)
    r1 = sched.add_request(base + [1, 2], max_new_tokens=3, eos_id=-1)
    out = sched.run()
    assert len(out[r1]) == 3
    # same prefix arrives twice concurrently: second is turned away once
    # (cap), re-admitted later with the prefix pages reacquired
    r2 = sched.add_request(base + [3, 4], max_new_tokens=3, eos_id=-1)
    r3 = sched.add_request(base + [5, 6], max_new_tokens=3, eos_id=-1)
    out = sched.run()
    assert len(out[r2]) == 3 and len(out[r3]) == 3
    # every page accounted for: free + retained-in-registry == total - garbage
    assert (sched.pool.free_pages + len(sched.registry.retained)
            == sched.pool.num_pages - 1 - sum(
                sched.registry.rc[p] > 0 for p in sched.registry.rc))
