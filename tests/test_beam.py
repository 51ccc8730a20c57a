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


def test_scheduler_beam_matches_standalone(setup):
    """In-scheduler beam search (k slots + KV row reorder) must generate
    exactly what standalone beam_search does (same model, greedy beam)."""
    from flexq_tpu.serve.beam import beam_search_nbest
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    prompt = [1, 5, 9, 2]
    k = 3
    want = beam_search_nbest(
        eng, [prompt],
        BeamParams(beam_width=k, length_penalty=1.0, max_new_tokens=6),
        eos_id=2, n_best=k,
    )[0]

    sched = BatchScheduler(qparams, cfg, policy, num_slots=4, max_seq_len=32,
                           kv_dtype=jnp.float32)
    rid = sched.add_request(prompt, max_new_tokens=6, eos_id=2,
                            beam_width=k, n_best=k, length_penalty=1.0)
    out = sched.run()
    assert out[rid] == want[0][0], (out[rid], want)
    got_nbest = sched.done_nbest[rid]
    assert [t for t, _, _ in got_nbest] == [t for t, _ in want]
    for (_, s_got, _), (_, s_want) in zip(got_nbest, want):
        assert abs(s_got - s_want) < 1e-4


def test_scheduler_beam_with_concurrent_regular_request(setup):
    """A beam group and an independent greedy request decode in the same
    batched steps without perturbing each other."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    # references, each alone
    solo = BatchScheduler(qparams, cfg, policy, num_slots=4, max_seq_len=32,
                          kv_dtype=jnp.float32)
    rb = solo.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1, beam_width=2)
    rg = solo.add_request([7, 3], max_new_tokens=4, eos_id=-1)
    want = solo.run()

    both = BatchScheduler(qparams, cfg, policy, num_slots=3, max_seq_len=32,
                          kv_dtype=jnp.float32)
    b1 = both.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1, beam_width=2)
    b2 = both.add_request([7, 3], max_new_tokens=4, eos_id=-1)
    got = both.run()
    assert got[b1] == want[rb]
    assert got[b2] == want[rg]


def test_scheduler_beam_queues_when_slots_short(setup):
    """FIFO: a beam request wider than the free slots waits, then admits."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    sched = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=32,
                           kv_dtype=jnp.float32)
    r1 = sched.add_request([7, 3], max_new_tokens=3, eos_id=-1)
    rb = sched.add_request([1, 5, 9], max_new_tokens=4, eos_id=-1, beam_width=2)
    out = sched.run()
    assert len(out[r1]) == 3
    assert len(out[rb]) == 4


def test_http_best_of_beam(setup):
    """/v1/completions with best_of>n serves via the beam path; /generate
    beam_width returns the ranked n-best."""
    import json
    import urllib.request

    from flexq_tpu.serve.http import serve_background
    from flexq_tpu.serve.scheduler import BatchScheduler
    from flexq_tpu.serve.beam import beam_search_nbest

    cfg, policy, qparams, eng = setup
    sched = BatchScheduler(qparams, cfg, policy, num_slots=4, max_seq_len=32,
                           kv_dtype=jnp.float32)
    server, service, port = serve_background(sched)

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    try:
        want = beam_search_nbest(
            eng, [[1, 5, 9]],
            BeamParams(beam_width=3, length_penalty=1.0, max_new_tokens=5),
            eos_id=-1, n_best=2,
        )[0]
        r = post("/v1/completions",
                 {"prompt": [1, 5, 9], "max_tokens": 5, "eos_id": -1,
                  "n": 2, "best_of": 3})
        assert len(r["choices"]) == 2
        assert r["choices"][0]["token_ids"] == want[0][0]
        assert r["choices"][1]["token_ids"] == want[1][0]
        assert r["choices"][0]["beam_score"] >= r["choices"][1]["beam_score"]
        assert r["usage"]["prompt_tokens"] == 3

        g = post("/generate",
                 {"prompt_ids": [1, 5, 9], "max_new_tokens": 5, "eos_id": -1,
                  "beam_width": 3, "n_best": 2})
        assert g["tokens"] == want[0][0]
        assert [h["tokens"] for h in g["nbest"]] == [t for t, _ in want]
    finally:
        service.shutdown()
        server.shutdown()


def test_scheduler_beam_paged_matches_dense(setup):
    """Paged beam (page-table reorder + copy-on-divergence of the current
    block) must produce exactly the dense beam's hypotheses, and return
    every page to the pool when the group finishes."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    prompt = [1, 5, 9, 2]
    dense = BatchScheduler(qparams, cfg, policy, num_slots=4, max_seq_len=256,
                           kv_dtype=jnp.float32)
    rd = dense.add_request(prompt, max_new_tokens=6, eos_id=2,
                           beam_width=3, n_best=3)
    want = dense.run()[rd]
    want_nbest = dense.done_nbest[rd]

    paged = BatchScheduler(qparams, cfg, policy, num_slots=4, max_seq_len=256,
                           kv_dtype=jnp.float32, paged=True, page_size=128)
    rp = paged.add_request(prompt, max_new_tokens=6, eos_id=2,
                          beam_width=3, n_best=3)
    got = paged.run()[rp]
    assert got == want
    assert [t for t, _, _ in paged.done_nbest[rp]] == [t for t, _, _ in want_nbest]
    for (_, sg, _), (_, sw, _) in zip(paged.done_nbest[rp], want_nbest):
        assert abs(sg - sw) < 1e-4
    assert paged.pool.free_pages == paged.pool.num_pages - 1


def test_scheduler_beam_paged_page_divergence(setup):
    """Long enough generation to cross a page boundary mid-beam: shared
    prompt pages + per-beam private tails must stay consistent (page_size
    128 with prompt 126 puts the first decode writes inside the shared
    page, exercising copy-on-divergence immediately)."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    prompt = [(i * 7) % 250 for i in range(126)]
    dense = BatchScheduler(qparams, cfg, policy, num_slots=3, max_seq_len=256,
                           kv_dtype=jnp.float32)
    rd = dense.add_request(prompt, max_new_tokens=8, eos_id=-1, beam_width=2)
    want = dense.run()[rd]

    paged = BatchScheduler(qparams, cfg, policy, num_slots=3, max_seq_len=256,
                           kv_dtype=jnp.float32, paged=True, page_size=128)
    rp = paged.add_request(prompt, max_new_tokens=8, eos_id=-1, beam_width=2)
    got = paged.run()[rp]
    assert got == want
    assert paged.pool.free_pages == paged.pool.num_pages - 1


def test_scheduler_beam_paged_int8_kv(setup):
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    prompt = [1, 5, 9, 2]
    dense = BatchScheduler(qparams, cfg, policy, num_slots=3, max_seq_len=256,
                           kv_dtype=jnp.int8)
    rd = dense.add_request(prompt, max_new_tokens=6, eos_id=-1, beam_width=2)
    want = dense.run()[rd]
    paged = BatchScheduler(qparams, cfg, policy, num_slots=3, max_seq_len=256,
                           kv_dtype=jnp.int8, paged=True, page_size=128)
    rp = paged.add_request(prompt, max_new_tokens=6, eos_id=-1, beam_width=2)
    assert paged.run()[rp] == want
    assert paged.pool.free_pages == paged.pool.num_pages - 1


def test_beam_logprobs(setup):
    """Beam + logprobs: per-token logprobs of the winning hypothesis must
    sum to its raw joint log-probability (verified against sequential
    full-forward scoring)."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    prompt = [1, 5, 9]
    sched = BatchScheduler(qparams, cfg, policy, num_slots=3, max_seq_len=32,
                           kv_dtype=jnp.float32)
    rid = sched.add_request(prompt, max_new_tokens=5, eos_id=-1,
                            beam_width=2, n_best=2, logprobs=True)
    toks = sched.run()[rid]
    lps = sched.done_logprobs[rid]
    assert len(lps) == len(toks)
    want = _seq_logprob(qparams, cfg, policy, prompt, toks)
    assert abs(sum(lps) - want) < 1e-3
    # n-best entries carry their own aligned logprob lists
    for t, _, l in sched.done_nbest[rid]:
        assert l is not None and len(l) == len(t)


def test_http_beam_on_paged_prefix_server(setup):
    """best_of on the README-recommended --paged --prefix-cache server must
    serve (this was an uncaught-AssertionError 500 in round 2)."""
    import json
    import urllib.request

    from flexq_tpu.serve.http import serve_background
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams, eng = setup
    sched = BatchScheduler(qparams, cfg, policy, num_slots=4, max_seq_len=256,
                           kv_dtype=jnp.float32, paged=True, page_size=128,
                           prefix_cache=True)
    server, service, port = serve_background(sched)

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    try:
        r = post("/v1/completions",
                 {"prompt": [1, 5, 9], "max_tokens": 5, "eos_id": -1,
                  "n": 2, "best_of": 3, "logprobs": 1})
        assert len(r["choices"]) == 2
        assert r["choices"][0]["beam_score"] >= r["choices"][1]["beam_score"]
        assert len(r["choices"][0]["logprobs"]["token_logprobs"]) == \
            len(r["choices"][0]["token_ids"])
        # oversized beam now a clean 400, not an uncaught 500
        import urllib.error
        try:
            post("/v1/completions",
                 {"prompt": [1, 5, 9], "max_tokens": 5, "best_of": 64})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        service.shutdown()
        server.shutdown()


def test_scheduler_beam_under_mesh():
    """Dense beam group on a tp=2 mesh matches the single-mesh... rather:
    mesh beam == same-mesh non-beam invariants; exact target: beam on the
    tp=2 mesh matches beam on tp=1 run under the SAME compilation family
    is not guaranteed (near-tie argmax, CLAUDE.md) — so compare tp=2 vs
    tp=2 determinism plus hypothesis-count/score ordering."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from flexq_tpu.parallel.tp import make_mesh
    from flexq_tpu.serve.scheduler import BatchScheduler

    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    mcfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), mcfg, policy, dtype=jnp.float32
    )
    mesh = make_mesh(tp=2, dp=1)

    def run_once():
        sched = BatchScheduler(qparams, mcfg, policy, num_slots=3,
                               max_seq_len=64, kv_dtype=jnp.float32, mesh=mesh)
        rid = sched.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1,
                                beam_width=2, n_best=2)
        out = sched.run()[rid]
        return out, sched.done_nbest[rid]

    out1, nb1 = run_once()
    out2, nb2 = run_once()
    assert out1 == out2
    assert [t for t, _, _ in nb1] == [t for t, _, _ in nb2]
    assert nb1[0][1] >= nb1[1][1]
    assert len(out1) == 5


def test_scheduler_beam_paged_under_mesh():
    """Paged beam (COW page reorder) on a tp=2 mesh: determinism + page
    accounting with the pool sharded on the kv-head axis."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from flexq_tpu.parallel.tp import make_mesh
    from flexq_tpu.serve.scheduler import BatchScheduler

    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    mcfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), mcfg, policy, dtype=jnp.float32
    )
    mesh = make_mesh(tp=2, dp=1)

    def run_once():
        sched = BatchScheduler(qparams, mcfg, policy, num_slots=3,
                               max_seq_len=256, kv_dtype=jnp.float32,
                               mesh=mesh, paged=True, page_size=128)
        rid = sched.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1,
                                beam_width=2, n_best=2)
        out = sched.run()[rid]
        return out, sched

    out1, s1 = run_once()
    out2, s2 = run_once()
    assert out1 == out2 and len(out1) == 5
    assert s1.pool.free_pages == s1.pool.num_pages - 1


def test_standalone_paged_nbest_matches_dense(setup):
    """beam_search_nbest_paged (scheduler-backed page-table beams) returns
    the same ranked hypotheses as the dense standalone API."""
    from flexq_tpu.serve.beam import beam_search_nbest, beam_search_nbest_paged

    cfg, policy, qparams, eng = setup
    prompt = [1, 5, 9, 2]
    bp = BeamParams(beam_width=3, length_penalty=1.0, max_new_tokens=6)
    want = beam_search_nbest(eng, [prompt], bp, eos_id=2, n_best=3)[0]
    got = beam_search_nbest_paged(
        qparams, cfg, policy, [prompt], bp, eos_id=2, n_best=3,
        kv_dtype=jnp.float32, page_size=128, max_seq_len=32,
    )[0]
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, sg), (_, sw) in zip(got, want):
        assert abs(sg - sw) < 1e-4


def test_standalone_paged_nbest_ragged_prompts(setup):
    """Ragged prompt lengths work (queued sequentially through the beam
    slots) — the dense API requires equal lengths."""
    from flexq_tpu.serve.beam import beam_search_nbest_paged

    cfg, policy, qparams, _ = setup
    bp = BeamParams(beam_width=2, max_new_tokens=4)
    out = beam_search_nbest_paged(
        qparams, cfg, policy, [[1, 5, 9], [3, 3, 7, 11, 2, 6]], bp,
        eos_id=2, n_best=2, kv_dtype=jnp.float32, page_size=128, max_seq_len=32,
    )
    assert len(out) == 2
    for row in out:
        assert 1 <= len(row) <= 2
        assert all(isinstance(t, list) and len(t) >= 1 for t, _ in row)
        # ranked best-first
        assert all(row[i][1] >= row[i + 1][1] for i in range(len(row) - 1))
