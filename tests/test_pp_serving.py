"""Pipeline-parallel SERVING: Engine.generate over a pipe mesh must match
single-device generation (reference pipeline_para through the full engine,
Llama.cc:970-1240 / ParallelGptDecoder.cc:382-524 — FT serves with pp>1;
round 2's PP was forward-function-level only)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve import Engine


@pytest.fixture(scope="module")
def llama():
    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32
    )
    return cfg, policy, qparams


def _pp_mesh(pp=2):
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} virtual devices")
    from flexq_tpu.parallel.pp import make_pipe_mesh

    return make_pipe_mesh(pp=pp)


def test_engine_generate_pp_matches_single_device(llama):
    cfg, policy, qparams = llama
    mesh = _pp_mesh(2)
    sd = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    want = sd.generate([[1, 5, 9, 2]], max_new_tokens=6, eos_id=-1, mode="step")

    pp = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                pp_mesh=mesh)
    got = pp.generate([[1, 5, 9, 2]], max_new_tokens=6, eos_id=-1)
    assert got == want, (got, want)


def test_engine_generate_pp_int8_kv(llama):
    """int8 KV cache (values + per-token scales) under the pipe mesh."""
    cfg, policy, qparams = llama
    mesh = _pp_mesh(2)
    sd = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.int8)
    want = sd.generate([[1, 5, 9, 2], [7, 7, 3, 1]], max_new_tokens=5,
                       eos_id=-1, mode="step")
    pp = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.int8,
                pp_mesh=mesh)
    got = pp.generate([[1, 5, 9, 2], [7, 7, 3, 1]], max_new_tokens=5, eos_id=-1)
    assert got == want, (got, want)


def test_engine_generate_pp4():
    """pp=4 with a 4-layer model: one layer per stage."""
    torch.manual_seed(1)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(
        from_hf_llama(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32
    )
    mesh = _pp_mesh(4)
    sd = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    want = sd.generate([[1, 5, 9]], max_new_tokens=4, eos_id=-1, mode="step")
    pp = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                pp_mesh=mesh)
    got = pp.generate([[1, 5, 9]], max_new_tokens=4, eos_id=-1)
    assert got == want


def test_engine_generate_pp_chunked_prefill(llama):
    cfg, policy, qparams = llama
    mesh = _pp_mesh(2)
    prompt = [int(x) for x in np.random.default_rng(0).integers(0, 256, 12)]
    sd = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                prefill_chunk=4)
    want = sd.generate([prompt], max_new_tokens=4, eos_id=-1, mode="step")
    pp = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                pp_mesh=mesh, prefill_chunk=4)
    got = pp.generate([prompt], max_new_tokens=4, eos_id=-1)
    assert got == want


def test_engine_generate_pp_opt():
    """OPT under PP (reference ParallelGptDecoder pp serving parity)."""
    from transformers import OPTConfig, OPTForCausalLM

    from flexq_tpu.models import from_hf_opt

    mesh = _pp_mesh(2)
    torch.manual_seed(0)
    hf = OPTConfig(
        vocab_size=256, hidden_size=256, ffn_dim=512, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, tie_word_embeddings=False,
    )
    m = OPTForCausalLM(hf).eval()
    cfg = config_from_hf(m.config)
    policy = QuantPolicy.opt_flex(wbits=8, abits=8)
    qparams = quantize_params(
        from_hf_opt(m, dtype=jnp.float32), cfg, policy, dtype=jnp.float32
    )
    sd = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    want = sd.generate([[1, 5, 9, 2]], max_new_tokens=5, eos_id=-1, mode="step")
    pp = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                pp_mesh=mesh)
    got = pp.generate([[1, 5, 9, 2]], max_new_tokens=5, eos_id=-1)
    assert got == want, (got, want)


def test_pp_sampling_and_logprobs(llama):
    """Stochastic sampling + logprobs run under PP (same key sequence as
    the single-device stepwise loop => identical draws)."""
    from flexq_tpu.serve import SamplingParams

    cfg, policy, qparams = llama
    mesh = _pp_mesh(2)
    sp = SamplingParams(greedy=False, temperature=0.9, top_k=20)
    sd = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32)
    want, wlps = sd.generate([[1, 5, 9]], max_new_tokens=5, eos_id=-1,
                             sampling=sp, seed=7, return_logprobs=True,
                             mode="step")
    pp = Engine(qparams, cfg, policy, max_seq_len=32, kv_dtype=jnp.float32,
                pp_mesh=mesh)
    got, glps = pp.generate([[1, 5, 9]], max_new_tokens=5, eos_id=-1,
                            sampling=sp, seed=7, return_logprobs=True)
    assert got == want
    np.testing.assert_allclose(glps, wlps, rtol=1e-4, atol=1e-5)


def test_scheduler_pp_matches_single_device(llama):
    """Continuous batching over a pipe mesh: per-slot decode ticks through
    serve_step_pp must reproduce the single-device scheduler's streams."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams = llama
    mesh = _pp_mesh(2)
    prompts = [[3, 14, 15, 9], [7, 7], [100, 2, 30, 4]]
    budgets = [6, 4, 5]

    def run(**kw):
        sched = BatchScheduler(qparams, cfg, policy, num_slots=2,
                               max_seq_len=48, kv_dtype=jnp.float32, **kw)
        rids = [sched.add_request(p, max_new_tokens=n, eos_id=-1)
                for p, n in zip(prompts, budgets)]
        out = sched.run()
        return [out[r] for r in rids]

    want = run()
    got = run(pp_mesh=mesh)
    assert got == want, (got, want)


def test_scheduler_pp_int8_chunked(llama):
    from flexq_tpu.serve.scheduler import BatchScheduler

    cfg, policy, qparams = llama
    mesh = _pp_mesh(2)
    prompt = [int(x) for x in np.random.default_rng(1).integers(0, 256, 10)]

    def run(**kw):
        sched = BatchScheduler(qparams, cfg, policy, num_slots=2,
                               max_seq_len=48, kv_dtype=jnp.int8,
                               prefill_chunk=4, **kw)
        rid = sched.add_request(prompt, max_new_tokens=5, eos_id=-1,
                                logprobs=True)
        out = sched.run()
        return out[rid], sched.done_logprobs[rid]

    want, wlps = run()
    got, glps = run(pp_mesh=mesh)
    assert got == want
    np.testing.assert_allclose(glps, wlps, rtol=1e-4, atol=1e-5)
