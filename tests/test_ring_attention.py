"""Ring attention (sequence/context parallelism) vs single-device reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flexq_tpu.parallel.cp import forward_sp, make_sp_mesh, ring_attention


def _dev_count():
    return len(jax.devices())


@pytest.mark.parametrize("kv_groups", [1, 2])
def test_ring_attention_matches_core(kv_groups):
    from flexq_tpu.models.llama import attention_core, causal_mask

    if _dev_count() < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(0)
    b, l, h, d = 2, 32, 4, 16
    kvh = h // kv_groups
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, kvh, d)), jnp.float32)
    want = np.asarray(attention_core(q, k, v, causal_mask(l, l), kv_groups))

    mesh = make_sp_mesh(sp=4)
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq", kv_groups),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    got = np.asarray(fn(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_forward_sp_matches_dense():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.models import config_from_hf, from_hf_llama
    from flexq_tpu.models.llama import forward

    if _dev_count() < 4:
        pytest.skip("needs 4 virtual devices")
    torch.manual_seed(0)
    hf = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(hf).eval()
    cfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    want = np.asarray(forward(params, cfg, ids))
    mesh = make_sp_mesh(sp=4)
    got = np.asarray(forward_sp(params, cfg, ids, mesh))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
