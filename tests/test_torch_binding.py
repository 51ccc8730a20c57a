"""Torch-facing adapter (bindings/torch_adapter.py) — th_op-parity surface.

Checks that torch tensors round-trip the boundary and that the adapter's
forward/generate are byte-identical to calling the underlying JAX paths
directly (the adapter must add conversion, not computation)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flexq_tpu.bindings import FlexQCausalLM, to_jax, to_torch
from flexq_tpu.config import QuantPolicy
from flexq_tpu.models.quantized import forward_serve


@pytest.fixture(scope="module")
def wrapped():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=128,  # packing needs K % 128 == 0
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,  # GQA variant
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    policy = QuantPolicy.llama_flex()
    m = FlexQCausalLM.from_hf(
        model, policy, max_seq_len=64, dtype=jnp.float32,
        kv_dtype=jnp.float32,
    )
    return model, m


def test_tensor_round_trip():
    t = torch.arange(12, dtype=torch.int64).reshape(3, 4)
    x = to_jax(t, jnp.int32)
    assert x.dtype == jnp.int32 and x.shape == (3, 4)
    back = to_torch(x)
    assert torch.equal(back.long(), t)
    # bf16 upcasts to f32 (torch cannot view jax bf16 buffers)
    f = to_torch(jnp.ones((2, 2), jnp.bfloat16))
    assert f.dtype == torch.float32
    # torch bf16 in: bit-exact reinterpret (HF checkpoints default to bf16)
    tb = torch.tensor([[1.5, -2.25], [0.125, 3.0]], dtype=torch.bfloat16)
    xb = to_jax(tb)
    assert xb.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(xb.astype(jnp.float32)), tb.float().numpy()
    )


def test_forward_matches_forward_serve(wrapped):
    model, m = wrapped
    ids = np.random.default_rng(0).integers(0, 128, (2, 9))
    got = m(torch.tensor(ids))
    assert isinstance(got, torch.Tensor) and got.shape == (2, 9, 128)

    # jit the direct call too: same program => bit-identical (an eager call
    # can fuse differently — see CLAUDE.md compiled-vs-eager notes)
    import jax

    direct = jax.jit(
        lambda p, i: forward_serve(p, m.cfg, m.policy, i, prefill_bf16=True)[0]
    )(m.engine.params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_array_equal(got.numpy(), np.asarray(direct, np.float32))


def test_generate_matches_engine(wrapped):
    model, m = wrapped
    ids = torch.tensor([[5, 17, 3, 99], [1, 2, 3, 4]], dtype=torch.int64)
    out = m.generate(ids, max_new_tokens=6, eos_token_id=None)
    assert out.shape == (2, 4 + 6) and out.dtype == torch.int64
    # prompt is echoed (HF convention)
    assert torch.equal(out[:, :4], ids)

    direct = m.engine.generate(
        np.asarray(ids.numpy(), np.int32), max_new_tokens=6, eos_id=-1
    )
    np.testing.assert_array_equal(out[:, 4:].numpy(), np.asarray(direct))


def test_generate_sampling_reproducible(wrapped):
    _, m = wrapped
    ids = torch.tensor([[5, 17, 3, 99]], dtype=torch.int64)
    a = m.generate(ids, max_new_tokens=5, do_sample=True, temperature=0.8,
                   top_k=20, seed=7, eos_token_id=None)
    b = m.generate(ids, max_new_tokens=5, do_sample=True, temperature=0.8,
                   top_k=20, seed=7, eos_token_id=None)
    assert torch.equal(a, b)
