"""Flash-decode attention kernel vs jnp golden model.

Mirrors the reference's decoder masked-MHA validation style (host reference
vs kernel launch, random inputs, tolerance asserts — e2e
tests/unittests/test_attention_kernels.cu) plus ragged per-sequence lengths,
GQA grouping, and the int8-cache scale folding that the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexq_tpu.kernels.flash_decode import flash_decode, flash_decode_ref


def _mk(rng, b, h, kvh, s, d, quant):
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    if quant:
        k = jnp.asarray(rng.integers(-127, 128, (b, kvh, s, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (b, kvh, s, d)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (b, kvh, s)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (b, kvh, s)), jnp.float32)
        return q, k, v, ks, vs
    k = jnp.asarray(rng.standard_normal((b, kvh, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, kvh, s, d)), jnp.bfloat16)
    return q, k, v, None, None


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize(
    "b,h,kvh,s,lens",
    [
        (1, 4, 4, 256, [256]),  # MHA, full cache
        (3, 8, 4, 512, [1, 200, 512]),  # GQA g=2, ragged lengths
        (2, 8, 2, 384, [130, 40]),  # GQA g=4, non-block-aligned lengths
    ],
)
def test_flash_decode_matches_golden(quant, b, h, kvh, s, lens):
    rng = np.random.default_rng(hash((quant, b, h, s)) % 2**32)
    d = 128
    q, k, v, ks, vs = _mk(rng, b, h, kvh, s, d, quant)
    lengths = jnp.asarray(lens, jnp.int32)
    out = flash_decode(q, k, v, lengths, ks, vs, block_s=128)
    ref = flash_decode_ref(q, k, v, lengths, ks, vs)
    # also exercise a partial head block (hb < KVH)
    out_hb = flash_decode(q, k, v, lengths, ks, vs, block_s=128, block_h=max(kvh // 2, 1))
    got = np.asarray(out, np.float32)
    want = np.asarray(ref, np.float32)
    scale = max(1.0, np.abs(want).max())
    assert np.max(np.abs(got - want)) / scale < 2e-2, (
        np.max(np.abs(got - want)),
        scale,
    )
    np.testing.assert_allclose(
        np.asarray(out_hb, np.float32), got, rtol=0, atol=1e-6
    )


def test_flash_decode_length_isolation():
    """Tokens past `length` must not influence the output at all."""
    rng = np.random.default_rng(7)
    b, h, kvh, s, d = 1, 4, 4, 256, 128
    q, k, v, ks, vs = _mk(rng, b, h, kvh, s, d, True)
    lengths = jnp.asarray([100], jnp.int32)
    out1 = flash_decode(q, k, v, lengths, ks, vs, block_s=128)
    # poison everything past position 100
    k2 = k.at[:, :, 100:].set(127)
    v2 = v.at[:, :, 100:].set(-128)
    ks2 = ks.at[:, :, 100:].set(1e3)
    vs2 = vs.at[:, :, 100:].set(1e3)
    out2 = flash_decode(q, k2, v2, lengths, ks2, vs2, block_s=128)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_engine_flash_path_matches_small_cache_path():
    """End-to-end: a 128-slot cache (flash path) and a 32-slot cache
    (jnp fallback) must generate identical tokens."""
    from flexq_tpu.config import ModelConfig, QuantPolicy
    from flexq_tpu.models.quantized import quantize_params
    from flexq_tpu.serve.engine import Engine

    rng = np.random.default_rng(3)
    hidden, layers, heads, kvh, vocab = 256, 1, 2, 1, 128
    cfg = ModelConfig.llama(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=hidden * 2,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=kvh,
        max_seq_len=128,
    )

    def w(k, n):
        return {"w": jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)}

    params = {
        "embed": jnp.asarray(rng.standard_normal((vocab, hidden)) * 0.05, jnp.float32),
        "final_norm": jnp.ones((hidden,), jnp.float32),
        "lm_head": jnp.asarray(rng.standard_normal((hidden, vocab)) * 0.05, jnp.float32),
        "layers": [
            {
                "input_norm": jnp.ones((hidden,), jnp.float32),
                "post_norm": jnp.ones((hidden,), jnp.float32),
                "q_proj": w(hidden, hidden),
                "k_proj": w(hidden, kvh * (hidden // heads)),
                "v_proj": w(hidden, kvh * (hidden // heads)),
                "o_proj": w(hidden, hidden),
                "gate_proj": w(hidden, hidden * 2),
                "up_proj": w(hidden, hidden * 2),
                "down_proj": w(hidden * 2, hidden),
            }
            for _ in range(layers)
        ],
    }
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, cfg, policy, dtype=jnp.float32)
    ids = jnp.asarray([[5, 9, 23], [7, 11, 40]], jnp.int32)
    step_logits = {}
    for name, maxlen in (("flash", 128), ("fallback", 32)):
        eng = Engine(qparams, cfg, policy, max_seq_len=maxlen, kv_dtype=jnp.float32)
        cache = eng.new_cache(2)
        logits, cache = eng._prefill_jit(eng.params, ids, cache, prompt_len=3)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        logits2, _ = eng._step_jit(eng.params, nxt, cache, jnp.int32(3))
        step_logits[name] = np.asarray(logits2, np.float32)
    a, b_ = step_logits["flash"], step_logits["fallback"]
    scale = max(1.0, np.abs(b_).max())
    # Flash runs its attention matmuls in bf16 while the fallback is f32, and
    # the 6-bit act quant downstream amplifies tiny attention deltas across
    # rounding bins — so this is a wiring check (layout/lengths/scatter), not
    # a numerics check; kernel exactness is pinned by the golden tests above.
    assert np.max(np.abs(a - b_)) / scale < 8e-2, np.max(np.abs(a - b_))


def test_flash_decode_paged_matches_contiguous():
    """Paged pool with a scrambled page table == contiguous flash decode."""
    from flexq_tpu.kernels.flash_decode import flash_decode_paged

    rng = np.random.default_rng(11)
    L, B, H, KVH, D, PS = 2, 2, 4, 2, 128, 128
    SMAX = 512  # 4 pages per sequence
    npages = B * SMAX // PS + 2
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    lens = jnp.asarray([300, 512], jnp.int32)

    for quant in (False, True):
        if quant:
            k = jnp.asarray(rng.integers(-127, 128, (L, B, KVH, SMAX, D)), jnp.int8)
            v = jnp.asarray(rng.integers(-127, 128, (L, B, KVH, SMAX, D)), jnp.int8)
            ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, KVH, SMAX)), jnp.float32)
            vs = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, KVH, SMAX)), jnp.float32)
        else:
            k = jnp.asarray(rng.standard_normal((L, B, KVH, SMAX, D)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((L, B, KVH, SMAX, D)), jnp.bfloat16)
            ks = vs = None

        # scatter the contiguous cache into a scrambled page pool
        nblocks = SMAX // PS
        perm = rng.permutation(npages)[: B * nblocks]
        table = np.zeros((B, nblocks), np.int32)
        pool_k = np.zeros((L, npages, KVH, PS, D), k.dtype)
        pool_v = np.zeros_like(pool_k)
        pool_ks = np.zeros((L, npages, KVH, PS), np.float32)
        pool_vs = np.zeros_like(pool_ks)
        kn, vn = np.asarray(k), np.asarray(v)
        for b_ in range(B):
            for i in range(nblocks):
                pg = int(perm[b_ * nblocks + i])
                table[b_, i] = pg
                pool_k[:, pg] = kn[:, b_, :, i * PS : (i + 1) * PS].transpose(0, 1, 2, 3)
                pool_v[:, pg] = vn[:, b_, :, i * PS : (i + 1) * PS]
                if quant:
                    pool_ks[:, pg] = np.asarray(ks)[:, b_, :, i * PS : (i + 1) * PS]
                    pool_vs[:, pg] = np.asarray(vs)[:, b_, :, i * PS : (i + 1) * PS]

        li = 1
        scales = (ks, vs) if quant else (None, None)
        want = flash_decode(q, k, v, lens, *scales, layer_idx=jnp.int32(li), block_s=PS)
        psc = (jnp.asarray(pool_ks), jnp.asarray(pool_vs)) if quant else (None, None)
        got = flash_decode_paged(
            q, jnp.asarray(pool_k), jnp.asarray(pool_v), jnp.asarray(table),
            lens, *psc, layer_idx=jnp.int32(li),
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=1e-6, err_msg=f"quant={quant}",
        )
