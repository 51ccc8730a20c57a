"""SmoothQuant-style folding: output invariance + outlier migration.

Counterpart of the reference's transformation.py (algorithm/models/
transformation.py:24-139): folding scales between ln→fcs, v→o, q↔k must not
change the dense model's outputs, while shrinking activation ranges so
per-token quantization loses less.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM, OPTConfig, OPTForCausalLM

from flexq_tpu.models import config_from_hf, from_hf_llama, from_hf_opt
from flexq_tpu.quant.smooth import (
    collect_llama_act_stats,
    collect_opt_act_stats,
    compute_smooth_scales,
    smooth_llama,
    smooth_ln_fcs,
    smooth_opt,
)


def _tiny_llama(kv_heads=2):
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    return config_from_hf(m.config), from_hf_llama(m, dtype=jnp.float32)


def _tiny_opt():
    torch.manual_seed(0)
    cfg = OPTConfig(
        vocab_size=128,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        do_layer_norm_before=True,
        tie_word_embeddings=True,
    )
    m = OPTForCausalLM(cfg).eval()
    return config_from_hf(m.config), from_hf_opt(m, dtype=jnp.float32)


def test_smooth_ln_fcs_with_shift_absorbs_into_bias():
    rng = np.random.default_rng(0)
    c, n = 16, 8
    g = jnp.asarray(rng.standard_normal(c), jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, n)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, c)), jnp.float32)  # normalized x
    scales = jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)
    shifts = jnp.asarray(rng.standard_normal(c), jnp.float32)

    want = (y * g + b) @ w  # fc(LN-affine(y)), no fc bias
    ln2, (fc2,) = smooth_ln_fcs({"g": g, "b": b}, [{"w": w, "b": None}], scales, shifts)
    got = ((y * ln2["g"] + ln2["b"]) @ fc2["w"]) + fc2["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv_heads", [4, 2])  # MHA + GQA
@pytest.mark.parametrize("fold_qk", [False, True])
def test_smooth_llama_output_invariant(kv_heads, fold_qk):
    from flexq_tpu.models.llama import forward

    cfg, params = _tiny_llama(kv_heads=kv_heads)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
    stats = collect_llama_act_stats(params, cfg, ids)
    smoothed = smooth_llama(params, cfg, stats, alpha=0.5, fold_qk=fold_qk)
    want = np.asarray(forward(params, cfg, ids))
    got = np.asarray(forward(smoothed, cfg, ids))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 2e-4


def test_smooth_opt_output_invariant():
    from flexq_tpu.models.opt import forward

    cfg, params = _tiny_opt()
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (2, 10)))
    stats = collect_opt_act_stats(params, cfg, ids)
    smoothed = smooth_opt(params, cfg, stats, alpha=0.5, fold_qk=True)
    want = np.asarray(forward(params, cfg, ids))
    got = np.asarray(forward(smoothed, cfg, ids))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 2e-4


def test_smoothing_shrinks_outlier_channels():
    """Inject an outlier channel into layer-0 qkv input (via embed) and
    check the smoothed model's qkv input range is tamer."""
    cfg, params = _tiny_llama()
    params = dict(params)
    params["embed"] = params["embed"].at[:, 3].mul(30.0)  # channel-3 outlier
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 12)))
    stats = collect_llama_act_stats(params, cfg, ids)
    smoothed = smooth_llama(params, cfg, stats, alpha=0.5)
    stats2 = collect_llama_act_stats(smoothed, cfg, ids)
    before = stats[0]["qkv_in"]
    after = stats2[0]["qkv_in"]
    # outlier max shrinks, and the spread (max/median) tightens
    assert after.max() < before.max()
    assert (after.max() / np.median(after)) < (before.max() / np.median(before))


def test_compute_smooth_scales_formula():
    a = jnp.asarray([4.0, 1.0], jnp.float32)
    w = jnp.asarray([1.0, 4.0], jnp.float32)
    s = np.asarray(compute_smooth_scales(a, w, alpha=0.5))
    np.testing.assert_allclose(s, [2.0, 0.5], rtol=1e-6)
