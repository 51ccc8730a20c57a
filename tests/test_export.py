"""Exporter + native packlib tests.

The native C++ path must match the Python reference bit-for-bit, and an
exported checkpoint must round-trip into the same logits as in-memory
quantization.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flexq_tpu.export.native import get_lib, group_quant_np, quant_pack6
from flexq_tpu.packing import pack6_np
from flexq_tpu.quant import QuantSpec, quantize


def test_native_lib_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain")
    assert lib.flexq_num_threads() >= 1


def test_native_matches_python():
    lib = get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain")
    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 384)).astype(np.float32) * 0.1
    hi_n, lo_n, s_n = quant_pack6(w)

    q_py, s_py = group_quant_np(w, 6)
    hi_py, lo_py = pack6_np(q_py)
    np.testing.assert_allclose(s_n, s_py, rtol=1e-6)
    np.testing.assert_array_equal(hi_n, hi_py)
    np.testing.assert_array_equal(lo_n, lo_py)


def test_group_quant_np_matches_quantizer():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    q, s = group_quant_np(w, 6)
    # quantizer groups along last axis of [N, K]; ours along K of [K, N]
    spec = QuantSpec(bits=6, symmetric=True, group_size=128)
    qj, sj, _ = quantize(jnp.asarray(w.T), spec)
    qj = np.asarray(qj).reshape(128, 256).T
    sj = np.asarray(sj).reshape(128, 2).T
    np.testing.assert_array_equal(q, qj)
    np.testing.assert_allclose(s, sj, rtol=1e-6)


def test_export_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.export import export_checkpoint, load_packed
    from flexq_tpu.models import config_from_hf, from_hf_llama
    from flexq_tpu.models.quantized import forward_serve, quantize_params

    torch.manual_seed(0)
    cfg_hf = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    out_dir = tmp_path / "packed"
    export_checkpoint(str(hf_dir), str(out_dir))
    cfg, policy, params = load_packed(str(out_dir))

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 6)))
    got, _ = forward_serve(params, cfg, policy, ids)

    mem_params = quantize_params(
        from_hf_llama(model, dtype=jnp.float32),
        config_from_hf(model.config),
        QuantPolicy.llama_flex(),
        dtype=jnp.bfloat16,
    )
    want, _ = forward_serve(mem_params, config_from_hf(model.config), policy, ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_export_roundtrip_weight_only_w4(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.export import export_checkpoint, load_packed
    from flexq_tpu.models import config_from_hf, from_hf_llama
    from flexq_tpu.models.quantized import forward_serve, quantize_params

    torch.manual_seed(1)
    cfg_hf = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    out_dir = tmp_path / "packed4"
    export_checkpoint(str(hf_dir), str(out_dir), policy_name="weight_only", wbits=4)
    cfg, policy, params = load_packed(str(out_dir))
    assert policy.is_weight_only
    assert "q4" in params["layers"][0]["q_proj"]

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 6)))
    got, _ = forward_serve(params, cfg, policy, ids)

    mem_params = quantize_params(
        from_hf_llama(model, dtype=jnp.float32),
        config_from_hf(model.config),
        QuantPolicy.weight_only("llama", wbits=4),
        dtype=jnp.bfloat16,
    )
    want, _ = forward_serve(mem_params, config_from_hf(model.config), policy, ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_native_pack4_matches_python():
    from flexq_tpu.export.native import quant_pack4
    from flexq_tpu.packing import pack4_np

    lib = get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain")
    rng = np.random.default_rng(2)
    w = rng.standard_normal((512, 384)).astype(np.float32) * 0.1
    plane_n, s_n = quant_pack4(w)
    q_py, s_py = group_quant_np(w, 4)
    np.testing.assert_allclose(s_n, s_py, rtol=1e-6)
    np.testing.assert_array_equal(plane_n, pack4_np(q_py))
    # transposed (F-ordered) input must give identical planes
    plane_t, s_t = quant_pack4(np.asfortranarray(w))
    np.testing.assert_array_equal(plane_t, plane_n)


def test_export_roundtrip_quantized_head(tmp_path):
    """--head-bits packs lm_head.hi/.lo/.scale into embed.safetensors and
    load_packed regroups them; logits match in-memory with_head quantization."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.export import export_checkpoint, load_packed
    from flexq_tpu.models import config_from_hf, from_hf_llama
    from flexq_tpu.models.quantized import forward_serve, quantize_params

    torch.manual_seed(2)
    cfg_hf = LlamaConfig(
        vocab_size=250,  # pads to 256 in the packed head; slicing must undo it
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    out_dir = tmp_path / "packed_head"
    export_checkpoint(str(hf_dir), str(out_dir), head_bits=6)
    cfg, policy, params = load_packed(str(out_dir))
    assert policy.weight_bits["lm_head"] == 6
    assert isinstance(params["lm_head"], dict) and "hi" in params["lm_head"]

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 250, (1, 6)))
    got, _ = forward_serve(params, cfg, policy, ids)
    assert got.shape == (1, 6, 250)

    mem_params = quantize_params(
        from_hf_llama(model, dtype=jnp.float32),
        config_from_hf(model.config),
        QuantPolicy.llama_flex().with_head(6, 8),
        dtype=jnp.bfloat16,
    )
    want, _ = forward_serve(mem_params, config_from_hf(model.config), policy, ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_export_tp_rank_shards(tmp_path):
    """--tp 2 writes per-rank shard files that (a) reassemble bit-exactly to
    the tp=1 export, (b) match the slices shard_params places on each mesh
    device, and (c) serve identical logits through the TP forward."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.export import export_checkpoint, load_packed
    from flexq_tpu.models.quantized import forward_serve
    from flexq_tpu.parallel import forward_serve_tp, make_mesh, shard_params

    torch.manual_seed(3)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    d1, d2 = tmp_path / "tp1", tmp_path / "tp2"
    export_checkpoint(str(hf_dir), str(d1), head_bits=6)
    export_checkpoint(str(hf_dir), str(d2), head_bits=6, tp=2)

    cfg, policy, full1 = load_packed(str(d1))
    _, _, full2 = load_packed(str(d2))  # rank=None: reassembled

    # (a) reassembly is bit-exact vs the unsharded export
    flat1 = jax.tree_util.tree_leaves_with_path(full1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(full2))
    for path, leaf in flat1:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat2[path]), err_msg=str(path)
        )

    # (b) each rank file equals the mesh shard of the full tree
    mesh = make_mesh(tp=2, dp=1)
    sharded = shard_params(full1, mesh)
    rank_of_device = {mesh.devices[0, r]: r for r in range(2)}
    locals_ = [load_packed(str(d2), rank=r)[2] for r in range(2)]
    for pick in (
        lambda p: p["layers"][0]["q_proj"]["hi"],       # column split
        lambda p: p["layers"][1]["down_proj"]["scale"],  # row split
        lambda p: p["lm_head"]["lo"],                    # vocab-parallel head
        lambda p: p["layers"][0]["input_norm"],          # replicated
    ):
        leaf = pick(sharded)
        for shard in leaf.addressable_shards:
            r = rank_of_device[shard.device]
            np.testing.assert_array_equal(
                np.asarray(shard.data), np.asarray(pick(locals_[r]))
            )

    # (c) serving parity through the TP mesh
    ids = jnp.asarray(np.random.default_rng(7).integers(0, 256, (1, 6)))
    want, _ = forward_serve(full1, cfg, policy, ids)
    got, _ = forward_serve_tp(shard_params(full2, mesh), cfg, policy, ids, mesh)
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    # bf16 exported params widen the compiled-vs-eager act-quant wobble;
    # same tolerance as the other export round-trip comparisons
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.08)
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.95


def test_load_packed_sharded_mesh(tmp_path):
    """load_packed_sharded assembles mesh-sharded params from rank files
    (each process reads only its local ranks' shards) and serves the same
    logits as shard_params over the assembled full tree."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.export import export_checkpoint, load_packed
    from flexq_tpu.export.exporter import load_packed_sharded
    from flexq_tpu.models.quantized import forward_serve
    from flexq_tpu.parallel import forward_serve_tp, make_mesh, shard_params

    torch.manual_seed(4)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)
    out = tmp_path / "tp2"
    export_checkpoint(str(hf_dir), str(out), head_bits=6, tp=2)

    mesh = make_mesh(tp=2, dp=2)
    cfg, policy, params = load_packed_sharded(str(out), mesh)

    # every leaf is a committed global array on the mesh
    leaf = params["layers"][0]["q_proj"]["hi"]
    assert leaf.shape == (256, 512)  # full [K/2, N] with N reassembled
    assert leaf.sharding.mesh.shape["model"] == 2

    # parity vs loading the full tree and sharding it
    _, _, full = load_packed(str(out))
    ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (2, 5)))
    want, _ = forward_serve_tp(shard_params(full, mesh), cfg, policy, ids, mesh)
    got, _ = forward_serve_tp(params, cfg, policy, ids, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
