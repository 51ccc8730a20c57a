"""HuggingFace checkpoint → flexq_tpu param pytree.

Replaces the reference's LMClass HF wrapper (algorithm/models/LMClass.py:31)
and the HF→FasterTransformer converter
(e2e examples/pytorch/llama/utils/huggingface_llama_convert.py). Weights are
transposed to [in, out] (forward is x @ w).

Two entry points:
  * from_hf_llama / from_hf_opt: convert an in-memory transformers model
    (tests, small models).
  * load_checkpoint: stream safetensors shards from a directory without
    instantiating torch modules (large models; used by the exporter).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import ModelConfig


def _t(x, dtype) -> jnp.ndarray:
    arr = np.asarray(x.detach().cpu().float().numpy() if hasattr(x, "detach") else x)
    return jnp.asarray(arr, dtype)


def config_from_hf(hf_cfg) -> ModelConfig:
    """Build ModelConfig from a transformers config object or config.json dict."""
    get = (lambda k, d=None: getattr(hf_cfg, k, d)) if not isinstance(hf_cfg, dict) else (
        lambda k, d=None: hf_cfg.get(k, d)
    )
    model_type = get("model_type", "llama")
    if model_type == "gemma":
        # Gemma-1 (2B MQA / 7B MHA): GeGLU MLP, (1+w) rmsnorm (folded into
        # the stored gamma at load — see ModelConfig.norm_offset), embeds
        # scaled by sqrt(hidden), head_dim 256, tied vocab. Gemma-2+ (soft-
        # caps, alternating local/global layers) is NOT this path.
        act = get("hidden_activation") or get("hidden_act") or "gelu_pytorch_tanh"
        if act != "gelu_pytorch_tanh":
            # bare "gelu" is the legacy Gemma config bug: current HF runs
            # exact erf-GELU for it, which the kernels don't implement and
            # which diverges from Google's own (tanh) Gemma. Official
            # checkpoints were re-released with gelu_pytorch_tanh.
            raise ValueError(
                f"unsupported gemma activation {act!r}; set hidden_activation "
                "to 'gelu_pytorch_tanh' (the official Gemma semantics)"
            )
        return ModelConfig.llama(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads") or get("num_attention_heads"),
            max_seq_len=get("max_position_embeddings", 8192),
            rope_theta=get("rope_theta", 10000.0),
            norm_eps=get("rms_norm_eps", 1e-6),
            tie_word_embeddings=bool(get("tie_word_embeddings", True)),
            head_dim=get("head_dim") or 256,  # GemmaConfig's default
            act="gelu",
            norm_offset=1.0,
            embed_scale=float(get("hidden_size")) ** 0.5,
        )
    if model_type in ("llama", "mistral", "qwen2"):
        # One llama-family graph covers all three: Mistral adds the sliding
        # window (+ optional head_dim override, e.g. NeMo's 128 @ hidden
        # 5120), Qwen2 adds q/k/v biases (modeling_qwen2 hardcodes bias=True
        # on q/k/v and False on o_proj).
        rs = get("rope_scaling")
        scaling = None
        if rs:
            rtype = rs.get("rope_type", rs.get("type"))
            if rtype == "llama3":
                scaling = (
                    float(rs["factor"]),
                    float(rs["low_freq_factor"]),
                    float(rs["high_freq_factor"]),
                    int(rs["original_max_position_embeddings"]),
                )
            elif rtype not in (None, "default"):
                raise ValueError(
                    f"unsupported rope_scaling type {rtype!r} (only 'llama3')"
                )
        window = None
        if model_type == "mistral":
            window = get("sliding_window")
        elif model_type == "qwen2" and get("use_sliding_window", False):
            # HF applies the window only to layers >= max_window_layers
            # (modeling_qwen2 layer gate); cfg.sliding_window is global, so
            # only the all-layers case is representable — refuse hybrids
            # rather than silently diverging. (Released Qwen2/2.5 configs
            # ship use_sliding_window=false, so this path is rare.)
            mwl = get("max_window_layers", 0) or 0
            if mwl > 0:
                raise ValueError(
                    f"qwen2 max_window_layers={mwl} (hybrid full/windowed "
                    "layers) is not supported; only max_window_layers=0 "
                    "(all layers windowed) or use_sliding_window=false"
                )
            window = get("sliding_window")
        return ModelConfig.llama(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads") or get("num_attention_heads"),
            max_seq_len=get("max_position_embeddings", 2048),
            rope_theta=get("rope_theta", 10000.0),
            norm_eps=get("rms_norm_eps", 1e-5),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            head_dim=get("head_dim"),
            qkv_bias=model_type == "qwen2",
            sliding_window=window,
            rope_scaling=scaling,
        )
    if model_type == "opt":
        return ModelConfig.opt(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("ffn_dim"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            max_seq_len=get("max_position_embeddings", 2048),
            do_layer_norm_before=bool(get("do_layer_norm_before", True)),
            tie_word_embeddings=bool(get("tie_word_embeddings", True)),
        )
    raise ValueError(f"unsupported model_type {model_type}")


def from_hf_llama(model, dtype=jnp.float32) -> Dict[str, Any]:
    """transformers {Llama,Mistral,Qwen2,Gemma}ForCausalLM → param pytree."""
    sd = model.state_dict()
    n_layers = model.config.num_hidden_layers
    # GemmaRMSNorm computes x*(1+w); fold the +1 into the stored gamma so
    # the rmsnorm kernels stay family-agnostic (ModelConfig.norm_offset)
    noff = 1.0 if getattr(model.config, "model_type", "llama") == "gemma" else 0.0

    def norm(key):
        return _t(sd[key], dtype) + noff if noff else _t(sd[key], dtype)

    layers = []
    for i in range(n_layers):
        p = f"model.layers.{i}."

        def lin(name):
            d = {"w": _t(sd[p + name + ".weight"].T, dtype)}
            if p + name + ".bias" in sd:  # Qwen2 q/k/v biases
                d["b"] = _t(sd[p + name + ".bias"], dtype)
            return d

        layers.append(
            {
                "input_norm": norm(p + "input_layernorm.weight"),
                "post_norm": norm(p + "post_attention_layernorm.weight"),
                "q_proj": lin("self_attn.q_proj"),
                "k_proj": lin("self_attn.k_proj"),
                "v_proj": lin("self_attn.v_proj"),
                "o_proj": lin("self_attn.o_proj"),
                "gate_proj": lin("mlp.gate_proj"),
                "up_proj": lin("mlp.up_proj"),
                "down_proj": lin("mlp.down_proj"),
            }
        )
    params = {
        "embed": _t(sd["model.embed_tokens.weight"], dtype),
        "final_norm": norm("model.norm.weight"),
        "layers": layers,
    }
    if "lm_head.weight" in sd and not model.config.tie_word_embeddings:
        params["lm_head"] = _t(sd["lm_head.weight"].T, dtype)
    return params


def from_hf_opt(model, dtype=jnp.float32) -> Dict[str, Any]:
    """transformers OPTForCausalLM → param pytree."""
    sd = model.state_dict()
    n_layers = model.config.num_hidden_layers
    layers = []
    for i in range(n_layers):
        p = f"model.decoder.layers.{i}."

        def lin(name):
            return {
                "w": _t(sd[p + name + ".weight"].T, dtype),
                "b": _t(sd[p + name + ".bias"], dtype),
            }

        layers.append(
            {
                "input_norm": {
                    "g": _t(sd[p + "self_attn_layer_norm.weight"], dtype),
                    "b": _t(sd[p + "self_attn_layer_norm.bias"], dtype),
                },
                "post_norm": {
                    "g": _t(sd[p + "final_layer_norm.weight"], dtype),
                    "b": _t(sd[p + "final_layer_norm.bias"], dtype),
                },
                "q_proj": lin("self_attn.q_proj"),
                "k_proj": lin("self_attn.k_proj"),
                "v_proj": lin("self_attn.v_proj"),
                "o_proj": lin("self_attn.out_proj"),
                "fc1": lin("fc1"),
                "fc2": lin("fc2"),
            }
        )
    params = {
        "embed": _t(sd["model.decoder.embed_tokens.weight"], dtype),
        "pos_embed": _t(sd["model.decoder.embed_positions.weight"], dtype),
        "layers": layers,
    }
    if "model.decoder.final_layer_norm.weight" in sd:
        params["final_norm"] = {
            "g": _t(sd["model.decoder.final_layer_norm.weight"], dtype),
            "b": _t(sd["model.decoder.final_layer_norm.bias"], dtype),
        }
    return params


def load_checkpoint(
    model_dir: str, dtype=jnp.bfloat16
) -> tuple[ModelConfig, Dict[str, Any]]:
    """Load config.json + *.safetensors shards from a directory.

    Torch-free path for big checkpoints (the serving weight loader, analogue
    of LlamaWeight::loadModel, reference LlamaDecoderLayerWeight.cc:381-406).
    """
    from safetensors import safe_open

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)

    tensors: Dict[str, np.ndarray] = {}
    shards = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not shards:
        raise FileNotFoundError(f"no safetensors shards in {model_dir}")
    for shard in shards:
        with safe_open(os.path.join(model_dir, shard), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)

    def t(key, transpose=False):
        arr = tensors[key]
        if arr.dtype == np.uint16:  # bf16 raw
            arr = arr.view(np.uint16)
            out = jnp.asarray(arr).view(jnp.bfloat16)
        else:
            out = jnp.asarray(arr)
        out = out.astype(dtype)
        return out.T if transpose else out

    if cfg.arch == "llama":
        def norm(key):
            g = t(key)
            return g + cfg.norm_offset if cfg.norm_offset else g

        layers = []
        for i in range(cfg.num_layers):
            p = f"model.layers.{i}."

            def lin(name):
                d = {"w": t(p + name + ".weight", True)}
                if p + name + ".bias" in tensors:  # Qwen2 q/k/v biases
                    d["b"] = t(p + name + ".bias")
                return d

            layers.append(
                {
                    "input_norm": norm(p + "input_layernorm.weight"),
                    "post_norm": norm(p + "post_attention_layernorm.weight"),
                    "q_proj": lin("self_attn.q_proj"),
                    "k_proj": lin("self_attn.k_proj"),
                    "v_proj": lin("self_attn.v_proj"),
                    "o_proj": lin("self_attn.o_proj"),
                    "gate_proj": lin("mlp.gate_proj"),
                    "up_proj": lin("mlp.up_proj"),
                    "down_proj": lin("mlp.down_proj"),
                }
            )
        params = {
            "embed": t("model.embed_tokens.weight"),
            "final_norm": norm("model.norm.weight"),
            "layers": layers,
        }
        if "lm_head.weight" in tensors and not cfg.tie_word_embeddings:
            params["lm_head"] = t("lm_head.weight", True)
        return cfg, params
    raise NotImplementedError(f"load_checkpoint for arch {cfg.arch}")
