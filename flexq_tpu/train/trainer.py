"""Minimal from-scratch causal-LM trainer for the accuracy-gate model.

Trains the same functional LLaMA graph the eval/serve paths consume
(flexq_tpu.models.llama.forward), so a trained checkpoint drops straight
into fake-quant ppl eval, the packed exporter, and the serving engine with
zero conversion. AdamW + cosine schedule + global-norm clipping; f32 params
(the eval oracle runs f32, and a ~30M-param model doesn't need bf16).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flexq_tpu.config import ModelConfig
from flexq_tpu.models.llama import forward


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    seq_len: int = 512
    lr: float = 6e-4
    warmup_steps: int = 500
    total_steps: int = 30000
    weight_decay: float = 0.1
    b1: float = 0.9
    b2: float = 0.95
    clip_norm: float = 1.0
    seed: int = 0


def init_params(cfg: ModelConfig, seed: int = 0) -> Dict[str, Any]:
    """GPT-2-style init: N(0, 0.02) with 1/sqrt(2*n_layers) residual-out
    scaling on o_proj/down_proj."""
    rng = np.random.default_rng(seed)
    std = 0.02
    res_std = std / np.sqrt(2 * cfg.num_layers)

    def lin(k: int, n: int, s: float) -> Dict[str, Any]:
        return {"w": jnp.asarray(rng.normal(0, s, (k, n)), jnp.float32)}

    h, inter = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_kv_heads * cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "input_norm": jnp.ones((h,), jnp.float32),
                "post_norm": jnp.ones((h,), jnp.float32),
                "q_proj": lin(h, cfg.num_heads * cfg.head_dim, std),
                "k_proj": lin(h, kvd, std),
                "v_proj": lin(h, kvd, std),
                "o_proj": lin(cfg.num_heads * cfg.head_dim, h, res_std),
                "gate_proj": lin(h, inter, std),
                "up_proj": lin(h, inter, std),
                "down_proj": lin(inter, h, res_std),
            }
        )
    return {
        "embed": jnp.asarray(rng.normal(0, std, (cfg.vocab_size, h)), jnp.float32),
        "layers": layers,
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": jnp.asarray(rng.normal(0, std, (h, cfg.vocab_size)), jnp.float32),
    }


def make_lr_schedule(tc: TrainConfig):
    warmup = min(tc.warmup_steps, max(1, tc.total_steps // 10))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.lr,
        warmup_steps=warmup,
        decay_steps=tc.total_steps,
        end_value=tc.lr * 0.05,
    )


def _decay_mask(params):
    # decay only matrix weights; norms/embeddings follow GPT-2 practice
    # (embed/head get decay, gains don't)
    def mask(path, x):
        name = "/".join(str(p) for p in path)
        return x.ndim >= 2
    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(tc: TrainConfig, params) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tc.clip_norm),
        optax.adamw(
            make_lr_schedule(tc),
            b1=tc.b1,
            b2=tc.b2,
            weight_decay=tc.weight_decay,
            mask=_decay_mask(params),
        ),
    )


def loss_fn(params, cfg: ModelConfig, ids: jax.Array) -> jax.Array:
    logits = forward(params, cfg, ids)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1].astype(jnp.float32), ids[:, 1:].astype(jnp.int32)
    )
    return jnp.mean(ce)


def train_step(params, opt_state, ids, cfg: ModelConfig, opt):
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, ids)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


# ---------------------------------------------------------------- checkpoint


def _flatten(params, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def save_checkpoint(path: str, params, cfg: ModelConfig, step: int, extra=None):
    flat = _flatten(params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    meta = {"config": dataclasses.asdict(cfg), "step": step, **(extra or {})}
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], ModelConfig, dict]:
    with open(path + ".json") as f:
        meta = json.load(f)
    cfg = ModelConfig(**meta.pop("config"))
    z = np.load(path)
    layers: list = [dict() for _ in range(cfg.num_layers)]
    params: Dict[str, Any] = {"layers": layers}
    for key in z.files:
        parts = key.split(".")
        arr = jnp.asarray(z[key])
        if parts[0] == "layers":
            li = int(parts[1])
            if len(parts) == 3:  # norms
                layers[li][parts[2]] = arr
            else:  # layers.i.name.w
                layers[li].setdefault(parts[2], {})[parts[3]] = arr
        else:
            params[parts[0]] = arr
    return params, cfg, meta


def batch_iterator(tokens: np.ndarray, tc: TrainConfig, seed: int = 0):
    """Random contiguous windows from a flat token stream, forever."""
    rng = np.random.default_rng(seed)
    n = tokens.size - tc.seq_len - 1
    while True:
        starts = rng.integers(0, n, tc.batch_size)
        yield np.stack([tokens[s : s + tc.seq_len] for s in starts]).astype(np.int32)


def windows_from_stream(tokens: np.ndarray, seq_len: int) -> np.ndarray:
    """Non-overlapping eval windows [n, seq_len] (reference main.py:43-55
    wikitext windowing: contiguous, no stride overlap)."""
    n = tokens.size // seq_len
    return tokens[: n * seq_len].reshape(n, seq_len).astype(np.int32)
