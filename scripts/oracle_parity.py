"""7B-scale serve-vs-oracle parity on real TPU (synthetic weights).

The strongest accuracy validation available without real checkpoints
(reference acceptance flow algorithm/main.py:43-121 needs WikiText2; this
environment has no weights/datasets): generate greedily through the PACKED
serving path, then teacher-force the same token sequence through the
FAKE-QUANT ORACLE (dense weights quantize-dequantized per policy + dynamic
act fake-quant — the reference's accuracy-eval semantics), and compare
per-position logits (RMSE / max-abs) and greedy-argmax agreement.

Three phases, each its OWN process (a 7B packed tree ~5.7 GB and a 7B dense
bf16 tree ~13.5 GB cannot coexist on a 16 GB chip), sharing on-device
jax.random weight generation keyed identically:

    python scripts/oracle_parity.py serve   --policy w6 --kv bf16
    python scripts/oracle_parity.py oracle  --policy w6
    python scripts/oracle_parity.py compare --policy w6 --kv bf16

Run all (ONE TPU process at a time; nohup, never shell-timeout — CLAUDE.md):
    nohup bash scripts/run_oracle_parity.sh > /tmp/oracle_parity.log 2>&1 &

The serving side runs the EXACT quantized path end to end (prefill_bf16
disabled so prompt activations are act-quantized like the oracle's); greedy
tokens come from the serve logits, so agreement measures whether the packed
integer kernels reproduce the oracle's float fake-quant math through 256
autoregressive steps — divergence would compound, which is the point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMALL = os.environ.get("FLEXQ_ORACLE_SMALL") == "1"  # CPU smoke mode
PROMPT_LEN = 8 if SMALL else 128
GEN = 8 if SMALL else 256
MAX_LEN = 128 if SMALL else 512
SEED = 0

_DIMS = (256, 512, 2, 2, 2) if SMALL else (4096, 11008, 32, 32, 32)  # 7B
_SHAPE_ORDER = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
)


def _cfg():
    from flexq_tpu.config import ModelConfig

    h, f, nl, nh, nkv = _DIMS
    return ModelConfig.llama(
        vocab_size=32000, hidden_size=h, intermediate_size=f, num_layers=nl,
        num_heads=nh, num_kv_heads=nkv, max_seq_len=MAX_LEN,
    )


def _policy(name: str):
    from flexq_tpu.config import QuantPolicy

    if name == "w6":
        return QuantPolicy.llama_flex()
    if name == "w4a8":
        return QuantPolicy.uniform("llama", wbits=4, abits=8)
    raise ValueError(name)


def _keys(cfg):
    import jax

    key = jax.random.PRNGKey(SEED)
    return jax.random.split(key, cfg.num_layers + 3)


def _shapes(cfg):
    h, f = cfg.hidden_size, cfg.intermediate_size
    return {
        "q_proj": (h, h), "k_proj": (h, h), "v_proj": (h, h), "o_proj": (h, h),
        "gate_proj": (h, f), "up_proj": (h, f), "down_proj": (f, h),
    }


def _dense_iter(cfg):
    """Yield (layer_idx, name, dense bf16 weight) with DETERMINISTIC keys —
    both phases regenerate identical weights on the same backend."""
    import jax
    import jax.numpy as jnp

    keys = _keys(cfg)
    shapes = _shapes(cfg)
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], len(shapes))
        for (name, (k, n)), sk in zip(shapes.items(), ks):
            yield i, name, jax.random.normal(sk, (k, n), jnp.bfloat16) * 0.02


def _embed_head(cfg):
    import jax
    import jax.numpy as jnp

    keys = _keys(cfg)
    h = cfg.hidden_size
    embed = jax.random.normal(keys[-3], (cfg.vocab_size, h), jnp.bfloat16) * 0.02
    head = jax.random.normal(keys[-2], (h, cfg.vocab_size), jnp.bfloat16) * 0.02
    return embed, head


def _prompt():
    return np.random.default_rng(7).integers(100, 31000, PROMPT_LEN).astype(np.int32)


def _npz(args, phase):
    # the oracle teacher-forces the serve phase's tokens, which depend on
    # the KV dtype too — every artifact is tagged (policy, kv)
    return os.path.join(args.out, f"{phase}_{args.policy}_{args.kv}.npz")


def run_serve(args):
    import jax
    import jax.numpy as jnp

    from flexq_tpu.models.quantized import forward_serve, quantize_linear
    from flexq_tpu.serve.engine import decode_mask, prefill_mask

    cfg = _cfg()
    policy = _policy(args.policy)
    h = cfg.hidden_size
    f = cfg.intermediate_size
    ffn_pad = f + ((-f) % (1024 if f >= 2048 else 128))  # quantize_params rule
    layers, cur = [], None
    for i, name, dense in _dense_iter(cfg):
        if cur is None or len(layers) < i + 1:
            cur = {
                "input_norm": jnp.ones((h,), jnp.bfloat16),
                "post_norm": jnp.ones((h,), jnp.bfloat16),
            }
            layers.append(cur)
        cur[name] = quantize_linear(
            dense, policy.weight_spec(name),
            k_pad_to=ffn_pad if name == "down_proj" else None,
        )
        cur[name] = jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), cur[name]
        )
        del dense
        if name == "down_proj":
            print(f"  layer {i + 1}/{cfg.num_layers} packed", flush=True)
    embed, head = _embed_head(cfg)
    params = {
        "embed": embed, "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": head, "layers": layers,
    }

    quant_kv = args.kv == "int8"
    shape = (cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN, cfg.head_dim)
    cache = (
        jnp.zeros(shape, jnp.int8 if quant_kv else jnp.bfloat16),
        jnp.zeros(shape, jnp.int8 if quant_kv else jnp.bfloat16),
    )
    if quant_kv:
        cache += (jnp.zeros(shape[:-1], jnp.float32),
                  jnp.zeros(shape[:-1], jnp.float32))

    def fwd(params, ids, cache, pos, mask, positions):
        scales = (
            {"kv_k_scale": cache[2], "kv_v_scale": cache[3]} if quant_kv else {}
        )
        # prefill_bf16 stays False: the WHOLE chain (prompt included) runs
        # the act-quant W6Ax/W4A8 path the oracle fake-quantizes
        logits, kv = forward_serve(
            params, cfg, policy, ids, positions=positions,
            kv_k=cache[0], kv_v=cache[1], cache_pos=pos, mask=mask, **scales,
        )
        return logits, kv

    prefill = jax.jit(fwd, donate_argnums=(2,))
    step = jax.jit(fwd, donate_argnums=(2,))

    prompt = _prompt()
    ids = jnp.asarray(prompt)[None]
    positions = jnp.arange(PROMPT_LEN)[None]
    print("prefill (compiling)...", flush=True)
    logits, cache = prefill(
        params, ids, cache, jnp.int32(0), prefill_mask(PROMPT_LEN, MAX_LEN),
        positions,
    )
    logits_rows = [np.asarray(logits[0, -1], np.float32)]
    tok = int(np.argmax(logits_rows[0]))
    tokens = [tok]
    print("decoding 256 (first step compiles)...", flush=True)
    for t in range(GEN - 1):
        pos = PROMPT_LEN + t
        logits, cache = step(
            params, jnp.asarray([[tok]], jnp.int32), cache, jnp.int32(pos),
            decode_mask(jnp.int32(pos), MAX_LEN),
            jnp.full((1, 1), pos, jnp.int32),
        )
        row = np.asarray(logits[0, 0], np.float32)
        logits_rows.append(row)
        tok = int(np.argmax(row))
        tokens.append(tok)
        if (t + 2) % 64 == 0:
            print(f"  {t + 2}/{GEN}", flush=True)
    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(
        _npz(args, "serve"), prompt=prompt,
        tokens=np.asarray(tokens, np.int32),
        logits=np.stack(logits_rows),
    )
    print("serve phase saved", flush=True)


def run_oracle(args):
    """Teacher-force the serve phase's tokens through the fake-quant oracle
    (one full-sequence forward; logits at positions PROMPT_LEN-1 .. end-1
    predict exactly the serve phase's 256 emissions)."""
    import jax
    import jax.numpy as jnp

    from flexq_tpu.models.llama import forward
    from flexq_tpu.quant.quantizer import fake_quant

    cfg = _cfg()
    policy = _policy(args.policy)
    h = cfg.hidden_size
    # weights fake-quantized IN PLACE as generated: a dense tree + its
    # fake-quant copy (2 x 13.5 GB) would not fit
    layers = []
    for i, name, dense in _dense_iter(cfg):
        if len(layers) < i + 1:
            layers.append({
                "input_norm": jnp.ones((h,), jnp.bfloat16),
                "post_norm": jnp.ones((h,), jnp.bfloat16),
            })
        spec = policy.weight_spec(name)
        fq = fake_quant(dense.T, spec).T if spec.enabled else dense
        layers[i][name] = {"w": fq.block_until_ready()}
        del dense
        if name == "down_proj":
            print(f"  layer {i + 1}/{cfg.num_layers} fake-quantized", flush=True)
    embed, head = _embed_head(cfg)
    params = {
        "embed": embed, "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": head, "layers": layers,
    }

    serve = np.load(_npz(args, "serve"))
    seq = np.concatenate([serve["prompt"], serve["tokens"]])
    ids = jnp.asarray(seq, jnp.int32)[None]
    print("oracle forward (compiling)...", flush=True)
    logits = jax.jit(lambda p, i: forward(p, cfg, i, policy))(params, ids)
    rows = np.asarray(
        logits[0, PROMPT_LEN - 1 : PROMPT_LEN + GEN - 1], np.float32
    )
    np.savez_compressed(_npz(args, "oracle"), logits=rows)
    print("oracle phase saved", flush=True)


def run_compare(args):
    serve = np.load(_npz(args, "serve"))
    oracle = np.load(_npz(args, "oracle"))
    s, o = serve["logits"], oracle["logits"]
    assert s.shape == o.shape, (s.shape, o.shape)
    rmse = float(np.sqrt(np.mean((s - o) ** 2)))
    maxabs = float(np.max(np.abs(s - o)))
    # scale-free: error relative to the logit spread
    span = float(np.std(o))
    agree = float(np.mean(np.argmax(s, -1) == np.argmax(o, -1)))
    out = {
        "config": f"{args.policy}/kv-{args.kv}",
        "positions": int(s.shape[0]),
        "logit_rmse": round(rmse, 6),
        "logit_maxabs": round(maxabs, 6),
        "logit_std_oracle": round(span, 6),
        "rmse_over_std": round(rmse / span, 6),
        "greedy_agreement": round(agree, 6),
    }
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["serve", "oracle", "compare"])
    ap.add_argument("--policy", default="w6", choices=["w6", "w4a8"])
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--out", default="/tmp/oracle_parity")
    args = ap.parse_args()
    if args.phase == "serve":
        run_serve(args)
    elif args.phase == "oracle":
        run_oracle(args)
    else:
        run_compare(args)


if __name__ == "__main__":
    main()
