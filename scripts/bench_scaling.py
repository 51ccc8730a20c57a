"""TP scaling-efficiency harness (BASELINE north star: >=80% tokens/s
scaling efficiency from 1 chip to N).

Measures decode tokens/s through forward_serve_tp at each TP width the
device pool supports and reports efficiency vs linear scaling from TP=1.
On this environment (1 real chip) only TP=1 runs on hardware; pass --cpu
to functionally exercise the sweep on a virtual device mesh (numbers are
then CPU-meaningless but the harness path is validated end to end).

Run:  nohup python scripts/bench_scaling.py [--cpu N] > /tmp/scaling.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", type=int, default=0,
                    help="N virtual CPU devices (functional validation)")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flexq_tpu.config import ModelConfig, QuantPolicy
    from flexq_tpu.models.quantized import quantize_linear
    from flexq_tpu.parallel import forward_serve_tp, make_mesh, shard_params
    from flexq_tpu.serve.engine import decode_mask

    ndev = len(jax.devices())
    print(f"devices: {ndev}", flush=True)
    h, f = args.hidden, args.hidden * 2
    heads = max(ndev, 4)
    cfg = ModelConfig.llama(
        vocab_size=1024, hidden_size=h, intermediate_size=f,
        num_layers=args.layers, num_heads=heads, num_kv_heads=heads,
        max_seq_len=512,
    )
    policy = QuantPolicy.llama_flex()
    rng = np.random.default_rng(0)

    def build():
        shapes = {
            "q_proj": (h, h), "k_proj": (h, h), "v_proj": (h, h),
            "o_proj": (h, h), "gate_proj": (h, f), "up_proj": (h, f),
            "down_proj": (f, h),
        }
        layers = []
        for _ in range(cfg.num_layers):
            lp = {"input_norm": jnp.ones((h,), jnp.bfloat16),
                  "post_norm": jnp.ones((h,), jnp.bfloat16)}
            for name, (kk, nn) in shapes.items():
                dense = jnp.asarray(rng.standard_normal((kk, nn)) * 0.02, jnp.bfloat16)
                lp[name] = quantize_linear(dense, policy.weight_spec(name))
            layers.append(lp)
        return {
            "embed": jnp.asarray(rng.standard_normal((1024, h)) * 0.02, jnp.bfloat16),
            "final_norm": jnp.ones((h,), jnp.bfloat16),
            "lm_head": jnp.asarray(rng.standard_normal((h, 1024)) * 0.02, jnp.bfloat16),
            "layers": layers,
        }

    params = build()
    results = {}
    tp_widths = [
        t for t in (1, 2, 4, 8, 16)
        if t <= ndev and heads % t == 0
        # row-parallel per-group scale rows (K/128) must split over tp, and
        # each rank's column shard must be >= 128 lanes
        and (h // 128) % t == 0 and (f // 128) % t == 0
        and (h // t) >= 128 and (f // t) >= 128
    ]
    for tp in tp_widths:
        mesh = make_mesh(tp=tp, dp=1)
        sharded = shard_params(params, mesh)
        b, maxlen = 4, 512
        shape = (cfg.num_layers, b, cfg.num_kv_heads, maxlen, cfg.head_dim)
        kv_k = jnp.zeros(shape, jnp.bfloat16)
        kv_v = jnp.zeros(shape, jnp.bfloat16)
        ids = jnp.zeros((b, 1), jnp.int32)
        logits, (kv_k, kv_v) = forward_serve_tp(
            sharded, cfg, policy, ids, mesh, kv_k=kv_k, kv_v=kv_v,
            cache_pos=jnp.int32(0), mask=decode_mask(jnp.int32(0), maxlen),
        )
        float(jnp.sum(logits))  # warm + sync
        t0 = time.perf_counter()
        for t in range(1, args.steps + 1):
            logits, (kv_k, kv_v) = forward_serve_tp(
                sharded, cfg, policy, ids, mesh, kv_k=kv_k, kv_v=kv_v,
                cache_pos=jnp.int32(t), mask=decode_mask(jnp.int32(t), maxlen),
            )
        float(jnp.sum(logits))
        dt = (time.perf_counter() - t0) / args.steps
        toks = b / dt
        results[f"tp{tp}"] = {"ms_per_step": dt * 1e3, "tok_s": toks}
        base = results["tp1"]["tok_s"]
        eff = toks / (base * tp)
        results[f"tp{tp}"]["scaling_efficiency"] = round(eff, 3)
        print(f"TP={tp}: {dt*1e3:.2f} ms/step, {toks:.0f} tok/s, eff {eff:.2f}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
