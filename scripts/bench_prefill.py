"""7B prefill (TTFT) benchmark: W6A16 prefill path at L=512/2048.

Run:  nohup python scripts/bench_prefill.py > /tmp/prefill7b.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models.quantized import forward_serve
from flexq_tpu.serve.engine import prefill_mask

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import MAX_LEN, make_cache, synth_llama7b_quantized  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    policy = QuantPolicy.llama_flex()
    cfg, qparams = synth_llama7b_quantized(policy)
    results = {}
    for l in (512, 2048):
        def prefill(params, ids, cache):
            logits, kv = forward_serve(
                params, cfg, policy, ids,
                kv_k=cache[0], kv_v=cache[1], cache_pos=jnp.int32(0),
                mask=prefill_mask(l, MAX_LEN), prefill_bf16=True,
            )
            return logits[:, -1], kv

        fn = jax.jit(prefill, donate_argnums=(2,))
        ids = jnp.zeros((1, l), jnp.int32)
        cache = make_cache(cfg, 1, jnp.bfloat16)
        print(f"compile L={l} ...", flush=True)
        logits, cache = fn(qparams, ids, cache)
        float(jnp.sum(logits))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            logits, cache = fn(qparams, ids, cache)
        float(jnp.sum(logits))
        dt = (time.perf_counter() - t0) / reps
        flops = 2 * 6.61e9 * l  # ~6.6B matmul params
        results[f"prefill_L{l}"] = {
            "ms": dt * 1e3,
            "tok_s": l / dt,
            "TF_s": flops / dt / 1e12,
        }
        print(f"  L={l}: {dt*1e3:.1f} ms ({l/dt:.0f} tok/s, {flops/dt/1e12:.0f} TF/s)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
