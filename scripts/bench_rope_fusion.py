"""Same-process A/B of the fused-rope q/k prefill GEMMs (7B, L=2048).

The rope elementwise pass costs 9.7 ms in-situ (scripts/bench_prefill_glue),
but the fused kernel's VMEM trim (bm 512->256) can slow the q/k GEMMs — this
measures the net, plus block-config variants for the rope calls only.

Run: nohup python scripts/bench_rope_fusion.py > /tmp/rope_fusion.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import flexq_tpu.models.quantized as Q
from flexq_tpu.config import QuantPolicy
from flexq_tpu.serve.engine import prefill_mask

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import MAX_LEN, make_cache, synth_llama7b_quantized  # noqa: E402

L = int(os.environ.get("PARTS_L", "2048"))
REPS = 5


def run_variant(name, cfg, policy, qparams):
    def prefill(params, ids, cache):
        logits, kv = Q.forward_serve(
            params, cfg, policy, ids,
            kv_k=cache[0], kv_v=cache[1], cache_pos=jnp.int32(0),
            mask=prefill_mask(L, MAX_LEN), prefill_bf16=True, last_only=True,
        )
        return logits[:, -1], kv

    fn = jax.jit(prefill, donate_argnums=(2,))
    ids = jnp.zeros((1, L), jnp.int32)
    cache = make_cache(cfg, 1, jnp.bfloat16)
    logits, cache = fn(qparams, ids, cache)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(REPS):
        logits, cache = fn(qparams, ids, cache)
    float(jnp.sum(logits))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:22s}: {dt*1e3:7.1f} ms", flush=True)
    return dt


def main():
    policy = QuantPolicy.llama_flex()
    cfg, qparams = synth_llama7b_quantized(policy)

    variants = [
        ("rope_off", False, None),
        ("rope_on_auto", True, None),          # kernel trim: bm=256
        ("rope_on_512_1024_512", True, (512, 1024, 512)),
        ("rope_on_512_2048_256", True, (512, 2048, 256)),
    ]
    for name, on, blocks in variants:
        Q.FUSED_ROPE_PREFILL = on
        Q.ROPE_GEMM_BLOCKS = blocks
        run_variant(name, cfg, policy, qparams)
    # repeat the head-to-head pair to bound axon drift
    for name, on, blocks in [variants[0], variants[1]]:
        Q.FUSED_ROPE_PREFILL = on
        Q.ROPE_GEMM_BLOCKS = blocks
        run_variant(name + "_rep", cfg, policy, qparams)
    Q.FUSED_ROPE_PREFILL = True
    Q.ROPE_GEMM_BLOCKS = None


if __name__ == "__main__":
    main()
