"""A/B the prefill KV-cache write cost (found at 32.6 ms of 193 ms by
scripts/bench_prefill_glue.py — ~13x the ~2.5 ms byte roofline of the
1 GB k+v slab writes).

Hypotheses tested e2e (7B, L=2048, bf16 cache):
  base        shipping code: transpose fused into dynamic_update_slice at a
              traced cache_pos
  barrier     optimization_barrier between transpose and DUS (forces the
              relayout to materialize as its own fast op; the DUS then
              writes contiguously)
  const0      cache_pos as a Python literal 0 (prefill's actual value) —
              tests whether index dynamicity alone blocks in-place updates

Run: nohup python scripts/bench_kvwrite_ab.py > /tmp/kvwrite_ab.log 2>&1 &
"""

import contextlib
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


def run_variant(name, cfg, policy, qparams, cache_pos0):
    def prefill(params, ids, cache):
        logits, kv = Q.forward_serve(
            params, cfg, policy, ids,
            kv_k=cache[0], kv_v=cache[1], cache_pos=cache_pos0,
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
    print(f"{name:10s}: {dt*1e3:7.1f} ms", flush=True)
    return dt


@contextlib.contextmanager
def barrier_writes():
    orig = Q._cache_update

    def patched(ck, cv, k, v, li, cache_pos):
        k = k.astype(ck.dtype)
        v = v.astype(cv.dtype)
        if getattr(cache_pos, "ndim", 0) == 0 or not hasattr(cache_pos, "ndim"):
            kt = jax.lax.optimization_barrier(k.transpose(0, 2, 1, 3))[None]
            vt = jax.lax.optimization_barrier(v.transpose(0, 2, 1, 3))[None]
            ck = jax.lax.dynamic_update_slice(ck, kt, (li, 0, 0, cache_pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, vt, (li, 0, 0, cache_pos, 0))
            return ck, cv
        return orig(ck, cv, k, v, li, cache_pos)

    Q._cache_update = patched
    try:
        yield
    finally:
        Q._cache_update = orig


def main():
    policy = QuantPolicy.llama_flex()
    cfg, qparams = synth_llama7b_quantized(policy)

    run_variant("base", cfg, policy, qparams, jnp.int32(0))
    with barrier_writes():
        run_variant("barrier", cfg, policy, qparams, jnp.int32(0))
    run_variant("const0", cfg, policy, qparams, 0)
    with barrier_writes():
        run_variant("bar+const0", cfg, policy, qparams, 0)


if __name__ == "__main__":
    main()
