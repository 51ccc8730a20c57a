"""Bisect the continuous-batching step's 40x slowdown vs the engine step.

Four variants of one 7B W4A8 decode step over a dense int8 cache (B=4):
  A. scalar positions + scalar cache_pos (engine path: dynamic_update_slice)
  B. vector positions + scalar cache_pos (per-row mask/lengths, slice write)
  C. scalar positions + vector cache_pos (uniform mask, per-row KV scatter)
  D. vector positions + vector cache_pos (the scheduler's step)

Run:  nohup python scripts/bench_vector_step.py > /tmp/vecstep.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models.quantized import forward_serve
from flexq_tpu.utils import bench_fn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import synth_llama7b_quantized  # noqa: E402

NEG = jnp.finfo(jnp.float32).min


def main():
    print("devices:", jax.devices(), flush=True)
    policy = QuantPolicy.uniform("llama", wbits=4, abits=8)
    cfg, qparams = synth_llama7b_quantized(policy)
    b, s = 4, 2048
    shape = (cfg.num_layers, b, cfg.num_kv_heads, s, cfg.head_dim)
    rng = np.random.default_rng(0)
    ck = jnp.zeros(shape, jnp.int8)
    cv = jnp.zeros(shape, jnp.int8)
    cks = jnp.zeros(shape[:-1], jnp.float32)
    cvs = jnp.zeros(shape[:-1], jnp.float32)
    ids = jnp.asarray(rng.integers(10, 31000, (b, 1)), jnp.int32)
    pos = 256

    # params/cache passed as ARGS: closure capture would bake gigabytes of
    # constants into the program and break the remote compile (CLAUDE.md)
    def fwd(params, cache, positions, cache_pos, mask):
        logits, _ = forward_serve(
            params, cfg, policy, ids, positions=positions,
            kv_k=cache[0], kv_v=cache[1], kv_k_scale=cache[2],
            kv_v_scale=cache[3], cache_pos=cache_pos, mask=mask,
        )
        return logits

    ki = jnp.arange(s)[None, :]
    mask_u = jnp.where(ki <= pos, 0.0, NEG)[None, None]  # [1,1,1,S]
    posv = jnp.full((b,), pos, jnp.int32)
    mask_v = jnp.where(
        jnp.arange(s)[None, None, None, :] <= posv[:, None, None, None],
        0.0, NEG,
    )  # [B,1,1,S]

    import time

    fwd_jit = jax.jit(fwd)
    variants = {
        "A_scalar_scalar": (
            jnp.broadcast_to(jnp.int32(pos), (b, 1)), jnp.int32(pos), mask_u
        ),
        "B_vecmask_scalarwrite": (posv[:, None], jnp.int32(pos), mask_v),
        "C_scalarmask_vecwrite": (
            jnp.broadcast_to(jnp.int32(pos), (b, 1)), posv, mask_u
        ),
        "D_vector_vector": (posv[:, None], posv, mask_v),
    }
    # per-call wall time with a value fetch (fine at the 6-230ms signal
    # scale; the in-graph-loop harness's giant programs crash the remote
    # compile service on this model size)
    cache = (ck, cv, cks, cvs)
    for name, args in variants.items():
        float(jnp.max(fwd_jit(qparams, cache, *args)))  # compile + warm
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(jnp.max(fwd_jit(qparams, cache, *args)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: {ts[len(ts)//2]*1e3:.2f} ms/step (min {ts[0]*1e3:.2f})",
              flush=True)


if __name__ == "__main__":
    main()
