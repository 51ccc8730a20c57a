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

    def fwd(positions, cache_pos, mask):
        logits, _ = forward_serve(
            qparams, cfg, policy, ids, positions=positions,
            kv_k=ck, kv_v=cv, kv_k_scale=cks, kv_v_scale=cvs,
            cache_pos=cache_pos, mask=mask,
        )
        return logits

    ki = jnp.arange(s)[None, :]
    mask_u = jnp.where(ki <= pos, 0.0, NEG)[None, None]  # [1,1,1,S]
    posv = jnp.full((b,), pos, jnp.int32)
    mask_v = jnp.where(
        jnp.arange(s)[None, None, None, :] <= posv[:, None, None, None],
        0.0, NEG,
    )  # [B,1,1,S]

    variants = {
        "A_scalar_scalar": lambda: fwd(
            jnp.broadcast_to(jnp.int32(pos), (b, 1)), jnp.int32(pos), mask_u
        ),
        "B_vecmask_scalarwrite": lambda: fwd(
            posv[:, None], jnp.int32(pos), mask_v
        ),
        "C_scalarmask_vecwrite": lambda: fwd(
            jnp.broadcast_to(jnp.int32(pos), (b, 1)), posv, mask_u
        ),
        "D_vector_vector": lambda: fwd(posv[:, None], posv, mask_v),
    }
    for name, f in variants.items():
        t = bench_fn(lambda _x: f() + _x * 0, (jnp.float32(0),), iters=30, reps=5)
        print(f"{name}: {t*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
