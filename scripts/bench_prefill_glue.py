"""Fine-grained glue breakdown of 7B prefill at L=2048 (round-5 follow-up to
scripts/bench_prefill_parts.py, which lumped norms+rope+KV-writes+residuals
into one 18.6 ms "glue" bucket).

Same differential methodology: time the REAL e2e prefill graph with one glue
component no-op'ed at trace time; the delta vs full is that component's
in-situ cost (isolated micro-benchmarks of these ops disagree with e2e
arithmetic on axon — see CLAUDE.md timing notes).

Variants:
  full         the shipping prefill (GLU-fused FFN, last_only head)
  no_rope      apply_rope -> identity                 (rope cost)
  no_kvwrite   cache writes skipped (attn reads the stale cache; same
               flash-prefill work)                    (KV-write cost)
  no_residual  both residual adds dropped             (residual-add cost)
  no_norm      rmsnorm -> gamma-scale only (keeps dtype/shape, kills the
               reduction)                             (norm cost)
  none         all four off                           (additivity check)

Run: nohup python scripts/bench_prefill_glue.py > /tmp/prefill_glue.log 2>&1 &
"""

import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import flexq_tpu.models.llama as Lm
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
    print(f"{name:12s}: {dt*1e3:7.1f} ms", flush=True)
    return dt


@contextlib.contextmanager
def patched(no_rope=False, no_kvwrite=False, no_residual=False, no_norm=False):
    saves = {}

    def save(mod, attr, new):
        saves[(mod, attr)] = getattr(mod, attr)
        setattr(mod, attr, new)

    if no_rope:
        # keep the dtype casts (rope outputs q.dtype), kill the rotation math
        save(Lm, "apply_rope", lambda q, k, cos, sin: (q, k))
        # quantized.py imported the symbol at module load
        save(Q, "apply_rope", lambda q, k, cos, sin: (q, k))
    if no_kvwrite:
        orig_kv = Q._kv_write_read

        def kv_skip(kv, k, v, cache_pos, dtype):
            # view over the STALE buffers (orig_kv's view references the
            # updated arrays, which would keep the writes live); kv's last
            # element is the layer index
            li = kv[-1]
            if len(kv) == 3:
                view = ("cache", kv[0], kv[1], li)
            else:
                view = ("quant", kv[0], kv[2], kv[1], kv[3], li)
            return kv[:-1], view

        save(Q, "_kv_write_read", kv_skip)
    if no_norm:
        save(Lm, "rmsnorm", lambda x, g, eps: x * g)
        save(Q, "rmsnorm", lambda x, g, eps: x * g)
    if no_residual:
        orig_layer = Q.llama_layer_serve_prefill

        def layer_no_res(lp, cfg2, x, cos, sin, mask, kv=None, cache_pos=None,
                         tp_axis=None, lengths=None):
            # identical to the real layer but the two `x2 + o`/`x2 + down`
            # adds become passthroughs: replay via a shim that zeroes x2's
            # contribution is NOT shape-safe, so re-run the real layer and
            # subtract is impossible — instead patch jnp-level add by
            # routing through the real layer with adds disabled:
            return _layer_prefill_nores(lp, cfg2, x, cos, sin, mask, kv,
                                        cache_pos, tp_axis, lengths)

        save(Q, "llama_layer_serve_prefill", layer_no_res)
    try:
        yield
    finally:
        for (mod, attr), old in saves.items():
            setattr(mod, attr, old)


def _layer_prefill_nores(lp, cfg, x, cos, sin, mask, kv, cache_pos,
                         tp_axis, lengths):
    """Copy of llama_layer_serve_prefill with residual adds dropped
    (attention/FFN outputs REPLACE the stream instead of adding)."""
    rmsnorm = Lm.rmsnorm
    b, l, hidden = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * l, hidden)
    h = rmsnorm(x2, lp["input_norm"], cfg.norm_eps)
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    q = Q._qlinear_bf16(lp["q_proj"], h, dtype, nq).reshape(
        b, l, cfg.num_heads, cfg.head_dim)
    k = Q._qlinear_bf16(lp["k_proj"], h, dtype, nkv).reshape(
        b, l, cfg.num_kv_heads, cfg.head_dim)
    v = Q._qlinear_bf16(lp["v_proj"], h, dtype, nkv).reshape(
        b, l, cfg.num_kv_heads, cfg.head_dim)
    q, k = Q.apply_rope(q, k, cos, sin)
    new_kv = None
    if kv is not None:
        new_kv, kv_view = Q._kv_write_read(kv, k, v, cache_pos, dtype)
    else:
        kv_view = ("dense", k, v)
    attn = Q._attend(q, kv_view, mask, cfg.num_kv_groups, lengths)
    x2 = Q._qlinear_bf16(lp["o_proj"], attn.reshape(b * l, nq), dtype, hidden)
    h = rmsnorm(x2, lp["post_norm"], cfg.norm_eps)
    gq, uq = lp["gate_proj"], lp["up_proj"]
    from flexq_tpu.kernels.w6_matmul import w6_glu_matmul_bf16
    act = w6_glu_matmul_bf16(
        h, gq["hi"], gq["lo"], gq["scale"], uq["hi"], uq["lo"], uq["scale"],
        act="silu", out_dtype=dtype,
    )
    x2 = Q._qlinear_bf16(lp["down_proj"], act, dtype, hidden)
    return x2.reshape(b, l, hidden), new_kv


def main():
    # Measure the UNFUSED decomposition: with the fused-rope prefill (round 5
    # default) the shipping path never calls apply_rope, so the no_rope
    # variant would be a no-op and no_residual's hand-copied layer (which
    # uses the apply_rope path) would conflate residual cost with the
    # fusion difference. The recorded numbers in BENCH_PREFILL.md are the
    # unfused-path decomposition.
    Q.FUSED_ROPE_PREFILL = False
    policy = QuantPolicy.llama_flex()
    cfg, qparams = synth_llama7b_quantized(policy)

    results = {}
    results["full"] = run_variant("full", cfg, policy, qparams)
    for name, kw in [
        ("no_rope", dict(no_rope=True)),
        ("no_kvwrite", dict(no_kvwrite=True)),
        ("no_residual", dict(no_residual=True)),
        ("no_norm", dict(no_norm=True)),
        ("none", dict(no_rope=True, no_kvwrite=True, no_residual=True,
                      no_norm=True)),
    ]:
        with patched(**kw):
            results[name] = run_variant(name, cfg, policy, qparams)

    full = results["full"]
    print("\n--- glue component costs (full - variant) ---", flush=True)
    for k, v in results.items():
        if k != "full":
            print(f"{k:12s}: {1e3*(full - v):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
