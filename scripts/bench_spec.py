"""7B speculative-decoding benchmark: verify-window cost + e2e tokens/s.

Two questions:
  1. What does a [1, 1+k] verify forward cost vs a [1, 1] decode step?
     (decode is weight-streaming-bound, so it should be nearly flat in k)
  2. What end-to-end tokens/s does mode="spec" reach vs the plain step loop
     on prompts with n-gram locality (the PLD sweet spot) and without?

Run:  nohup python scripts/bench_spec.py > /tmp/spec.log 2>&1 &
(per-step python dispatch included in all numbers, like bench_e2e7b.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from flexq_tpu.config import QuantPolicy
from flexq_tpu.serve.engine import Engine
from flexq_tpu.serve.speculative import generate_speculative

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import synth_llama7b_quantized  # noqa: E402


def timed_calls(fn, n=30):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    policy = QuantPolicy.llama_flex()
    cfg, qparams = synth_llama7b_quantized(policy)
    eng = Engine(qparams, cfg, policy, max_seq_len=2048, kv_dtype=jnp.bfloat16)
    results = {}

    # --- 1. verify-window cost vs k (pos=384, rewrites the same window) ----
    pos = 384
    cache = eng.new_cache(1)
    ids1 = jnp.asarray(np.full((1, 1), 7, np.int32))
    print("compile step ...", flush=True)
    logits, cache = eng._step_jit(eng.params, ids1, cache, jnp.int32(pos))
    _ = np.asarray(logits)  # force

    def run_step():
        nonlocal cache
        logits, cache = eng._step_jit(eng.params, ids1, cache, jnp.int32(pos))
        _ = int(jnp.argmax(logits[0]))  # comparable tiny fetch

    results["step_ms_c1"] = timed_calls(run_step) * 1e3
    print(f"plain step (c=1): {results['step_ms_c1']:.2f} ms", flush=True)

    for c in (4, 8):
        idsc = jnp.asarray(np.full((1, c), 7, np.int32))
        print(f"compile verify c={c} ...", flush=True)
        tgt, cache = eng._spec_jit(eng.params, idsc, cache, jnp.int32(pos))
        _ = np.asarray(tgt)

        def run_spec():
            nonlocal cache
            tgt, cache = eng._spec_jit(eng.params, idsc, cache, jnp.int32(pos))
            _ = np.asarray(tgt)

        key = f"verify_ms_c{c}"
        results[key] = timed_calls(run_spec) * 1e3
        print(f"verify window c={c}: {results[key]:.2f} ms "
              f"({results[key]/results['step_ms_c1']:.2f}x of a 1-token step)",
              flush=True)
    del cache

    # --- 2. e2e: spec vs plain step loop --------------------------------
    rng = np.random.default_rng(0)
    phrase = rng.integers(100, 32000, 16).tolist()
    prompts = {
        # 128-token prompt of a repeated 16-token phrase: the synthetic
        # model's greedy continuation locks into loops PLD can predict
        "repetitive": phrase * 8,
        "random": rng.integers(100, 32000, 128).tolist(),
    }
    n_new = 256
    for name, prompt in prompts.items():
        t0 = time.perf_counter()
        out_p = eng.generate([prompt], max_new_tokens=n_new, eos_id=-1, mode="step")
        plain_s = time.perf_counter() - t0
        # warm ran the compile; measure again
        t0 = time.perf_counter()
        out_p = eng.generate([prompt], max_new_tokens=n_new, eos_id=-1, mode="step")
        plain_s = time.perf_counter() - t0

        # k=3/7 -> window c=4/8: shares the part-1 compiled graphs (a new
        # window shape costs a full 32-layer recompile on the axon tunnel)
        for k in (3, 7):
            out_s, stats = generate_speculative(
                eng, [prompt], max_new_tokens=n_new, k=k, eos_id=-1,
                return_stats=True,
            )
            assert out_s[0] == out_p[0][: len(out_s[0])], "greedy mismatch!"
            spec_s = stats.decode_s
            key = f"e2e_{name}_k{k}"
            results[key] = {
                "plain_tok_s": len(out_p[0]) / plain_s,
                "spec_tok_s": stats.generated / spec_s,
                "speedup": (stats.generated / spec_s) / (len(out_p[0]) / plain_s),
                "tok_per_step": round(stats.tokens_per_step, 2),
                "accept_rate": round(stats.acceptance_rate, 2),
            }
            print(f"{key}: {results[key]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
