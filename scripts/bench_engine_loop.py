"""Engine-level 7B decode throughput: fused on-device loop vs stepwise.

The fused lax.while_loop decode (engine._decode_loop) removes the per-token
python dispatch that scripts/bench_e2e7b.py's numbers include — this script
measures the real serving throughput.

Run:  nohup python scripts/bench_engine_loop.py > /tmp/loop.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import QuantPolicy
from flexq_tpu.serve.engine import Engine
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import synth_llama7b_quantized, synth_opt_quantized  # noqa: E402



def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    is_opt = os.environ.get("FLEXQ_BENCH_MODEL", "7b").startswith("opt")
    arch = "opt" if is_opt else "llama"
    wbits = os.environ.get("FLEXQ_BENCH_WBITS")
    if wbits == "4":
        policy = QuantPolicy.uniform(arch, wbits=4, abits=8)
        print("policy: uniform W4A8", flush=True)
    elif is_opt:
        # reference OPT sensitivity policy: q/k/v acts 8-bit (int_opt_layer)
        policy = QuantPolicy.opt_flex()
        print("policy: opt_flex W6", flush=True)
    else:
        policy = QuantPolicy.llama_flex()
    head_bits = int(os.environ.get("FLEXQ_BENCH_HEAD", "0"))
    if head_bits:  # packed vocab GEMM (QuantPolicy.with_head)
        policy = policy.with_head(head_bits, abits=8)
        print(f"lm_head quantized at W{head_bits}", flush=True)
    if is_opt:
        cfg, qparams = synth_opt_quantized(policy)
    else:
        cfg, qparams = synth_llama7b_quantized(policy)
    results = {}
    kv_kinds = ((jnp.bfloat16, "bf16"), (jnp.int8, "int8"))
    if os.environ.get("FLEXQ_BENCH_KV") == "int8":
        # 13B: bf16 B=4 caches + W6 weights exceed the 16 GB chip
        kv_kinds = ((jnp.int8, "int8"),)
    for kv_dtype, tag in kv_kinds:
        eng = Engine(qparams, cfg, policy, max_seq_len=2048, kv_dtype=kv_dtype)
        for b in (1, 4):
            prompts = [[1] * 128 for _ in range(b)]
            n_new = 256
            # warm with the SAME max_new (it is a static arg of the fused
            # loop — a different value would compile a second program)
            print(f"compile {tag} B{b} ...", flush=True)
            out, stats = eng.generate(
                prompts, max_new_tokens=n_new, eos_id=-1, return_stats=True
            )
            t0 = time.perf_counter()
            out, stats = eng.generate(
                prompts, max_new_tokens=n_new, eos_id=-1, return_stats=True
            )
            dt = time.perf_counter() - t0
            toks = sum(len(r) for r in out)
            key = f"loop_{tag}_B{b}"
            results[key] = {
                "ms_per_step": stats.decode_s / n_new * 1e3,
                "tok_s": toks / stats.decode_s,
                "ttft_s": stats.ttft_s,
                "wall_s": dt,
            }
            print(f"  {key}: {results[key]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
