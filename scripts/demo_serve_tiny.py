"""End-to-end serving demo on REAL trained weights: HF dir -> packed W6A6
export -> load_packed -> Engine fused decode loop -> detokenized text.

This is the full production chain (reference: quantize + FT weight convert +
engine serve) exercised on the in-env-trained 32M model, producing actual
language continuations — the qualitative counterpart of ACCURACY_GATE.md.

Usage (after scripts/train_tiny.py + scripts/export_tiny_hf.py):
  python scripts/demo_serve_tiny.py [--cpu] [--hf /root/tiny_hf]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf", default="/root/tiny_hf")
    ap.add_argument("--packed", default="/root/tiny_packed")
    ap.add_argument("--wbits", type=int, default=6)
    ap.add_argument("--abits", type=int, default=6)
    ap.add_argument("--new-tokens", type=int, default=96)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from transformers import PreTrainedTokenizerFast

    from flexq_tpu.export.exporter import export_checkpoint, load_packed
    from flexq_tpu.serve.engine import Engine

    if not os.path.exists(os.path.join(args.packed, "meta.json")):
        export_checkpoint(
            args.hf, args.packed, policy_name="llama_flex",
            wbits=args.wbits, abits=args.abits,
        )
        print(f"packed export -> {args.packed}", flush=True)

    cfg, policy, qparams = load_packed(args.packed)
    tok = PreTrainedTokenizerFast(
        tokenizer_file=os.path.join(args.hf, "tokenizer.json")
    )

    # prompts: openings of held-out test documents (never trained on)
    text = open(os.path.join(REPO, "data_tiny", "test.txt")).read()
    docs = [d for d in text.split("\n\n") if len(d) > 2000]
    prompts = [docs[i][:300] for i in (0, len(docs) // 2, len(docs) - 1)]
    enc = [tok(p, return_tensors="np").input_ids[0][:64].tolist() for p in prompts]
    plen = min(len(e) for e in enc)
    ids = np.asarray([e[:plen] for e in enc], np.int32)

    eng = Engine(qparams, cfg, policy, max_seq_len=1024, kv_dtype=jnp.bfloat16)
    t0 = time.time()
    # generate() returns ONLY the generated tokens [B, max_new]
    out, stats = eng.generate(
        ids, max_new_tokens=args.new_tokens, eos_id=-1, return_stats=True
    )
    dt = time.time() - t0
    out = np.asarray(out)
    n_new = out.shape[1]
    print(
        f"\n== W{args.wbits}A{args.abits} packed serving: {out.shape[0]} seqs x "
        f"{n_new} new tokens in {dt:.2f}s incl. compile "
        f"({out.shape[0] * n_new / dt:.0f} tok/s) ==",
        flush=True,
    )
    for r in range(out.shape[0]):
        print("\n--- PROMPT ---")
        print(tok.decode(ids[r].tolist())[-300:])
        print(f"--- W{args.wbits}A{args.abits} GREEDY CONTINUATION ---")
        print(tok.decode(out[r].tolist()))


if __name__ == "__main__":
    main()
