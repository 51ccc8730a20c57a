"""Train the tiny accuracy-gate model from scratch on the in-env corpus.

Usage (TPU, background):
  nohup python scripts/train_tiny.py --out-dir /root/ckpt_tiny \
      > /tmp/train_tiny.log 2>&1 &

Produces:
  data_tiny/            corpus splits + tokenizer.json + token streams
  <out-dir>/best.npz    best-val checkpoint (+ .json meta)
  <out-dir>/final.npz   last-step checkpoint
  <out-dir>/history.jsonl  step/loss/val curves

The model is deliberately shaped for the packed kernels: every linear K/N is
a multiple of 128 (pack6 K-tile), vocab 8192 works with the quantized head,
GQA (8 heads / 4 kv) exercises the grouped paths.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prepare_data(corpus_dir: str, vocab_size: int):
    from flexq_tpu.train.corpus import build_corpus, train_tokenizer, encode_file

    if not os.path.exists(os.path.join(corpus_dir, "train.txt")):
        m = build_corpus(corpus_dir)
        print(f"corpus: {m['n_docs']} docs, {m['bytes']/1e6:.1f} MB", flush=True)
    tok_path = os.path.join(corpus_dir, "tokenizer.json")
    if not os.path.exists(tok_path):
        train_tokenizer(corpus_dir, vocab_size=vocab_size)
        print("tokenizer trained", flush=True)
    for split in ("train", "val", "test"):
        npy = os.path.join(corpus_dir, f"{split}.npy")
        if not os.path.exists(npy):
            n = encode_file(tok_path, os.path.join(corpus_dir, f"{split}.txt"), npy)
            print(f"{split}: {n} tokens", flush=True)
    return {
        s: np.load(os.path.join(corpus_dir, f"{s}.npy")) for s in ("train", "val", "test")
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-dir", default=os.path.join(REPO, "data_tiny"))
    ap.add_argument("--out-dir", default="/root/ckpt_tiny")
    ap.add_argument("--steps", type=int, default=24000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--inter", type=int, default=1408)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--max-minutes", type=float, default=70.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flexq_tpu.config import ModelConfig
    from flexq_tpu.train.trainer import (
        TrainConfig,
        batch_iterator,
        init_params,
        loss_fn,
        make_optimizer,
        save_checkpoint,
        windows_from_stream,
    )

    data = prepare_data(args.corpus_dir, args.vocab)
    print({k: v.size for k, v in data.items()}, flush=True)

    cfg = ModelConfig.llama(
        vocab_size=args.vocab,
        hidden_size=args.hidden,
        intermediate_size=args.inter,
        num_layers=args.layers,
        num_heads=args.heads,
        num_kv_heads=args.kv_heads,
        max_seq_len=max(2048, args.seq),
        rope_theta=10000.0,
    )
    tc = TrainConfig(
        batch_size=args.batch, seq_len=args.seq, lr=args.lr, total_steps=args.steps
    )
    params = init_params(cfg, seed=0)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.1f}M params", flush=True)

    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, ids)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_loss_fn(params, ids):
        return loss_fn(params, cfg, ids)

    val_windows = windows_from_stream(data["val"], args.seq)[:32]
    vb = 8
    val_batches = [
        jnp.asarray(val_windows[i : i + vb])
        for i in range(0, len(val_windows) - len(val_windows) % vb, vb)
    ]

    def eval_val(params):
        return float(np.mean([float(val_loss_fn(params, b)) for b in val_batches]))

    os.makedirs(args.out_dir, exist_ok=True)
    hist = open(os.path.join(args.out_dir, "history.jsonl"), "a")
    it = batch_iterator(data["train"], tc, seed=1)
    best_val = float("inf")
    t0 = time.time()
    deadline = t0 + args.max_minutes * 60
    ema = None
    for step in range(1, args.steps + 1):
        ids = jnp.asarray(next(it))
        params, opt_state, loss = step_fn(params, opt_state, ids)
        if step % 50 == 0:
            l = float(loss)  # sync
            ema = l if ema is None else 0.9 * ema + 0.1 * l
            if step % args.eval_every == 0 or step == args.steps:
                vl = eval_val(params)
                rec = {
                    "step": step,
                    "loss": round(l, 4),
                    "ema": round(ema, 4),
                    "val_loss": round(vl, 4),
                    "val_ppl": round(float(np.exp(vl)), 3),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                print(json.dumps(rec), flush=True)
                hist.write(json.dumps(rec) + "\n")
                hist.flush()
                if vl < best_val:
                    best_val = vl
                    save_checkpoint(
                        os.path.join(args.out_dir, "best.npz"),
                        params,
                        cfg,
                        step,
                        extra={"val_loss": vl, "val_ppl": float(np.exp(vl))},
                    )
                if time.time() > deadline:
                    print("time budget reached", flush=True)
                    break

    save_checkpoint(
        os.path.join(args.out_dir, "final.npz"), params, cfg, step,
        extra={"val_loss": eval_val(params)},
    )
    print(f"done: best val ppl {np.exp(best_val):.3f}", flush=True)


if __name__ == "__main__":
    main()
