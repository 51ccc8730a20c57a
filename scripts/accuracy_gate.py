"""The full accuracy acceptance gate on REAL trained weights (VERDICT r3 #1).

Reference flow (algorithm/main.py:96-121, README.md:14 "ppl increase
<=0.1"): fp ppl vs fake-quant ppl on held-out text, on weights with real
linguistic structure. This environment ships no pretrained weights, so the
model is the in-env-trained 32M-param LLaMA (scripts/train_tiny.py,
data_tiny corpus; best-val checkpoint) — and the gate then goes FURTHER than
the reference's: it also proves the PACKED SERVING PATH (pack6/pack4 planes
+ Pallas kernels) reproduces the fake-quant oracle's perplexity, measures
zero-shot task accuracy deltas on tasks built from the held-out split, and
re-measures oracle greedy-decode parity on trained weights (round 3 could
only use random weights, where near-tie argmax noise capped agreement at
96.9%).

Phases (one TPU process; the 32M model keeps everything resident):
  1. f32 ppl on data_tiny/test.npy (512-token windows, eval/ppl.py).
  2. Fake-quant ppl per policy: W6A8 flex, W6A6 flex, W4A8 flex, W8A8.
  3. Packed-path ppl (quantize_params + forward_serve) for W6A8/W4A8 —
     must match the fake-quant oracle closely (same quant grid; f32-accum
     rounding is the only difference).
  4. Zero-shot tasks from held-out text: 4-way continuation MC (ctx 128,
     cont 32) and next-token top-1 — f32 vs packed.
  5. Greedy-decode oracle parity over 256 steps (f32 vs packed), same
     compilation mode both sides (fixed-shape full-forward; CLAUDE.md
     eager-vs-jit argmax-flip gotcha).

Writes ACCURACY_GATE.md + prints one JSON line per result.

Usage (TPU):
  nohup python scripts/accuracy_gate.py > /tmp/acc_gate.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(REPO, "ckpt_tiny", "best.npz"))
    ap.add_argument("--data", default=os.path.join(REPO, "data_tiny"))
    ap.add_argument("--out", default=os.path.join(REPO, "ACCURACY_GATE.md"))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--mc-items", type=int, default=200)
    ap.add_argument("--nt-items", type=int, default=512)
    ap.add_argument("--oracle-steps", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-windows", type=int, default=0, help="debug cap")
    ap.add_argument("--skip-ppl", action="store_true",
                    help="reuse ppl results from the existing report's Raw line")
    ap.add_argument("--skip-tasks", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from flexq_tpu.config import QuantPolicy
    from flexq_tpu.eval.ppl import perplexity
    from flexq_tpu.models.llama import fake_quant_weights, forward
    from flexq_tpu.models.quantized import forward_serve, quantize_params
    from flexq_tpu.train.trainer import load_checkpoint, windows_from_stream

    results = {}
    if (args.skip_ppl or args.skip_tasks) and os.path.exists(args.out):
        for line in open(args.out):
            if line.startswith("Raw: "):
                results.update(json.loads(line[5:]))

    def rec(name, value):
        results[name] = value
        print(json.dumps({name: value}), flush=True)

    params, cfg, meta = load_checkpoint(args.ckpt)
    rec("ckpt_step", meta["step"])
    rec("ckpt_val_ppl", round(meta.get("val_ppl", 0.0), 3))

    test = np.load(os.path.join(args.data, "test.npy"))
    windows = windows_from_stream(test, args.seq)
    if args.max_windows:
        windows = windows[: args.max_windows]
    rec("test_tokens", int(windows.size))

    # ---- 1. f32 baseline ppl --------------------------------------------
    fwd32 = lambda p, ids: forward(p, cfg, ids)
    if not args.skip_ppl:
        t0 = time.time()
        ppl32 = perplexity(fwd32, windows, batch_size=args.batch, params=params)
        rec("ppl_f32", round(ppl32, 4))
        rec("ppl_f32_seconds", round(time.time() - t0, 1))
    else:
        ppl32 = results["ppl_f32"]

    # ---- 2. fake-quant ppl per policy -----------------------------------
    policies = {
        "w6a8_flex": QuantPolicy.llama_flex(wbits=6, abits=8),
        "w6a6_flex": QuantPolicy.llama_flex(wbits=6, abits=6),
        "w4a8_flex": QuantPolicy.llama_flex(wbits=4, abits=8),
        "w8a8": QuantPolicy.uniform("llama", wbits=8, abits=8),
    }
    fake_ppl = {}
    for name, pol in policies.items():
        if args.skip_ppl:
            fake_ppl[name] = results[f"ppl_fake_{name}"]
            continue
        fparams = fake_quant_weights(params, pol)
        ffwd = lambda fp, ids, p=pol: forward(fp, cfg, ids, policy=p)
        fake_ppl[name] = perplexity(ffwd, windows, batch_size=args.batch,
                                    params=fparams)
        rec(f"ppl_fake_{name}", round(fake_ppl[name], 4))
        rec(f"dppl_{name}", round(fake_ppl[name] - ppl32, 4))

    # ---- 3. packed serving-path ppl -------------------------------------
    packed = {}
    packed_ppl = {}
    for name in ("w6a8_flex", "w6a6_flex", "w4a8_flex"):
        pol = policies[name]
        packed[name] = (quantize_params(params, cfg, pol, dtype=jnp.float32), pol)
        if args.skip_ppl:
            continue
        qp, pol = packed[name]
        qfwd = lambda q, ids, p=pol: forward_serve(q, cfg, p, ids)[0]
        packed_ppl[name] = perplexity(qfwd, windows, batch_size=args.batch,
                                      params=qp)
        rec(f"ppl_packed_{name}", round(packed_ppl[name], 4))
        rec(
            f"packed_vs_fake_{name}_relerr",
            round(abs(packed_ppl[name] - fake_ppl[name]) / fake_ppl[name], 6),
        )

    # ---- 4. zero-shot tasks from the held-out split ----------------------
    # 4a. 4-way continuation multiple choice: score = sum logprob of the
    # continuation tokens given context (the MC engine's raw-loglikelihood
    # scoring, eval/zeroshot.py); distractors are real continuations from
    # elsewhere in the held-out stream. Random = 25%.
    rng = np.random.default_rng(7)
    ctx_len, cont_len, n_choices = 128, 32, 4
    total = ctx_len + cont_len
    n_pos = test.size - total - 1
    items = []
    for _ in range(args.mc_items):
        p = int(rng.integers(0, n_pos))
        ctx = test[p : p + ctx_len]
        true = test[p + ctx_len : p + total]
        conts = [true]
        while len(conts) < n_choices:
            d = int(rng.integers(0, n_pos))
            if abs(d - p) < total:
                continue
            conts.append(test[d + ctx_len : d + total])
        order = rng.permutation(n_choices)
        items.append((ctx, [conts[i] for i in order], int(np.argmax(order == 0))))

    def mc_accuracy(p_tree, logits_fn):
        # one batched program: [n_choices, total] ids per item; the param
        # tree rides as a jit ARGUMENT (constant-baking breaks the remote
        # compile service — CLAUDE.md gotcha)
        @jax.jit
        def score(pt, ids):  # [C, total] -> [C] sum logprob of cont tokens
            logits = logits_fn(pt, ids)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            tgt = ids[:, 1:]
            pick = jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), -1)[..., 0]
            return pick[:, ctx_len - 1 :].sum(-1)

        hits = 0
        for ctx, conts, label in items:
            ids = jnp.asarray(
                np.stack([np.concatenate([ctx, c]) for c in conts]).astype(np.int32)
            )
            hits += int(np.argmax(np.asarray(score(p_tree, ids))) == label)
        return hits / len(items)

    # 4b. next-token top-1 on held-out positions (ctx 64)
    nt_ctx = 64
    nt_pos = rng.integers(0, test.size - nt_ctx - 2, args.nt_items)
    nt_ids = np.stack([test[p : p + nt_ctx + 1] for p in nt_pos]).astype(np.int32)

    def nt_accuracy(p_tree, logits_fn):
        @jax.jit
        def top1(pt, ids):  # [B, nt_ctx+1]
            logits = logits_fn(pt, ids)
            return jnp.argmax(logits[:, nt_ctx - 1], -1) == ids[:, nt_ctx]

        hits = 0
        for i in range(0, len(nt_ids), args.batch):
            hits += int(
                np.asarray(top1(p_tree, jnp.asarray(nt_ids[i : i + args.batch]))).sum()
            )
        return hits / len(nt_ids)

    evals = {"f32": (params, lambda pt, ids: forward(pt, cfg, ids))}
    for name in ("w6a8_flex", "w6a6_flex", "w4a8_flex"):
        qp, pol = packed[name]
        evals[f"packed_{name}"] = (
            qp, lambda pt, ids, p=pol: forward_serve(pt, cfg, p, ids)[0]
        )
    for ev_name, (pt, fn) in evals.items():
        if args.skip_tasks:
            continue
        rec(f"task_mc4_{ev_name}", round(mc_accuracy(pt, fn), 4))
        rec(f"task_nexttok_{ev_name}", round(nt_accuracy(pt, fn), 4))

    # ---- 5. greedy-decode oracle parity on trained weights ---------------
    # The f32 oracle free-runs a greedy rollout; each packed path is then
    # scored TEACHER-FORCED on the oracle's prefixes (one fixed-shape
    # forward, jit both sides — CLAUDE.md eager-vs-jit argmax gotcha). A
    # free-running comparison conflates ONE near-tie flip with everything
    # after it (different contexts -> chance-level agreement; measured
    # 0.39 on TPU while per-step fidelity was fine), so per-step argmax
    # fidelity on identical prefixes is the meaningful metric — and is the
    # form the reference's acceptance implies (same inputs, same outputs).
    plen = 64
    buflen = plen + args.oracle_steps
    prompt = test[:plen].astype(np.int32)

    @jax.jit
    def f32_step(pt, ids, pos):
        return forward(pt, cfg, ids)[0, pos]

    buf = np.zeros((1, buflen), np.int32)
    buf[0, :plen] = prompt
    for t in range(args.oracle_steps - 1):
        row = np.asarray(f32_step(params, jnp.asarray(buf), plen + t - 1))
        buf[0, plen + t] = int(row.argmax())

    ids_full = jnp.asarray(buf)
    pos_lo, pos_hi = plen - 1, buflen - 1  # positions whose argmax we score

    @jax.jit
    def f32_rows(pt, ids):
        return forward(pt, cfg, ids)[0, pos_lo:pos_hi]

    oracle_logits = np.asarray(f32_rows(params, ids_full))
    oracle_toks = oracle_logits.argmax(-1)
    for name in ("w6a8_flex", "w6a6_flex", "w4a8_flex"):
        qp, pol = packed[name]

        @jax.jit
        def q_rows(pt, ids, p=pol):
            return forward_serve(pt, cfg, p, ids)[0][0, pos_lo:pos_hi]

        logits = np.asarray(q_rows(qp, ids_full))
        agree = float((logits.argmax(-1) == oracle_toks).mean())
        rmse = float(np.sqrt(np.mean((logits - oracle_logits) ** 2)))
        rel = rmse / float(oracle_logits.std())
        rec(f"oracle_agree_{name}", round(agree, 4))
        rec(f"oracle_logit_rmse_over_std_{name}", round(rel, 4))

    # ---- report ----------------------------------------------------------
    L = []
    L.append("# Accuracy gate on trained weights (VERDICT r3 #1)")
    L.append("")
    L.append(
        f"Model: 32M-param LLaMA-shape (h512/i1408/8L/8H/4KV, vocab 8192), "
        f"trained from scratch on the in-env corpus (data_tiny, 17M train "
        f"tokens; unit-level held-out splits). Checkpoint: step "
        f"{results['ckpt_step']}, val ppl {results['ckpt_val_ppl']}. "
        f"Eval: {results['test_tokens']} held-out TEST tokens, 512-token "
        f"windows (reference algorithm/main.py:96-121 accounting via "
        f"eval/ppl.py). Hardware: TPU v5e unless --cpu."
    )
    L.append("")
    L.append("## Perplexity: f32 vs fake-quant vs PACKED serving path")
    L.append("")
    L.append("| policy | fake-quant ppl | Δppl vs f32 | packed-path ppl | packed vs fake rel err |")
    L.append("|---|---|---|---|---|")
    L.append(f"| f32 baseline | {results['ppl_f32']} | — | — | — |")
    for name in policies:
        pk = results.get(f"ppl_packed_{name}", "—")
        re_ = results.get(f"packed_vs_fake_{name}_relerr", "—")
        L.append(
            f"| {name} | {results[f'ppl_fake_{name}']} | "
            f"{results[f'dppl_{name}']:+} | {pk} | {re_} |"
        )
    L.append("")
    L.append("## Zero-shot tasks from held-out text")
    L.append("")
    L.append(
        f"mc4: {args.mc_items}-item 4-way continuation MC (ctx {ctx_len}, "
        f"cont {cont_len}; random=0.25). nexttok: top-1 next-token over "
        f"{args.nt_items} held-out positions (ctx {nt_ctx})."
    )
    L.append("")
    L.append("| path | mc4 acc | next-token acc |")
    L.append("|---|---|---|")
    for ev_name in evals:
        L.append(
            f"| {ev_name} | {results[f'task_mc4_{ev_name}']} | "
            f"{results[f'task_nexttok_{ev_name}']} |"
        )
    L.append("")
    L.append(
        f"## Oracle parity: teacher-forced over a {args.oracle_steps}-step "
        "f32 greedy rollout (trained weights)"
    )
    L.append("")
    L.append("| policy | token agreement | logit RMSE / logit std |")
    L.append("|---|---|---|")
    for name in ("w6a8_flex", "w6a6_flex", "w4a8_flex"):
        L.append(
            f"| {name} | {results[f'oracle_agree_{name}']} | "
            f"{results[f'oracle_logit_rmse_over_std_{name}']} |"
        )
    L.append("")
    L.append("Raw: " + json.dumps(results))
    with open(args.out, "w") as f:
        f.write("\n".join(L) + "\n")
    print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
