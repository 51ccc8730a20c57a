"""Top-level quantize-and-evaluate CLI (reference algorithm/main.py parity).

The reference's primary interface is
    python main.py --model <hf> --wbits 6 --abits 6 --w_group_size 128
        --a_group_size 128 --flex_linear_quant --symmetric --eval_ppl
        --tasks piqa,arc_easy ...
(algorithm/main.py:165-204, README.md:112-118). This module is its
TPU-native twin:

    python -m flexq_tpu.main --model <hf-dir> --wbits 6 --abits 6 \
        --flex_linear_quant --eval_ppl --ppl-data <wikitext2-dir> \
        --tasks piqa --task-data-root <dir> [--smooth] [--export <out>]

Differences by design: quantization policy comes from the preset system
(per-linear bits, the reference's hardcoded sensitivity result), `--smooth`
applies the SmoothQuant-style folds before quantization (the reference
ships the transforms unused), and `--export` writes the packed serving
checkpoint (filling the reference's missing-exporter gap, SURVEY.md §2.6).
Dataset paths are explicit because this environment is offline.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

log = logging.getLogger("flexq_tpu")


def build_policy(args):
    from flexq_tpu.config import QuantPolicy

    if args.wbits >= 16:
        return QuantPolicy.fp16(args.arch)
    if args.flex_linear_quant:
        if args.arch == "opt":
            return QuantPolicy.opt_flex(args.wbits, args.abits)
        return QuantPolicy.llama_flex(args.wbits, args.abits)
    return QuantPolicy.uniform(args.arch, args.wbits, args.abits)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="HF model directory")
    ap.add_argument("--arch", default="llama", choices=["llama", "opt"])
    ap.add_argument("--wbits", type=int, default=6)
    ap.add_argument("--abits", type=int, default=6)
    ap.add_argument("--flex_linear_quant", action="store_true",
                    help="per-architecture sensitivity policy (reference default)")
    ap.add_argument("--w_group_size", type=int, default=128)
    ap.add_argument("--a_group_size", type=int, default=128)
    ap.add_argument("--asymmetric", action="store_true",
                    help="asymmetric quantization (reference --symmetric default here)")
    ap.add_argument("--smooth", action="store_true",
                    help="SmoothQuant-style folds before quantization")
    ap.add_argument("--smooth-alpha", type=float, default=0.5)
    ap.add_argument("--calib-samples", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--eval_ppl", action="store_true")
    ap.add_argument("--ppl-data", default=None,
                    help="datasets.save_to_disk dir for wikitext2")
    ap.add_argument("--tasks", default="",
                    help="comma list: piqa,arc_easy,arc_challenge,boolq,...")
    ap.add_argument("--task-data-root", default=None,
                    help="root dir holding <task>/ dataset dirs")
    ap.add_argument("--export", default=None, help="write packed checkpoint dir")
    ap.add_argument("--seed", type=int, default=2, help="(reference main.py:205)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    np.random.seed(args.seed)
    import jax.numpy as jnp
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from flexq_tpu.models import config_from_hf, from_hf_llama, from_hf_opt

    log.info("loading %s", args.model)
    model = AutoModelForCausalLM.from_pretrained(args.model)
    tokenizer = AutoTokenizer.from_pretrained(args.model, use_fast=True)
    cfg = config_from_hf(model.config)
    loader = from_hf_opt if args.arch == "opt" else from_hf_llama
    params = loader(model, dtype=jnp.float32)
    del model

    import dataclasses as _dc

    policy = build_policy(args)
    policy = _dc.replace(
        policy,
        w_group_size=args.w_group_size,
        a_group_size=args.a_group_size,
        symmetric=not args.asymmetric,
    )
    results = {"model": args.model, "wbits": args.wbits, "abits": args.abits}

    if args.smooth:
        from flexq_tpu.quant.smooth import (
            collect_llama_act_stats,
            collect_opt_act_stats,
            smooth_llama,
            smooth_opt,
        )

        calib = np.random.randint(
            0, cfg.vocab_size, (1, min(args.seqlen, 512)), dtype=np.int64
        )
        if args.ppl_data:
            from flexq_tpu.eval.data import load_wikitext2_text, calib_samples

            text = load_wikitext2_text(args.ppl_data, split="test")
            calib = calib_samples(
                text, tokenizer, nsamples=args.calib_samples,
                seqlen=min(args.seqlen, 512), seed=args.seed,
            )[:1]
        log.info("smoothing (alpha=%.2f)", args.smooth_alpha)
        if args.arch == "opt":
            stats = collect_opt_act_stats(params, cfg, jnp.asarray(calib))
            params = smooth_opt(params, cfg, stats, alpha=args.smooth_alpha)
        else:
            stats = collect_llama_act_stats(params, cfg, jnp.asarray(calib))
            params = smooth_llama(params, cfg, stats, alpha=args.smooth_alpha)

    # fake-quant weights in place (reference flexqllm orchestrator)
    if args.wbits < 16:
        if args.arch == "opt":
            from flexq_tpu.models.opt import fake_quant_weights
        else:
            from flexq_tpu.models.llama import fake_quant_weights
        qparams = fake_quant_weights(params, policy)
    else:
        qparams = params

    if args.arch == "opt":
        from flexq_tpu.models.opt import forward
    else:
        from flexq_tpu.models.llama import forward

    # params ride as a jit ARGUMENT: closure capture bakes the whole tree
    # into every compiled shape as constants, which multiplies remote-compile
    # time per task-eval shape bucket (measured: 65 s/shape at 32M params)
    _fwd_p = jax.jit(lambda p, ids: forward(p, cfg, ids, policy=policy))
    fwd = lambda ids: _fwd_p(qparams, ids)

    if args.eval_ppl:
        from flexq_tpu.eval.data import load_wikitext2_text, tokenize_eval_ids
        from flexq_tpu.eval.ppl import perplexity

        if not args.ppl_data:
            ap.error("--eval_ppl needs --ppl-data")
        text = load_wikitext2_text(args.ppl_data, split="test")
        windows = tokenize_eval_ids(text, tokenizer, seqlen=args.seqlen)
        ppl = perplexity(fwd, windows)
        results["wikitext2_ppl"] = ppl
        log.info("wikitext2 ppl: %.4f", ppl)

    if args.tasks:
        from flexq_tpu.eval.zeroshot import evaluate_multiple_choice, load_task_items
        import os

        if not args.task_data_root:
            ap.error("--tasks needs --task-data-root")
        task_results = {}
        for task in args.tasks.split(","):
            items = load_task_items(
                task, os.path.join(args.task_data_root, task)
            )
            task_results[task] = evaluate_multiple_choice(fwd, tokenizer, items)
            log.info("%s: %s", task, task_results[task])
        results["tasks"] = task_results

    if args.export:
        from flexq_tpu.export.exporter import export_checkpoint

        log.info("exporting packed checkpoint -> %s", args.export)
        pol = (
            ("opt_flex" if args.arch == "opt" else "llama_flex")
            if args.flex_linear_quant
            else "uniform"
        )
        export_checkpoint(
            args.model, args.export, policy_name=pol,
            wbits=args.wbits, abits=args.abits,
        )
        results["exported"] = args.export

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
