"""Build REAL datasets.save_to_disk arrow datasets from the in-env corpus.

The reference evaluates on wikitext2/ptb/c4/pile via HF `datasets`
(algorithm/datautils.py); this environment ships only git-LFS pointer stubs
for those. This script materializes schema-faithful arrow datasets from the
held-out data_tiny splits so `flexq_tpu/eval/data.py` runs its REAL code
path (load_from_disk -> field extraction -> join convention -> tokenize)
instead of being tested only against stubs:

  <out>/wikitext2-env   rows {"text"}: paragraph-per-row, "\n\n" join
                        reconstructs test.txt byte-identically (the loader's
                        wikitext2 join convention, datautils.py get_wikitext2)
  <out>/ptb-env         rows {"sentence"}: line-per-row, " " join (get_ptb)
  <out>/c4-env          rows {"text","timestamp","url"}: document-per-row
                        (get_c4's per-document protocol)
  <out>/pile-env        rows {"text","meta"}: document-per-row (get_pile)

Each gets train/validation/test splits (train/val from val.txt, test from
test.txt — all are held out from the tiny model's training split).

Usage:
  python scripts/make_eval_datasets.py --out /root/data_eval
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flexq_tpu.train.corpus import DOC_SEP  # noqa: E402


def _read(split: str, corpus_dir: str) -> str:
    with open(os.path.join(corpus_dir, f"{split}.txt")) as f:
        return f.read()


def build(out_root: str, corpus_dir: str) -> None:
    from datasets import Dataset, DatasetDict

    val = _read("val", corpus_dir)
    test = _read("test", corpus_dir)
    # "train" split content for calib loaders: first half of val; validation
    # keeps the rest (never leaks test, which is the ppl measurement split)
    half = len(val) // 2
    train, validation = val[:half], val[half:]

    def paragraphs(text):
        return text.split("\n\n")

    def lines(text):
        return [ln for ln in text.split("\n") if ln.strip()]

    def docs(text):
        return [d for d in text.split(DOC_SEP) if d.strip()]

    # wikitext2: row-per-paragraph so "\n\n".join(rows) == text exactly
    wt = DatasetDict(
        {
            name: Dataset.from_dict({"text": paragraphs(t)})
            for name, t in (("train", train), ("validation", validation), ("test", test))
        }
    )
    assert "\n\n".join(wt["test"]["text"]) == test
    wt.save_to_disk(os.path.join(out_root, "wikitext2-env"))

    ptb = DatasetDict(
        {
            name: Dataset.from_dict({"sentence": lines(t)})
            for name, t in (("train", train), ("validation", validation), ("test", test))
        }
    )
    ptb.save_to_disk(os.path.join(out_root, "ptb-env"))

    def doc_rows(t, extra):
        ds = docs(t)
        cols = {"text": ds}
        for k, fn in extra.items():
            cols[k] = [fn(i) for i in range(len(ds))]
        return cols

    c4 = DatasetDict(
        {
            name: Dataset.from_dict(
                doc_rows(
                    t,
                    {
                        "timestamp": lambda i: "2026-01-01T00:00:00Z",
                        "url": lambda i: f"env://data_tiny/{i}",
                    },
                )
            )
            for name, t in (("train", train), ("validation", validation), ("test", test))
        }
    )
    c4.save_to_disk(os.path.join(out_root, "c4-env"))

    pile = DatasetDict(
        {
            name: Dataset.from_dict(
                doc_rows(t, {"meta": lambda i: {"pile_set_name": "env"}})
            )
            for name, t in (("train", train), ("validation", validation), ("test", test))
        }
    )
    pile.save_to_disk(os.path.join(out_root, "pile-env"))

    # --- zero-shot task datasets in the REAL HF task schemas -------------
    # Items are continuation MC built from held-out text (true continuation
    # vs distractors drawn elsewhere) so a model trained on data_tiny/train
    # scores well above random; the point is exercising load_task_items ->
    # TASK_ADAPTERS -> evaluate_multiple_choice on real arrow rows with the
    # reference datasets' exact column schemas (piqa: goal/sol1/sol2/label;
    # arc: question/choices{text,label}/answerKey).
    import random

    rng = random.Random(11)
    test_docs = [d for d in docs(test) if len(d) >= 2048]

    def snippet(n_ctx=384, n_cont=160):
        d = test_docs[rng.randrange(len(test_docs))]
        p = rng.randrange(0, len(d) - n_ctx - n_cont)
        return d[p : p + n_ctx], d[p + n_ctx : p + n_ctx + n_cont]

    def mc_item(n_choices):
        ctx, true = snippet()
        conts = [true] + [snippet()[1] for _ in range(n_choices - 1)]
        order = list(range(n_choices))
        rng.shuffle(order)
        return ctx, [conts[i] for i in order], order.index(0)

    n_items = 200
    piqa_rows = {"goal": [], "sol1": [], "sol2": [], "label": []}
    for _ in range(n_items):
        ctx, conts, gold = mc_item(2)
        piqa_rows["goal"].append(ctx)
        piqa_rows["sol1"].append(conts[0])
        piqa_rows["sol2"].append(conts[1])
        piqa_rows["label"].append(gold)
    DatasetDict({"validation": Dataset.from_dict(piqa_rows)}).save_to_disk(
        os.path.join(out_root, "tasks", "piqa")
    )

    letters = ["A", "B", "C", "D"]
    for task in ("arc_easy", "arc_challenge"):
        arc_rows = {"question": [], "choices": [], "answerKey": []}
        for _ in range(n_items):
            ctx, conts, gold = mc_item(4)
            arc_rows["question"].append(ctx)
            arc_rows["choices"].append({"text": conts, "label": letters})
            arc_rows["answerKey"].append(letters[gold])
        DatasetDict({"validation": Dataset.from_dict(arc_rows)}).save_to_disk(
            os.path.join(out_root, "tasks", task)
        )

    # hellaswag schema: ctx_a/ctx_b/activity_label/endings/label
    hs_rows = {"ctx_a": [], "ctx_b": [], "activity_label": [], "endings": [], "label": []}
    for _ in range(n_items):
        ctx, conts, gold = mc_item(4)
        hs_rows["ctx_a"].append(ctx)
        hs_rows["ctx_b"].append("")
        hs_rows["activity_label"].append("env")
        hs_rows["endings"].append(conts)
        hs_rows["label"].append(gold)
    DatasetDict({"validation": Dataset.from_dict(hs_rows)}).save_to_disk(
        os.path.join(out_root, "tasks", "hellaswag")
    )

    # winogrande schema: sentence with "_" blank, option1/option2, answer.
    # The adapter scores the SHARED suffix after the blank given
    # prefix+option (partial evaluation) — the true middle chunk should
    # make the real suffix more likely than a distractor middle does.
    wg_rows = {"sentence": [], "option1": [], "option2": [], "answer": []}
    for _ in range(n_items):
        d = test_docs[rng.randrange(len(test_docs))]
        p = rng.randrange(0, len(d) - 640)
        prefix, true_mid, suffix = d[p : p + 320], d[p + 320 : p + 400], d[p + 400 : p + 560]
        distract = snippet(80, 1)[0]
        opts = [true_mid, distract]
        gold = rng.randrange(2)
        if gold == 1:
            opts.reverse()
        wg_rows["sentence"].append(prefix + "_" + suffix)
        wg_rows["option1"].append(opts[0])
        wg_rows["option2"].append(opts[1])
        wg_rows["answer"].append(str(gold + 1))
    DatasetDict({"validation": Dataset.from_dict(wg_rows)}).save_to_disk(
        os.path.join(out_root, "tasks", "winogrande")
    )

    # boolq schema: passage/question/answer. A from-scratch 32M LM has no
    # yes/no grounding, so accuracy here is chance BY CONSTRUCTION — the
    # dataset exists to execute the loader/adapter/scoring path on real
    # arrow rows with the exact reference schema.
    bq_rows = {"passage": [], "question": [], "answer": []}
    for _ in range(n_items):
        ctx, _ = snippet()
        bq_rows["passage"].append(ctx)
        bq_rows["question"].append("is this passage from the held-out corpus")
        bq_rows["answer"].append(bool(rng.randrange(2)))
    DatasetDict({"validation": Dataset.from_dict(bq_rows)}).save_to_disk(
        os.path.join(out_root, "tasks", "boolq")
    )

    for d in ("wikitext2-env", "ptb-env", "c4-env", "pile-env",
              "tasks/piqa", "tasks/arc_easy", "tasks/arc_challenge",
              "tasks/hellaswag", "tasks/winogrande", "tasks/boolq"):
        p = os.path.join(out_root, d, "test")
        if not os.path.isdir(p):
            p = os.path.join(out_root, d, "validation")
        names = os.listdir(p)
        assert any(n.endswith(".arrow") for n in names), (d, names)
        print(d, "->", os.path.join(out_root, d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/data_eval")
    ap.add_argument("--corpus-dir", default=os.path.join(REPO, "data_tiny"))
    args = ap.parse_args()
    build(args.out, args.corpus_dir)


if __name__ == "__main__":
    main()
