"""Zero-shot harness tests with a synthetic model + toy tokenizer."""

import numpy as np
import jax
import jax.numpy as jnp

from flexq_tpu.eval.zeroshot import (
    MCItem,
    evaluate_multiple_choice,
    loglikelihood_batch,
    _winogrande,
)


class ToyTokenizer:
    """Characters as tokens (ord % 97)."""

    def encode(self, s):
        return [ord(c) % 97 for c in s]


def constant_pref_model(pref_token: int, vocab: int = 97):
    """Model that always assigns high probability to `pref_token`."""

    def fwd(ids):
        logits = jnp.zeros(ids.shape + (vocab,), jnp.float32)
        return logits.at[..., pref_token].set(5.0)

    return fwd


def test_loglikelihood_scores_continuation_only():
    vocab = 97
    fwd = constant_pref_model(10, vocab)
    # continuation of token 10s scores higher than token 20s
    s = loglikelihood_batch(fwd, [[1, 2], [1, 2]], [[10, 10], [20, 20]])
    assert s[0] > s[1]
    # three continuation tokens accumulate exactly 1.5x the two-token sum
    s2 = loglikelihood_batch(fwd, [[1]], [[10, 10, 10]])
    np.testing.assert_allclose(s2[0], s[0] * 1.5, rtol=1e-5)


def test_echo_model_gets_perfect_accuracy():
    """A model that predicts the next token = current token + 1 prefers the
    'abc...' continuation over scrambled ones."""
    vocab = 97

    def fwd(ids):
        nxt = (ids + 1) % vocab
        return jax.nn.one_hot(nxt, vocab) * 10.0

    tok = ToyTokenizer()
    items = [
        MCItem(context="abc", choices=["def", "zqx"], gold=0),
        MCItem(context="lmn", choices=["xyz", "opq"], gold=1),
    ]
    res = evaluate_multiple_choice(fwd, tok, items, batch_size=4)
    assert res["acc"] == 1.0
    assert res["n"] == 2
    assert 0 <= res["acc_stderr"] <= 0.5


def test_random_model_near_chance():
    rng_logits = np.random.default_rng(0).standard_normal((97,)).astype(np.float32)

    def fwd(ids):
        return jnp.broadcast_to(jnp.asarray(rng_logits), ids.shape + (97,))

    tok = ToyTokenizer()
    rng = np.random.default_rng(1)
    items = []
    for _ in range(40):
        a = "".join(chr(97 + rng.integers(0, 26)) for _ in range(5))
        b = "".join(chr(97 + rng.integers(0, 26)) for _ in range(5))
        items.append(MCItem(context="ctx", choices=[a, b], gold=int(rng.integers(0, 2))))
    res = evaluate_multiple_choice(fwd, tok, items)
    assert 0.2 <= res["acc"] <= 0.8  # chance-ish


def test_winogrande_adapter():
    row = {
        "sentence": "The trophy doesn't fit in the suitcase because _ is too big.",
        "option1": "the trophy",
        "option2": "the suitcase",
        "answer": "1",
    }
    item = _winogrande(row)
    assert item.gold == 0
    # partial evaluation: options vary the CONTEXT; shared scored target
    assert item.contexts[0].endswith("because the trophy")
    assert item.contexts[1].endswith("because the suitcase")
    assert item.choices == [" is too big.", " is too big."]


def test_new_task_adapters_shapes():
    from flexq_tpu.eval.zeroshot import TASK_ADAPTERS

    rows = {
        "openbookqa": {
            "question_stem": "The sun is",
            "choices": {"label": ["A", "B"], "text": ["hot", "cold"]},
            "answerKey": "A",
        },
        "sciq": {
            "question": "What is water?",
            "support": "Water is H2O.",
            "distractor1": "rock",
            "distractor2": "fire",
            "distractor3": "air",
            "correct_answer": "a liquid",
        },
        "copa": {
            "premise": "The man fell.",
            "choice1": "He tripped.",
            "choice2": "He flew.",
            "question": "cause",
            "label": 0,
        },
        "storycloze": {
            "input_sentence_1": "A.",
            "input_sentence_2": "B.",
            "input_sentence_3": "C.",
            "input_sentence_4": "D.",
            "sentence_quiz1": "Good end.",
            "sentence_quiz2": "Bad end.",
            "answer_right_ending": 1,
        },
        "race": {
            "article": "Text.",
            "problems": [
                {"question": "Q?", "options": ["w", "x", "y", "z"],
                 "answer": "C"},
            ],
        },
    }
    for name, row in rows.items():
        item = TASK_ADAPTERS[name](row)
        assert 0 <= item.gold < len(item.choices), name
        assert all(c.startswith(" ") for c in item.choices), name


def test_lambada_evaluator_synthetic():
    """A 'model' that always predicts the token after a copy of itself gets
    100% on texts that repeat, ~0% otherwise."""
    import jax.numpy as jnp
    import numpy as np
    from flexq_tpu.eval.zeroshot import evaluate_lambada

    V = 64

    class Tok:
        def __call__(self, text, return_tensors=None):
            ids = np.asarray([[ord(c) % V for c in text.replace(" ", "")]], np.int64)
            class R: input_ids = ids
            return R()

    def bigram_copy_forward(ids):
        # predicts next token == current token (so "aa aa" last word is right)
        ids = np.asarray(ids)
        logits = np.full(ids.shape + (V,), -10.0, np.float32)
        for b in range(ids.shape[0]):
            for t in range(ids.shape[1]):
                logits[b, t, ids[b, t]] = 10.0
        return jnp.asarray(logits)

    res = evaluate_lambada(bigram_copy_forward, Tok(), ["aaaa aa", "abcd ef"])
    assert res["n"] == 2 and res["acc"] == 0.5


def test_second_batch_task_adapters():
    from flexq_tpu.eval.zeroshot import TASK_ADAPTERS

    rows = {
        "swag": {"startphrase": "He ran", "ending0": "a", "ending1": "b",
                 "ending2": "c", "ending3": "d", "label": 2},
        "mathqa": {"Problem": "2+2?", "options": "a ) 3 , b ) 4 , c ) 5 , d ) 6 , e ) 7",
                   "correct": "b"},
        "truthfulqa_mc1": {"question": "Why?",
                           "mc1_targets": {"choices": ["x", "y"], "labels": [0, 1]}},
        "logiqa": {"context": "All A are B.", "query": "So?",
                   "options": ["p", "q", "r", "s"], "correct_option": 1},
        "wsc273": {"text": "The cup fell because it was heavy.",
                   "pronoun": "it", "pronoun_loc": 21,
                   "options": ["the cup", "the table"], "label": 0},
    }
    for name, row in rows.items():
        item = TASK_ADAPTERS[name](row)
        assert 0 <= item.gold < len(item.choices), name
        assert all(c.startswith(" ") for c in item.choices), name


def test_generation_eval_harness():
    """greedy_until scoring: EM/F1 with normalization + number extraction."""
    import numpy as np
    from flexq_tpu.eval.zeroshot import (
        GEN_TASK_ADAPTERS, GenItem, evaluate_generation,
    )

    class Tok:
        def __call__(self, text, return_tensors=None):
            ids = np.asarray([[ord(c) for c in text]], np.int64)
            class R: input_ids = ids
            return R()
        def decode(self, ids):
            return "".join(chr(int(t)) for t in ids)

    # a "model" that always answers " The Cat.\nmore" (EM after normalization)
    fixed = [ord(c) for c in " The Cat.\njunk"]
    gen = lambda ids, n: fixed[:n]
    items = [GenItem(context="Q: what?\nA:", answers=["cat"]),
             GenItem(context="Q: who?\nA:", answers=["dog"])]
    res = evaluate_generation(gen, Tok(), items, max_new_tokens=20)
    assert res["exact_match"] == 0.5 and res["n"] == 2

    # gsm8k number extraction
    fixed_num = [ord(c) for c in " reasoning... so the answer is 42\n"]
    gen2 = lambda ids, n: fixed_num[:n]
    item = GEN_TASK_ADAPTERS["gsm8k"]({"question": "2*21?", "answer": "blah\n#### 42"})
    res2 = evaluate_generation(gen2, Tok(), [item], max_new_tokens=64,
                               extract_number=True)
    assert res2["exact_match"] == 1.0

    # adapters shape check
    sq = GEN_TASK_ADAPTERS["squad"]({"title": "T", "context": "C.",
                                     "question": "Q?", "answers": {"text": ["a1"]}})
    assert sq.answers == ["a1"]
    tq = GEN_TASK_ADAPTERS["triviaqa"]({"question": "Q?",
                                        "answer": {"aliases": ["x", "y"], "value": "x"}})
    assert tq.answers == ["x", "y"]


def test_third_batch_task_adapters():
    from flexq_tpu.eval.zeroshot import GEN_TASK_ADAPTERS, TASK_ADAPTERS

    rows = {
        "mmlu": {"question": "2+2?", "choices": ["1", "2", "3", "4"], "answer": 3},
        "anli": {"premise": "P.", "hypothesis": "H", "label": 1},
        "cb": {"premise": "P.", "hypothesis": "H", "label": 2},
        "rte": {"sentence1": "A.", "sentence2": "B", "label": 0},
        "wic": {"sentence1": "A.", "sentence2": "B.", "word": "bank", "label": 1},
        "pubmedqa": {
            "question": "Q?", "final_decision": "maybe",
            "context": {"contexts": ["c1", "c2"]},
        },
    }
    for name, row in rows.items():
        item = TASK_ADAPTERS[name](row)
        assert 0 <= item.gold < len(item.choices), name
    g = GEN_TASK_ADAPTERS["webqs"]({"question": "Q?", "answers": ["a", "b"]})
    assert g.answers == ["a", "b"]
    n = GEN_TASK_ADAPTERS["naturalqs"]({"question": "Q?", "answer": ["x"]})
    assert n.answers == ["x"]


def test_long_tail_adapters():
    from flexq_tpu.eval.zeroshot import (
        GEN_TASK_ADAPTERS,
        GREEDY_PAIR_ADAPTERS,
        TASK_ADAPTERS,
    )

    rows = {
        "cola": {"sentence": "Cats sleeps.", "label": 0},
        "sst": {"sentence": "great movie !", "label": 1},
        "mnli": {"premise": "P.", "hypothesis": "H", "label": 2},
        "qnli": {"question": "Q?", "sentence": "S.", "label": 1},
        "wnli": {"sentence1": "A.", "sentence2": "B", "label": 0},
        "glue_rte": {"sentence1": "A.", "sentence2": "B", "label": 1},
        "mrpc": {"sentence1": "A .", "sentence2": "B .", "label": 1},
        "qqp": {"question1": "Q1?", "question2": "Q2?", "label": 0},
        "headqa": {
            "qtext": "Q?", "ra": 2,
            "answers": [{"atext": "a"}, {"atext": "b"}, {"atext": "c"}],
        },
        "prost": {"context": "C.", "ex_question": "Q?", "A": "w", "B": "x",
                  "C": "y", "D": "z", "label": 3},
        "qa4mre": {
            "document_str": "Doc.", "question_str": "Q?",
            "answer_options": {"answer_str": ["a", "b", "c"]},
            "correct_answer_id": 3,
        },
        "sat_analogies": {
            "stem": "hot cold other", "solution": "b",
            "choices": ["wet dry x", "up down y", "a b z", "c d w", "e f v"],
        },
        "toxigen": {"text": "T.", "toxicity_ai": 3.0, "toxicity_human": 3.0},
        "ethics_cm": {"input": "I took the bread.", "label": 1},
        "ethics_justice": {"scenario": "S.", "excuse": "E.", "label": 0},
        "mc_taco": {"sentence": "S.", "question": "Q?", "answer": "2 hours",
                    "label": 1},
        "mutual": {"article": "m : hi . f : hello .",
                   "options": ["a .", "b .", "c .", "d ."], "answers": "C"},
        "crows_pairs": {"sent_more": "More.", "sent_less": "Less."},
        "blimp": {"sentence_good": "Good.", "sentence_bad": "Bad."},
        "cbt": {"sentences": ["A b .", "C d ."], "question": "E XXXXX f .",
                "options": ["x", "y"], "answer": "y"},
    }
    for name, row in rows.items():
        item = TASK_ADAPTERS[name](row)
        assert 0 <= item.gold < len(item.choices), name
    # cbt substitutes the blank into full-passage choices
    cbt = TASK_ADAPTERS["cbt"](rows["cbt"])
    assert cbt.gold == 1 and "XXXXX" not in cbt.choices[0]
    assert "y" in cbt.choices[1]
    # toxigen label thresholding
    assert TASK_ADAPTERS["toxigen"](
        {"text": "T.", "toxicity_ai": 3.0, "toxicity_human": 3.0}
    ).gold == 1

    g = GEN_TASK_ADAPTERS["drop"](
        {"passage": "P.", "question": "Q?", "answers_spans": {"spans": ["7"]}}
    )
    assert g.answers == ["7"]
    u = GEN_TASK_ADAPTERS["anagrams1"]({"context": "tca =", "completion": " cat"})
    assert u.answers == ["cat"]
    c = GEN_TASK_ADAPTERS["coqa"]({
        "story": "S.",
        "questions": {"input_text": ["Q1?", "Q2?"]},
        "answers": {"input_text": ["A1", "A2"]},
    })
    assert c.answers == ["A2"] and "A1" in c.context and c.context.endswith("A:")
    a_ctx, a_cont = GREEDY_PAIR_ADAPTERS["arithmetic"](
        {"context": "Q: 1+1?\nA:", "completion": " 2"}
    )
    assert a_cont == " 2"
    s_ctx, s_cont = GREEDY_PAIR_ADAPTERS["asdiv"](
        {"body": "B.", "question": "Q?", "answer": "4 (apples)"}
    )
    assert s_cont == " 4" and s_ctx.endswith("Answer:")


def test_greedy_completion_and_cloze():
    import jax.numpy as jnp
    import numpy as np
    from flexq_tpu.eval.zeroshot import (
        evaluate_greedy_completion,
        lambada_cloze_pairs,
    )

    class Tok:
        bos_token_id = 0

        def __call__(self, s, return_tensors=None):
            ids = np.asarray([[ord(c) % 97 + 1 for c in s]], np.int32)
            class R: input_ids = ids
            return R()

    vocab = 128

    def echo_forward(ids):
        # predicts the NEXT token of the actual sequence perfectly
        ids_np = np.asarray(ids)
        b, l = ids_np.shape
        logits = np.full((b, l, vocab), -10.0, np.float32)
        for r in range(b):
            for t in range(l - 1):
                logits[r, t, ids_np[r, t + 1]] = 10.0
        return jnp.asarray(logits)

    pairs = [("ab", "cd"), ("xy", "zw")]
    out = evaluate_greedy_completion(echo_forward, Tok(), pairs)
    assert out["acc"] == 1.0 and out["ppl"] < 1.01

    cloze = lambada_cloze_pairs(["the cat sat mat"])
    assert cloze == [("the cat sat ____. ->", " mat")]


def test_final_tail_adapters_and_bleu():
    from flexq_tpu.eval.zeroshot import (
        GEN_TASK_ADAPTERS,
        TASK_ADAPTERS,
        corpus_bleu,
        translation_item,
    )

    m = TASK_ADAPTERS["multirc"](
        {"paragraph": "P.", "question": "Q?", "answer": "A", "label": 1}
    )
    assert m.gold == 0 and "yes" in m.choices[0] and "no" in m.choices[1]

    r = TASK_ADAPTERS["record"]({
        "passage": "Intro.\n@highlight\nh one\n@highlight\nh two",
        "query": "X @placeholder Y",
        "entities": ["cat", "dog", "cat"],
        "answers": ["dog"],
    })
    assert r.gold == 1 and r.choices[1] == "  - X dog Y"
    assert "  - h one." in r.context

    g = GEN_TASK_ADAPTERS["hendrycks_math"](
        {"problem": "1+1?", "solution": "thus \\boxed{2} done"}
    )
    assert g.answers == ["2"]
    nested = GEN_TASK_ADAPTERS["hendrycks_math"](
        {"problem": "p", "solution": "\\boxed{\\frac{1}{2}}"}
    )
    assert nested.answers == ["\\frac{1}{2}"]

    q = GEN_TASK_ADAPTERS["quac"]({
        "title": "T", "section_title": "S", "paragraph": "P.",
        "question": "Q?", "answers": {"texts": ["a1", "a2"]},
    })
    assert q.answers == ["a1", "a2"] and "T - S" in q.context

    qa = GEN_TASK_ADAPTERS["qasper_freeform"]({
        "title": "T", "abstract": "Ab.", "question": "Q?", "answers": ["x"],
    })
    assert qa.answers == ["x"]

    t = translation_item({"src": "chat", "ref": "cat"}, "French", "English")
    assert t.context.endswith("English phrase:") and t.answers == [" cat"]

    # BLEU sanity: perfect match = 100, disjoint = 0
    assert corpus_bleu(["the cat sat on the mat mat"],
                       [["the cat sat on the mat mat"]]) == 100.0
    assert corpus_bleu(["a b c d e"], [["v w x y z"]]) < 5.0  # smoothed floor
    assert corpus_bleu(["cat"], [["cat"]]) == 100.0  # short-output smoothing
    partial = corpus_bleu(["the cat sat on a mat"], [["the cat sat on the mat"]])
    assert 0.0 < partial < 100.0


def test_rolling_token_windows_reference_example():
    """The exact worked example in reference lm_eval base.py:58-75."""
    from flexq_tpu.eval.zeroshot import rolling_token_windows

    windows = rolling_token_windows(list(range(10)), prefix_token=-1, max_seq_len=4)
    assert windows == [
        ([-1], [0, 1, 2, 3]),
        ([3], [4, 5, 6, 7]),
        ([5, 6, 7], [8, 9]),
    ]
    # every token predicted exactly once
    preds = [t for _, p in windows for t in p]
    assert preds == list(range(10))
    # short doc: one window
    assert rolling_token_windows([7, 8], prefix_token=0, max_seq_len=4) == [
        ([0], [7, 8])
    ]
    assert rolling_token_windows([], 0, 4) == []


def test_perplexity_task_uniform_model():
    """Uniform logits => per-token logprob = -log V exactly; check the
    word/byte perplexity and bits_per_byte formulas (metrics.py:98-108)."""
    import math

    from flexq_tpu.eval.zeroshot import evaluate_perplexity_docs

    V = 97

    class Tok:
        eos_token_id = 0

        def __call__(self, text, return_tensors=None):
            ids = np.asarray([[ord(c) % V for c in text]], np.int64)

            class R:
                input_ids = ids

            return R()

    def fwd(ids):
        return jnp.zeros(ids.shape + (V,), jnp.float32)

    docs = ["ab cd", "efg hi jk"]  # 2+3 = 5 words, 5+9 = 14 bytes, 14 tokens
    res = evaluate_perplexity_docs(fwd, Tok(), docs, max_len=4, batch_size=3)
    total_ll = -14 * math.log(V)
    np.testing.assert_allclose(res["word_perplexity"], math.exp(-total_ll / 5), rtol=1e-6)
    np.testing.assert_allclose(res["byte_perplexity"], math.exp(-total_ll / 14), rtol=1e-6)
    np.testing.assert_allclose(res["bits_per_byte"], -total_ll / (14 * math.log(2)), rtol=1e-6)


def test_truthfulqa_mc2_uniform_model():
    """Uniform model + single-token choices => mc2 = n_true / n_choices."""
    from flexq_tpu.eval.zeroshot import evaluate_truthfulqa_mc2

    V = 97

    class Tok:
        def __call__(self, text, return_tensors=None):
            ids = np.asarray([[ord(c) % V for c in text]], np.int64)

            class R:
                input_ids = ids

            return R()

    def fwd(ids):
        return jnp.zeros(ids.shape + (V,), jnp.float32)

    rows = [
        {"question": "Q?", "mc2_targets": {"choices": ["a", "b", "c", "d"],
                                           "labels": [1, 1, 0, 0]}},
        {"question": "R?", "mc2_targets": {"choices": ["x", "y"],
                                           "labels": [1, 0]}},
    ]
    res = evaluate_truthfulqa_mc2(fwd, Tok(), rows, max_len=512)
    np.testing.assert_allclose(res["mc2"], (0.5 + 0.5) / 2, rtol=1e-5)
    assert res["n"] == 2


def test_final_batch_task_adapters():
    from flexq_tpu.eval.zeroshot import (
        LAMBADA_MULTILINGUAL_LANGS,
        PILE_SUBSETS,
        TASK_ADAPTERS,
        TRUTHFULQA_QA_PROMPT,
    )

    rows = {
        "ethics_deontology": {"scenario": "S.", "excuse": "E.", "label": 1},
        "ethics_utilitarianism": {"activity": "Good walk.", "baseline": "Bad walk.",
                                  "label": 1},
        "ethics_virtue": {"scenario": "S.", "trait": "honesty", "label": 0},
        "sg_wsc": {"text": "Mark told Pete many lies. He is bad.",
                   "span1_index": 0, "span1_text": "Mark",
                   "span2_index": 5, "span2_text": "He", "label": 0},
    }
    for name, row in rows.items():
        item = TASK_ADAPTERS[name](row)
        assert 0 <= item.gold < len(item.choices), name
        assert all(c.startswith(" ") for c in item.choices), name
    # ethics_utilitarianism shuffle is deterministic in the activity text
    a = TASK_ADAPTERS["ethics_utilitarianism"](rows["ethics_utilitarianism"])
    b = TASK_ADAPTERS["ethics_utilitarianism"](rows["ethics_utilitarianism"])
    assert (a.context, a.gold) == (b.context, b.gold)
    # sg_wsc marks the pronoun in the passage
    wsc = TASK_ADAPTERS["sg_wsc"](rows["sg_wsc"])
    assert "*He*" in wsc.context and wsc.choices == [" no", " yes"]
    # truthfulqa mc1 carries the fixed QA preamble (truthfulqa.py:90-91)
    mc1 = TASK_ADAPTERS["truthfulqa_mc1"](
        {"question": "Why?", "mc1_targets": {"choices": ["x", "y"], "labels": [1, 0]}}
    )
    assert mc1.context.startswith(TRUTHFULQA_QA_PROMPT)
    assert len(PILE_SUBSETS) == 22 and len(LAMBADA_MULTILINGUAL_LANGS) == 5


def test_bucketed_padding_is_exact():
    """len_multiple/pad_rows_to shape bucketing (TPU recompile cap) must not
    change scores: right-pads are causally invisible to real positions and
    padded rows are sliced off."""
    rng = np.random.default_rng(0)
    vocab = 97
    w = jnp.asarray(rng.standard_normal((vocab, vocab)), jnp.float32)

    def fwd(ids):  # position-dependent random-ish logits via one-hot matmul
        x = jax.nn.one_hot(ids, vocab)
        return x @ w + 0.01 * jnp.arange(ids.shape[1])[None, :, None]

    ctxs = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10]]
    conts = [[11, 12], [13], [14, 15, 16]]
    base = loglikelihood_batch(fwd, ctxs, conts, len_multiple=1)
    bucketed = loglikelihood_batch(fwd, ctxs, conts, len_multiple=64, pad_rows_to=8)
    np.testing.assert_allclose(base, bucketed, rtol=1e-6)
