"""Speculative decoding with prompt-lookup (n-gram) drafting.

Exceeds the reference (which decodes strictly one token per step,
e2e models/llama/Llama.cc:970-1240): single-chip decode here is ~95%
weight-streaming-bound (scripts/bench_decode_parts.py), so a forward over
1+k tokens costs nearly the same as over 1 — the quantized-weight planes are
read once either way. Verifying k drafted tokens per step therefore turns
memory-bound decode bandwidth into extra tokens at almost no marginal cost.

Drafting is prompt-lookup decoding (PLD): propose the k tokens that followed
the most recent earlier occurrence of the current n-gram suffix. No draft
model, no extra weights — ideal for the summarization/extraction/code
workloads where serving engines spend most of their time.

Verification reuses the chunked-prefill window semantics (engine.py
`_prefill_chunk`): the [B, 1+k] window forward writes K/V at positions
pos..pos+k and attends causally, and because each step's window starts
exactly where the previous accepted prefix ended, stale cache entries from
rejected drafts are always overwritten before any later query can attend to
them.

Greedy-exactness invariant (tested): the emitted token sequence equals the
plain greedy decode chain token-for-token, for any draft quality — drafts
only change how many steps it takes, never what is generated.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SpecStats:
    """Per-generation speculative-decoding accounting."""

    steps: int = 0  # verify forwards run
    drafted: int = 0  # draft tokens proposed (active rows only)
    accepted: int = 0  # draft tokens accepted
    generated: int = 0  # tokens emitted (accepted + 1 bonus per step)
    prefill_s: float = 0.0
    decode_s: float = 0.0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.drafted, 1)

    @property
    def tokens_per_step(self) -> float:
        return self.generated / max(self.steps, 1)


def ngram_draft(
    history: np.ndarray, k: int, max_ngram: int = 3, min_ngram: int = 1
) -> np.ndarray:
    """Propose k tokens by prompt lookup: find the most recent earlier
    occurrence of the longest matching suffix n-gram (n = max_ngram..min_
    ngram) and return the k tokens that followed it. Falls back to repeating
    the last token (a draft is only a guess — verification keeps exactness).
    """
    h = np.asarray(history, np.int32)
    n_h = len(h)
    for n in range(min(max_ngram, n_h - 1), min_ngram - 1, -1):
        pat = h[-n:]
        windows = np.lib.stride_tricks.sliding_window_view(h[:-1], n)
        matches = np.nonzero((windows == pat).all(axis=1))[0]
        if len(matches):
            i = int(matches[-1])
            cont = h[i + n : i + n + k]
            if len(cont) < k:
                cont = np.concatenate([cont, np.full(k - len(cont), h[-1], np.int32)])
            return cont.astype(np.int32)
    return np.full(k, h[-1], np.int32)


def ngram_draft_device(
    buf: "jax.Array", length: "jax.Array", k: int, max_ngram: int = 3
) -> "jax.Array":
    """On-device prompt lookup over the token buffer (the fused-loop analogue
    of :func:`ngram_draft`): for n = max_ngram..1, vectorized compare of every
    window buf[j:j+n] against the current suffix, take the most recent match
    of the longest matching n, return the k following tokens. Fixed shapes,
    pure VPU work (~buffer-length comparisons per n) — negligible next to the
    verify forward."""
    import jax
    import jax.numpy as jnp

    lb = buf.shape[0]
    idx = jnp.arange(lb, dtype=jnp.int32)
    last = jax.lax.dynamic_index_in_dim(buf, length - 1, keepdims=False)
    best = jnp.int32(-1)
    for n in range(max_ngram, 0, -1):
        suffix = jax.lax.dynamic_slice(buf, (length - n,), (n,))
        m = jnp.ones((lb,), bool)
        for t in range(n):
            # roll wraps, but wrapped rows sit at j > lb-n >= length-n and
            # are masked below
            m = m & (jnp.roll(buf, -t) == suffix[t])
        m = m & (idx < length - n)  # window + its continuation inside history
        pos_n = jnp.max(jnp.where(m, idx, -1))
        ok = (pos_n >= 0) & (length > n)
        best = jnp.where((best < 0) & ok, pos_n + n, best)
    start = jnp.where(best >= 0, best, length - 1)
    bufp = jnp.concatenate([buf, jnp.full((k,), last, buf.dtype)])
    d = jax.lax.dynamic_slice(bufp, (start,), (k,))
    tpos = start + jnp.arange(k, dtype=jnp.int32)
    # continuation may run past history (self-extension is fine below length)
    return jnp.where(tpos < length, d, last)


def generate_speculative(
    engine,
    prompt_ids: Sequence[Sequence[int]],
    max_new_tokens: int = 32,
    k: int = 4,
    eos_id: int = 2,
    stop_ids: Sequence[int] = (),
    max_ngram: int = 3,
    return_stats: bool = False,
    fused: bool = True,
    sampling=None,
    seed: int = 0,
    gate: bool = True,
) -> List[List[int]] | Tuple[List[List[int]], SpecStats]:
    """Generation via draft-and-verify; exact greedy semantics, and exact
    sampling semantics for non-greedy params (fused loop only): emitted
    tokens are the model's own samples per window position, valid exactly
    while the samples match the deterministic draft. Count-based penalties
    are unsupported under sampling (no per-window count tracking).

    One verify step: feed [last_token, d_1..d_k] at positions pos..pos+k;
    greedy targets t_0..t_k; accept the longest prefix with d_j == t_{j-1};
    emit t_0..t_n_acc (the model's own next token after the accept point is
    the free "bonus"). Between 1 and k+1 tokens per forward.

    Batched (fused loop): each row drafts and verifies at its OWN position
    (per-row cache_pos scatter); rows that finish hold position until the
    batch drains. The host (fused=False) path stays B=1.

    ``gate`` (default on) arms the in-loop draftability gate: when the worst
    active row's acceptance EMA collapses, the loop switches to single-token
    verify steps (plain-decode cost) and re-probes periodically — making
    mixed-draftability batches safe (they measured 0.85x vs plain ungated).
    Emitted tokens are unchanged either way (greedy exactness holds).
    """
    import time

    from flexq_tpu.serve.sampling import SamplingParams

    if sampling is None:
        sampling = SamplingParams()
    if not sampling.greedy:
        assert fused, "sampled speculative decoding requires the fused loop"
        assert (
            sampling.repetition_penalty == 1.0
            and sampling.presence_penalty == 0.0
            and sampling.frequency_penalty == 0.0
            and sampling.min_length == 0
        ), "count/length penalties unsupported in sampled speculative mode"
    prompts = [list(p) for p in prompt_ids]
    bsz = len(prompts)
    assert fused or bsz == 1, "host spec loop: B=1 (fused loop batches)"
    lens = {len(p) for p in prompts}
    assert len(lens) == 1, "spec decoding requires equal-length prompts"
    l = lens.pop()
    assert l + max_new_tokens + k <= engine.max_seq_len, (
        "speculative window may overshoot: need prompt + max_new + k <= max_seq_len"
    )

    stats = SpecStats()
    t0 = time.perf_counter()
    ids = jnp.asarray(np.asarray(prompts, np.int32))
    cache = engine.new_cache(bsz)
    if engine.prefill_chunk and l > engine.prefill_chunk:
        logits, cache = engine.prefill_chunked(ids, cache, engine.prefill_chunk)
    else:
        logits, cache = engine._prefill_jit(engine.params, ids, cache, prompt_len=l)

    history = list(prompts[0])
    # device argmax + scalar fetch: syncs prefill for an honest TTFT without
    # pulling the [V] logits row through the tunnel
    first = int(jnp.argmax(logits[0]))
    stats.prefill_s = time.perf_counter() - t0

    stop_set = set(stop_ids) | {eos_id}

    if fused:
        # whole draft/verify/accept loop on device (engine._spec_decode_loop):
        # one host dispatch + one buffer fetch for the entire generation
        t1 = time.perf_counter()
        lb = l + max_new_tokens + k + 1
        buf = jnp.zeros((bsz, lb), jnp.int32).at[:, :l].set(
            jnp.asarray(prompts, jnp.int32)
        )
        buf, length, steps, acc, drafted, cache = engine._spec_loop_jit(
            engine.params, logits, cache, buf, jnp.int32(l),
            jax.random.PRNGKey(seed),
            k=k, max_new=max_new_tokens, stop_ids=tuple(sorted(stop_set)),
            max_ngram=max_ngram, sampling=sampling, gate=gate,
        )
        length_np = np.asarray(length)
        buf_np = np.asarray(buf)
        outs = [
            [int(t) for t in buf_np[r, l : int(length_np[r])]]
            for r in range(bsz)
        ]
        stats.steps = int(steps)
        stats.drafted = int(drafted)  # counts only rows still decoding
        stats.accepted = int(acc)
        stats.generated = sum(len(o) for o in outs)
        stats.decode_s = time.perf_counter() - t1
        if return_stats:
            return outs, stats
        return outs

    out: List[int] = [first]
    history.append(first)
    pos = l
    t1 = time.perf_counter()
    while len(out) < max_new_tokens and out[-1] not in stop_set:
        draft = ngram_draft(np.asarray(history, np.int32), k, max_ngram=max_ngram)
        step_ids = np.concatenate([[history[-1]], draft]).astype(np.int32)
        tgt_dev, cache = engine._spec_jit(
            engine.params, jnp.asarray(step_ids[None]), cache, jnp.int32(pos)
        )
        targets = np.asarray(tgt_dev[0], np.int32)
        n_acc = 0
        while (
            n_acc < k
            and draft[n_acc] == targets[n_acc]
            and targets[n_acc] not in stop_set
        ):
            n_acc += 1
        emitted = [int(t) for t in targets[: n_acc + 1]]
        stats.steps += 1
        stats.drafted += k
        stats.accepted += n_acc
        for t in emitted:
            out.append(t)
            history.append(t)
            if t in stop_set:
                break
        pos += n_acc + 1

    out = out[:max_new_tokens]
    if out and out[-1] in stop_set:
        pass  # stop token included, matching the stepwise loop's semantics
    stats.generated = len(out)
    stats.decode_s = time.perf_counter() - t1
    if return_stats:
        return [out], stats
    return [out]
