"""Beam-search decoding over the quantized serve path.

Parity for the reference's beam_search_layers/ (e2e layers/
BaseBeamSearchLayer.cu, OnlineBeamSearchLayer.cu: per-step top-K over
beam×vocab, cumulative log-probs, length penalty, finished-hypothesis
tracking, and KV-cache beam indirection).

TPU-native design notes:
  * The model step, log-softmax, beam top-K and the KV-cache reorder all run
    inside ONE jitted step function — the host loop only carries opaque
    arrays (no per-token sync).
  * Cache reorder: the reference keeps per-step parent pointers
    ("cache_indir") that its MMHA kernel chases; XLA has no indirection
    inside fused attention, so we gather the cache along the beam axis each
    step (jnp.take, donated buffers). O(cache) per step — fine for the
    modest beam widths (2-8) beam search is used with; the flash-decode
    kernel path is unaffected.
  * Finished beams are frozen: their only continuation is `pad_id` with
    zero added log-prob, so they compete in the top-K under the same
    length-penalized score, like FT's finished-beam handling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class BeamParams:
    beam_width: int = 4
    length_penalty: float = 1.0  # GNMT-style: score / ((5+len)/6)^alpha
    max_new_tokens: int = 32


def _length_norm(length, alpha: float):
    return jnp.power((5.0 + length.astype(jnp.float32)) / 6.0, alpha)


def _beam_step(
    step_fn,
    params,
    ids,  # [B*K, 1] last tokens
    cache,
    pos,  # scalar int32
    scores,  # f32 [B, K] cumulative log-probs
    finished,  # bool [B, K]
    b: int,
    k: int,
    eos_id: int,
    pad_id: int,
):
    """One jitted beam step. Returns (next_ids, cache', scores', finished',
    parent [B, K], token [B, K])."""
    logits, cache = step_fn(params, ids, cache, pos)  # [B*K, V]
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, v)
    # frozen beams: force single pad continuation at unchanged score
    frozen = jnp.full((v,), NEG, jnp.float32).at[pad_id].set(0.0)
    logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)
    total = scores[:, :, None] + logp  # [B, K, V]
    flat = total.reshape(b, k * v)
    top_scores, top_idx = jax.lax.top_k(flat, k)  # [B, K]
    parent = top_idx // v
    token = top_idx % v
    # reorder beam state by parent
    gather = lambda x: jnp.take_along_axis(x, parent, axis=1)
    finished = gather(finished)
    finished = finished | ((token == eos_id) & ~finished)
    scores = top_scores
    # reorder the KV cache along the flattened beam axis
    flat_parent = (parent + jnp.arange(b)[:, None] * k).reshape(-1)  # [B*K]
    cache = tuple(jnp.take(c, flat_parent, axis=1) for c in cache)
    next_ids = token.reshape(b * k, 1).astype(jnp.int32)
    return next_ids, cache, scores, finished, parent, token


def beam_search(
    engine,
    prompt_ids: Sequence[Sequence[int]],
    beams: BeamParams = BeamParams(),
    eos_id: int = 2,
    pad_id: int = 0,
) -> List[List[int]]:
    """Beam-search generate over an Engine's quantized model.

    Returns the best hypothesis per batch row (tokens up to and including
    eos if produced). Prompts must be equal length (as Engine.generate v1).
    """
    nbest = beam_search_nbest(engine, prompt_ids, beams, eos_id, pad_id, n_best=1)
    return [row[0][0] for row in nbest]


def beam_search_nbest(
    engine,
    prompt_ids: Sequence[Sequence[int]],
    beams: BeamParams = BeamParams(),
    eos_id: int = 2,
    pad_id: int = 0,
    n_best: int = 1,
) -> List[List[Tuple[List[int], float]]]:
    """Beam search returning, per batch row, the ``n_best`` hypotheses as
    (tokens, length-penalized score) sorted best-first — the engine-level
    n-best surface behind HTTP best_of (FT returns all beam_width
    hypotheses in output_ids likewise)."""
    prompts = [list(p) for p in prompt_ids]
    lens = {len(p) for p in prompts}
    assert len(lens) == 1, "equal-length prompts required"
    l = lens.pop()
    b = len(prompts)
    k = beams.beam_width
    assert l + beams.max_new_tokens <= engine.max_seq_len

    # prefill once per row, then tile rows K× (beams share the prompt KV)
    ids = jnp.asarray(np.asarray(prompts, np.int32))
    ids_tiled = jnp.repeat(ids, k, axis=0)  # [B*K, L]
    cache = engine.new_cache(b * k)
    logits, cache = engine._prefill_jit(engine.params, ids_tiled, cache, prompt_len=l)
    cache = tuple(cache)

    # first expansion: top-K distinct tokens from the shared prompt state
    logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*K, V]
    logp0 = logp0.reshape(b, k, -1)[:, 0]  # beams identical after prefill
    scores, first_tok = jax.lax.top_k(logp0, k)  # [B, K]
    finished = first_tok == eos_id
    next_ids = first_tok.reshape(b * k, 1).astype(jnp.int32)

    step_jit = jax.jit(
        lambda params, ids_, cache_, pos, scores_, fin: _beam_step(
            engine._decode_step, params, ids_, cache_, pos, scores_, fin,
            b=b, k=k, eos_id=eos_id, pad_id=pad_id,
        ),
        donate_argnums=(2,),
    )

    tokens_np = np.asarray(first_tok)[:, :, None]  # [B, K, 1] history
    pos = l
    for _ in range(beams.max_new_tokens - 1):
        if bool(np.asarray(jnp.all(finished))):
            break
        next_ids, cache, scores, finished, parent, token = step_jit(
            engine.params, next_ids, cache, jnp.int32(pos), scores, finished
        )
        parent_np = np.asarray(parent)
        token_np = np.asarray(token)
        # re-thread histories through parents (host-side bookkeeping only)
        tokens_np = np.take_along_axis(
            tokens_np, parent_np[:, :, None], axis=1
        )
        tokens_np = np.concatenate([tokens_np, token_np[:, :, None]], axis=2)
        pos += 1

    # rank beams under the length penalty
    scores_np = np.asarray(scores)
    out: List[List[Tuple[List[int], float]]] = []
    for row in range(b):
        hyps = []
        for bi in range(k):
            toks = list(tokens_np[row, bi])
            if eos_id in toks:
                toks = toks[: toks.index(eos_id) + 1]
            ln = max(len(toks), 1)
            norm = float(_length_norm(jnp.asarray(ln), beams.length_penalty))
            hyps.append(([int(t) for t in toks], float(scores_np[row, bi]) / norm))
        hyps.sort(key=lambda h: -h[1])
        out.append(hyps[: max(n_best, 1)])
    return out


def beam_search_nbest_paged(
    params,
    cfg,
    policy,
    prompt_ids: Sequence[Sequence[int]],
    beams: BeamParams = BeamParams(),
    eos_id: int = 2,
    n_best: int = 1,
    *,
    kv_dtype=jnp.bfloat16,
    page_size: int = 128,
    num_pages: Optional[int] = None,
    max_seq_len: Optional[int] = None,
) -> List[List[Tuple[List[int], float]]]:
    """Paged-KV beam search with the same n-best surface as
    ``beam_search_nbest``.

    The standalone dense implementation above reorders whole KV rows per
    step (O(cache) gathers); pages make reorder a page-table permutation
    with copy-on-divergence of the current block only, so this is the right
    call for long prompts or large beam widths. Routes through the
    continuous-batching scheduler's beam groups (serve/scheduler.py), which
    own that machinery — rows are processed as queued requests, so ragged
    prompt lengths are fine (the dense API requires equal lengths)."""
    from flexq_tpu.serve.scheduler import BatchScheduler

    prompts = [list(p) for p in prompt_ids]
    msl = max_seq_len or max(len(p) for p in prompts) + beams.max_new_tokens
    msl = -(-msl // page_size) * page_size  # pool wants a page multiple
    sched = BatchScheduler(
        params, cfg, policy,
        num_slots=beams.beam_width,
        max_seq_len=msl,
        kv_dtype=kv_dtype,
        paged=True,
        page_size=page_size,
        num_pages=num_pages,
    )
    rids = [
        sched.add_request(
            p,
            max_new_tokens=beams.max_new_tokens,
            eos_id=eos_id,
            beam_width=beams.beam_width,
            n_best=max(n_best, 1),
            length_penalty=beams.length_penalty,
        )
        for p in prompts
    ]
    sched.run()
    return [
        [(toks, score) for toks, score, _ in sched.done_nbest[rid]]
        for rid in rids
    ]
