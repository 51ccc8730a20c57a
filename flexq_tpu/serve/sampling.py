"""Token sampling / decode post-processing (jit-friendly).

Functional re-design of the reference's DynamicDecodeLayer stack
(e2e layers/DynamicDecodeLayer.cc → sampling_layers/TopKSamplingLayer,
TopPSamplingLayer, penalty kernels, stop-criteria kernels). Beam search is
intentionally out of scope for serving parity v1 (the reference's FlexQ
benchmarks all run sampling/greedy paths).

All transforms are pure [B, V] logits -> logits so they compose under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request decode config (reference [request] INI section,
    examples/cpp/llama/llama_config.ini)."""

    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1.0 = disabled
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    min_length: int = 0
    greedy: bool = True


def apply_temperature(logits: jax.Array, temperature: float) -> jax.Array:
    if temperature == 1.0:
        return logits
    return logits / jnp.maximum(temperature, 1e-6)


def apply_repetition_penalty(
    logits: jax.Array, token_counts: jax.Array, penalty: float
) -> jax.Array:
    """CTRL-style: seen tokens' positive logits divided, negative multiplied
    (matches FT invokeBatchApplyRepetitionPenalty semantics)."""
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_presence_frequency_penalty(
    logits: jax.Array, token_counts: jax.Array, presence: float, frequency: float
) -> jax.Array:
    if presence == 0.0 and frequency == 0.0:
        return logits
    return (
        logits
        - presence * (token_counts > 0).astype(logits.dtype)
        - frequency * token_counts.astype(logits.dtype)
    )


def apply_min_length(
    logits: jax.Array, cur_length: jax.Array, min_length: int, eos_id: int
) -> jax.Array:
    """Ban EOS until min_length tokens are generated (FT invokeMinLengthPenalty).

    logits [B, V]; cur_length int [B].
    """
    if min_length <= 0:
        return logits
    ban = cur_length.reshape(-1) < min_length  # [B]
    return logits.at[:, eos_id].set(jnp.where(ban, NEG_INF, logits[:, eos_id]))


def apply_bad_words(logits: jax.Array, bad_words_mask: Optional[jax.Array]) -> jax.Array:
    """bad_words_mask: bool [V] (or [B, V]) — True = banned
    (FT invokeBanBadWords single-token equivalent)."""
    if bad_words_mask is None:
        return logits
    return jnp.where(bad_words_mask, NEG_INF, logits)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering. Keeps the smallest prefix of the sorted distribution
    with cumulative probability >= p (always keeps the top token)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # number of tokens kept per row: first index where cum >= p, inclusive
    keep_sorted = cum - probs < p
    kth = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # >= 1
    cutoff = jnp.take_along_axis(sorted_logits, kth - 1, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def process_logits(
    logits: jax.Array,  # [B, V] f32/bf16
    params: SamplingParams,
    token_counts: Optional[jax.Array] = None,  # int32 [B, V]
    cur_length: Optional[jax.Array] = None,  # int32 [B]
    eos_id: int = 2,
    bad_words_mask: Optional[jax.Array] = None,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_repetition_penalty(
            logits, token_counts, params.repetition_penalty
        )
        logits = apply_presence_frequency_penalty(
            logits, token_counts, params.presence_penalty, params.frequency_penalty
        )
    if cur_length is not None:
        logits = apply_min_length(logits, cur_length, params.min_length, eos_id)
    logits = apply_bad_words(logits, bad_words_mask)
    logits = apply_temperature(logits, params.temperature)
    logits = apply_top_k(logits, params.top_k)
    logits = apply_top_p(logits, params.top_p)
    return logits


def dynamic_params(params: SamplingParams) -> jax.Array:
    """Float sampling knobs as one traced f32[6] operand (see
    process_logits_dynamic)."""
    return jnp.asarray(
        [
            params.temperature, params.top_p, params.repetition_penalty,
            params.presence_penalty, params.frequency_penalty,
            params.min_length,
        ],
        jnp.float32,
    )


def structural_key(params: SamplingParams):
    """The parts of SamplingParams that shape the compiled program under
    process_logits_dynamic (everything else is a traced operand)."""
    return (params.greedy, params.top_k, params.top_p < 1.0)


def process_logits_dynamic(
    logits: jax.Array,  # [B, V]
    dyn: jax.Array,  # f32 [6] from dynamic_params()
    top_k: int,
    use_top_p: bool,
    token_counts: Optional[jax.Array] = None,  # int32 [B, V]
    cur_length: Optional[jax.Array] = None,  # int32 [B]
    eos_ids: Optional[jax.Array] = None,  # int32 [B] (per-row eos)
) -> jax.Array:
    """process_logits with the FLOAT knobs (temperature, top_p value,
    penalties, min_length) as traced operands: a serving scheduler would
    otherwise recompile its full K-step decode program for every novel
    client temperature (10-20 min per compile at 7B on the remote TPU).
    Only `top_k` (a shape) and `use_top_p` (a whole sort) stay static.
    For matching parameter values the math is identical to
    process_logits — neutral values are exact no-ops (x/1.0, x-0.0)."""
    temp, top_p, rep, pres, freq, min_len = (dyn[i] for i in range(6))
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        seen = token_counts > 0
        pen = jnp.where(logits > 0, logits / rep, logits * rep)
        logits = jnp.where(seen, pen, logits)
        logits = (
            logits
            - pres * seen.astype(jnp.float32)
            - freq * token_counts.astype(jnp.float32)
        )
    if cur_length is not None and eos_ids is not None:
        rows = jnp.arange(logits.shape[0])
        ban = cur_length.astype(jnp.float32) < min_len
        cur = logits[rows, eos_ids]
        logits = logits.at[rows, eos_ids].set(jnp.where(ban, NEG_INF, cur))
    logits = logits / jnp.maximum(temp, 1e-6)
    if top_k > 0:
        logits = apply_top_k(logits, top_k)
    if use_top_p:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = cum - probs < top_p
        kth = jnp.maximum(
            jnp.sum(keep_sorted, axis=-1, keepdims=True).astype(jnp.int32), 1
        )
        cutoff = jnp.take_along_axis(sorted_logits, kth - 1, axis=-1)
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return logits


def sample(
    logits: jax.Array,  # [B, V] already processed
    params: SamplingParams,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert key is not None, "stochastic sampling needs a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
