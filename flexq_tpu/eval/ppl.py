"""Perplexity evaluation (reference algorithm/main.py:43-121 `evaluate`).

ppl = exp( Σ_i nll_i / (nsamples · seqlen) ) where nll_i is the summed causal
cross-entropy of window i with shift-by-one labels — identical accounting to
the reference's loop (main.py:104-119: loss.float() * seqlen, / (n · seqlen)).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def window_nll(logits: jax.Array, ids: jax.Array) -> jax.Array:
    """Summed next-token NLL over one [B, L] window (f32)."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    picked = jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)
    return -jnp.sum(picked)


def perplexity(
    forward_fn: Callable[..., jax.Array],
    windows: np.ndarray,  # [n, seqlen] int32
    batch_size: int = 1,
    progress: Optional[Callable[[int, int], None]] = None,
    params=None,
) -> float:
    """forward_fn: ids [B, L] -> logits [B, L, V] (jit recommended).

    With ``params``: forward_fn(params, ids) and the param tree rides as a
    traced ARGUMENT — a closure-captured tree bakes every weight into the
    compiled graph as constants, which breaks the remote compile service on
    multi-GB models ("response body closed"; CLAUDE.md remote-compile
    gotcha) and recompiles per quant-policy copy.
    """
    n, seqlen = windows.shape
    if params is None:
        nll_fn = jax.jit(lambda ids: window_nll(forward_fn(ids), ids))
        run = lambda batch: nll_fn(batch)
    else:
        nll_fn = jax.jit(lambda p, ids: window_nll(forward_fn(p, ids), ids))
        run = lambda batch: nll_fn(params, batch)
    total = 0.0
    tokens = 0
    for i in range(0, n, batch_size):
        # the tail batch may be short — evaluate it anyway (one extra jit
        # compile at the ragged shape) so every window counts toward ppl
        batch = jnp.asarray(windows[i : i + batch_size])
        total += float(run(batch))
        tokens += batch.shape[0] * (seqlen - 1)
        if progress:
            progress(i + batch.shape[0], n)
    # reference divides by nsamples*seqlen using per-window mean loss over
    # seqlen-1 label positions scaled by seqlen — net effect equals mean nll
    # per label position; we report the direct token-level perplexity.
    return float(np.exp(total / tokens))
