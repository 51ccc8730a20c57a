"""Continuous batching scheduler (slot-based).

Replaces the reference's static batch decode loop (Llama.cc:970-1240, where
every sequence in the batch enters and leaves together) with per-slot
admission: a fixed number of KV-cache slots, each independently holding one
request; new requests prefill into a free slot while other slots keep
decoding. This is what BASELINE config 4 ("continuous-batching serving")
requires and what FasterTransformer never had.

Design: one jitted multi-slot decode step with *per-slot* positions and
masks (vector cache_pos → scatter updates); prefill runs at B=1 into a
scratch cache and is inserted into the slot's region of the big cache.
Inactive slots decode garbage that is never surfaced — the usual
fixed-shape trick, so no recompilation as requests come and go.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Any, Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.models.quantized import forward_serve
from flexq_tpu.serve.engine import prefill_mask
from flexq_tpu.serve.sampling import SamplingParams, process_logits, sample


@dataclasses.dataclass
class _Slot:
    req_id: Optional[int] = None
    pos: int = 0  # next cache position to write
    generated: List[int] = dataclasses.field(default_factory=list)
    sampling: SamplingParams = SamplingParams()
    eos_id: int = 2
    max_new: int = 64
    prompt: List[int] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class _Pending:
    req_id: int
    prompt: List[int]
    sampling: SamplingParams
    max_new: int
    eos_id: int


class BatchScheduler:
    """Slot-based continuous batching over the quantized serve path."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig,
        policy: QuantPolicy,
        num_slots: int = 4,
        max_seq_len: int = 512,
        kv_dtype=jnp.bfloat16,
        seed: int = 0,
        paged: bool = False,
        page_size: int = 128,
        num_pages: Optional[int] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.policy = policy
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len
        self.paged = paged
        self.quantized = kv_dtype == jnp.int8
        if paged:
            # paged pool: memory scales with live tokens, not slots*max_len
            # (exceeds the reference's dense per-GPU cache, Llama.cc:112-115)
            from flexq_tpu.serve.paged import PagePool, PageTable

            assert max_seq_len % page_size == 0
            if num_pages is None:
                num_pages = num_slots * (max_seq_len // page_size) + 1
            self.pool = PagePool(
                cfg.num_layers, num_pages, cfg.num_kv_heads, page_size,
                cfg.head_dim, dtype=kv_dtype,
            )
            self.ptable = PageTable(num_slots, max_seq_len // page_size)
            # page 0 is the garbage page: inactive slots (table all-zero)
            # decode junk into it without corrupting live pages
            garbage = self.pool.alloc(1)
            assert garbage == [0]
            self.kv_k = self.kv_v = None
        else:
            shape = (cfg.num_layers, num_slots, cfg.num_kv_heads, max_seq_len, cfg.head_dim)
            self.kv_k = jnp.zeros(shape, kv_dtype)
            self.kv_v = jnp.zeros(shape, kv_dtype)
            if self.quantized:
                self.kv_ks = jnp.zeros(shape[:-1], jnp.float32)
                self.kv_vs = jnp.zeros(shape[:-1], jnp.float32)
        self.slots = [_Slot() for _ in range(num_slots)]
        self.pending: Deque[_Pending] = deque()
        self.done: Dict[int, List[int]] = {}
        self.last_tokens = jnp.zeros((num_slots, 1), jnp.int32)
        self._req_counter = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        if paged:
            self._step_jit = jax.jit(self._step_paged_fn, donate_argnums=(2, 3))
        else:
            self._step_jit = jax.jit(self._step_fn, donate_argnums=(2, 3))
        self._prefill_cache: Dict[int, Any] = {}

    # ---- jitted pieces -------------------------------------------------
    def _step_fn(self, params, ids, cache, positions):
        """One decode step over all slots; per-slot positions [S].
        ``cache`` = (k, v) or (k, v, ks, vs) for the int8 quantized cache."""
        ki = jnp.arange(self.max_seq_len)[None, None, None, :]
        mask = jnp.where(
            ki <= positions[:, None, None, None], 0.0, jnp.finfo(jnp.float32).min
        )
        scales = (
            {"kv_k_scale": cache[2], "kv_v_scale": cache[3]}
            if len(cache) == 4
            else {}
        )
        logits, kv = forward_serve(
            params,
            self.cfg,
            self.policy,
            ids,
            positions=positions[:, None],
            kv_k=cache[0],
            kv_v=cache[1],
            cache_pos=positions,
            mask=mask,
            **scales,
        )
        return logits[:, 0], kv

    def _step_paged_fn(self, params, ids, cache, positions, table):
        """Paged decode step: pools + page table instead of a dense cache."""
        scales = (
            {"kv_k_scale": cache[2], "kv_v_scale": cache[3]}
            if len(cache) == 4
            else {}
        )
        logits, kv = forward_serve(
            params,
            self.cfg,
            self.policy,
            ids,
            positions=positions[:, None],
            kv_k=cache[0],
            kv_v=cache[1],
            cache_pos=positions,
            page_table=table,
            **scales,
        )
        return logits[:, 0], kv

    def _prefill_one(self, prompt: List[int]):
        """B=1 prefill -> (last logits [V], small kv cache state).

        The scratch cache is sized to the prompt rounded up to a page (or
        128) — NOT max_seq_len: a full-length dense scratch per admission
        would spike memory by exactly what paging saves. One compile per
        (prompt_len, bucket) pair.
        """
        l = len(prompt)
        unit = self.pool.page_size if self.paged else 128
        bucket = -(-l // unit) * unit
        key = (l, bucket)
        if key not in self._prefill_cache:
            shape1 = (
                self.cfg.num_layers,
                1,
                self.cfg.num_kv_heads,
                bucket,
                self.cfg.head_dim,
            )

            def fn(params, ids):
                dt = self.pool.pool_k.dtype if self.paged else self.kv_k.dtype
                kv_k = jnp.zeros(shape1, dt)
                kv_v = jnp.zeros(shape1, dt)
                scales = (
                    {
                        "kv_k_scale": jnp.zeros(shape1[:-1], jnp.float32),
                        "kv_v_scale": jnp.zeros(shape1[:-1], jnp.float32),
                    }
                    if self.quantized
                    else {}
                )
                logits, kv = forward_serve(
                    params,
                    self.cfg,
                    self.policy,
                    ids,
                    kv_k=kv_k,
                    kv_v=kv_v,
                    cache_pos=jnp.int32(0),
                    mask=prefill_mask(ids.shape[1], bucket),
                    **scales,
                )
                return logits[:, -1], kv

            self._prefill_cache[key] = jax.jit(fn)
        ids = jnp.asarray(np.asarray(prompt, np.int32))[None]
        return self._prefill_cache[key](self.params, ids)

    # ---- public API ----------------------------------------------------
    def add_request(
        self,
        prompt: Sequence[int],
        sampling: SamplingParams = SamplingParams(),
        max_new_tokens: int = 64,
        eos_id: int = 2,
    ) -> int:
        req_id = next(self._req_counter)
        assert len(prompt) + max_new_tokens <= self.max_seq_len
        self.pending.append(
            _Pending(req_id, list(prompt), sampling, max_new_tokens, eos_id)
        )
        return req_id

    @property
    def has_work(self) -> bool:
        return bool(self.pending) or any(s.req_id is not None for s in self.slots)

    def _admit(self):
        for i, slot in enumerate(self.slots):
            if slot.req_id is not None or not self.pending:
                continue
            req = self.pending.popleft()
            if self.paged and self.pool.free_pages < self.pool.pages_for(
                len(req.prompt) + req.max_new
            ):
                self.pending.appendleft(req)  # not enough pages yet; retry later
                break
            logits, kv1 = self._prefill_one(req.prompt)
            plen = len(req.prompt)
            if self.paged:
                pages = self.pool.alloc(self.pool.pages_for(plen))
                self.pool.insert_prefill(pages, kv1[0], kv1[1], plen,
                                         *(kv1[2:] if self.quantized else ()))
                self.ptable.assign(i, pages)
            else:
                # insert the prefilled KV region into slot i
                self.kv_k = jax.lax.dynamic_update_slice(
                    self.kv_k, kv1[0][:, :, :, :plen], (0, i, 0, 0, 0)
                )
                self.kv_v = jax.lax.dynamic_update_slice(
                    self.kv_v, kv1[1][:, :, :, :plen], (0, i, 0, 0, 0)
                )
                if self.quantized:
                    self.kv_ks = jax.lax.dynamic_update_slice(
                        self.kv_ks, kv1[2][:, :, :, :plen], (0, i, 0, 0)
                    )
                    self.kv_vs = jax.lax.dynamic_update_slice(
                        self.kv_vs, kv1[3][:, :, :, :plen], (0, i, 0, 0)
                    )
            slot.req_id = req.req_id
            slot.pos = plen
            slot.generated = []
            slot.sampling = req.sampling
            slot.eos_id = req.eos_id
            slot.max_new = req.max_new
            slot.prompt = req.prompt
            # sample the first token from the prefill logits
            tok = self._sample_one(logits[0], slot)
            self._record(i, slot, tok)

    def _sample_one(self, logits_row: jax.Array, slot: _Slot) -> int:
        counts = np.zeros((1, self.cfg.vocab_size), np.int32)
        for t in slot.prompt + slot.generated:
            counts[0, t] += 1
        proc = process_logits(
            logits_row[None],
            slot.sampling,
            token_counts=jnp.asarray(counts),
            cur_length=jnp.asarray([len(slot.generated)], jnp.int32),
            eos_id=slot.eos_id,
        )
        self._key, sub = jax.random.split(self._key)
        return int(sample(proc, slot.sampling, sub)[0])

    def _record(self, i: int, slot: _Slot, tok: int):
        slot.generated.append(tok)
        self.last_tokens = self.last_tokens.at[i, 0].set(tok)
        if tok == slot.eos_id or len(slot.generated) >= slot.max_new:
            self.done[slot.req_id] = slot.generated
            if self.paged:
                self.pool.free(p for p in self.ptable.release(i) if p != 0)
            self.slots[i] = _Slot()

    def step(self) -> Dict[int, List[int]]:
        """Admit pending requests, run one decode tick, return finished."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s.req_id is not None]
        if active:
            positions = jnp.asarray(
                [s.pos if s.req_id is not None else 0 for s in self.slots], jnp.int32
            )
            if self.paged:
                ps = self.pool.page_size
                for i in active:
                    # the write at pos may open a new logical block
                    needed = self.slots[i].pos // ps + 1
                    while self.ptable.num_blocks[i] < needed:
                        self.ptable.append(i, self.pool.alloc(1)[0])
                logits, state = self._step_jit(
                    self.params, self.last_tokens, self.pool.state(), positions,
                    self.ptable.device_table(),
                )
                self.pool.set_state(state)
            else:
                cache = (
                    (self.kv_k, self.kv_v, self.kv_ks, self.kv_vs)
                    if self.quantized
                    else (self.kv_k, self.kv_v)
                )
                logits, cache = self._step_jit(
                    self.params, self.last_tokens, cache, positions
                )
                if self.quantized:
                    self.kv_k, self.kv_v, self.kv_ks, self.kv_vs = cache
                else:
                    self.kv_k, self.kv_v = cache
            logits_np = logits  # device array; sampled per active slot
            for i in active:
                slot = self.slots[i]
                slot.pos += 1
                tok = self._sample_one(logits_np[i], slot)
                self._record(i, slot, tok)
        finished, self.done = self.done, {}
        return finished

    def run(self) -> Dict[int, List[int]]:
        """Drain all requests; returns {req_id: generated tokens}."""
        out: Dict[int, List[int]] = {}
        while self.has_work:
            out.update(self.step())
        return out
