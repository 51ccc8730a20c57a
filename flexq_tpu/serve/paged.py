"""Paged KV cache: page pool + allocator (vLLM-style block manager).

The reference sizes a dense per-GPU cache [layers, batch, heads, max_len, d]
(Llama.cc:112-115) — every slot pays max_len capacity whether it uses it or
not. Here KV lives in a pool of fixed-size pages; a per-sequence page table
maps logical block i → pool page, so memory scales with actual tokens and
slots can exceed what a dense cache of the same footprint would allow.
The flash-decode kernel follows the indirection in its DMA loop
(kernels/flash_decode.flash_decode_paged) — no gather materialization.

Host side: a free-list allocator (pages are allocated as sequences grow and
recycled on completion). Device side: pool arrays + an int32 page table
passed into the jitted step.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PagePool:
    """Fixed pool of KV pages + free-list allocator.

    Layout: pool_k/v [L, P, KVH, PS, D]; int8 mode adds f32 scale pools
    [L, P, KVH, PS].
    """

    def __init__(
        self,
        num_layers: int,
        num_pages: int,
        kv_heads: int,
        page_size: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        partitions: int = 1,
    ):
        """``partitions`` > 1 splits the page space into data-parallel
        shards: partition d owns global ids [d*P/dp, (d+1)*P/dp) and the
        pool's page axis is sharded over the `data` mesh axis. Page-table
        entries are localized (global % pages_per_partition) before going
        on device, so each rank's in-shard_map lookups index its LOCAL pool
        shard — this is what lifts the round-2 "paged TP requires dp=1"
        restriction (global page ids would fork data-replicated pools)."""
        assert page_size % 128 == 0, "page size must be a multiple of 128"
        assert num_pages % partitions == 0, (num_pages, partitions)
        shape = (num_layers, num_pages, kv_heads, page_size, head_dim)
        self.page_size = page_size
        self.num_pages = num_pages
        self.partitions = partitions
        self.pages_per_partition = num_pages // partitions
        self.quantized = dtype == jnp.int8
        self.pool_k = jnp.zeros(shape, dtype)
        self.pool_v = jnp.zeros(shape, dtype)
        if self.quantized:
            self.scale_k = jnp.zeros(shape[:-1], jnp.float32)
            self.scale_v = jnp.zeros(shape[:-1], jnp.float32)
        else:
            self.scale_k = self.scale_v = None
        ppp = self.pages_per_partition
        self._free: List[List[int]] = [
            list(range((d + 1) * ppp - 1, d * ppp - 1, -1))
            for d in range(partitions)
        ]

    @property
    def free_pages(self) -> int:
        return sum(len(f) for f in self._free)

    def free_in(self, part: int) -> int:
        return len(self._free[part])

    def alloc(self, n: int = 1, part: int = 0) -> List[int]:
        """Allocate n pages from partition `part` (global ids)."""
        free = self._free[part]
        if len(free) < n:
            raise MemoryError(
                f"page pool exhausted ({n} wanted, {len(free)} free in "
                f"partition {part})"
            )
        return [free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        for p in pages:
            self._free[int(p) // self.pages_per_partition].append(int(p))

    def localize(self, table: np.ndarray) -> np.ndarray:
        """Global page-id table -> per-rank local ids (identity at dp=1).
        Unmapped entries (0) localize to 0 = every partition's own garbage
        page (partitions reserve local page 0 at scheduler init)."""
        if self.partitions == 1:
            return table
        return table % self.pages_per_partition

    def pages_for(self, num_tokens: int) -> int:
        return -(-max(num_tokens, 1) // self.page_size)

    def insert_prefill(self, pages: List[int], kv_k1, kv_v1, plen: int,
                       ks1=None, vs1=None) -> None:
        """Copy a B=1 dense prefill cache region [L, 1, KVH, S, D] into the
        allocated pages (page i gets tokens [i*PS, (i+1)*PS)).

        One jitted donated scatter for all pages — per-page .at[].set calls
        would copy the whole multi-GB pool once per page.
        """
        import functools

        n = len(pages)
        key = (n, self.quantized)
        if not hasattr(self, "_insert_jit"):
            self._insert_jit = {}
        if key not in self._insert_jit:
            ps = self.page_size

            @functools.partial(jax.jit, donate_argnums=(0,))
            def ins(pool, region, idx):
                # region [L, n*PS, KVH, ...] -> paged [L, n, KVH, PS, ...]
                l = region.shape[0]
                r = region.reshape((l, n, ps) + region.shape[2:])
                r = jnp.moveaxis(r, 2, 3)  # [L, n, KVH, PS, ...]
                return pool.at[:, idx].set(r)

            self._insert_jit[key] = ins
        ins = self._insert_jit[key]
        idx = jnp.asarray(pages, jnp.int32)
        ps = self.page_size

        def region(x):  # [L, 1, KVH, S>=n*PS, D?] -> [L, n*PS, KVH, ...]
            return jnp.swapaxes(x[:, 0, :, : len(pages) * ps], 1, 2)

        self.pool_k = ins(self.pool_k, region(kv_k1), idx)
        self.pool_v = ins(self.pool_v, region(kv_v1), idx)
        if self.quantized:
            self.scale_k = ins(self.scale_k, region(ks1), idx)
            self.scale_v = ins(self.scale_v, region(vs1), idx)

    def gather_prefix(self, pages: List[int], scratch: Tuple) -> Tuple:
        """Fill a B=1 scratch cache's leading region from pool pages.

        scratch = (k, v[, ks, vs]) with k/v [L, 1, KVH, S, D]; page i of
        ``pages`` lands at tokens [i*PS, (i+1)*PS). One jitted donated
        scatter (same rationale as insert_prefill). Used by prefix caching:
        reused prompt pages seed the scratch so suffix prefill attends over
        them without recomputing their K/V.
        """
        import functools

        m = len(pages)
        key = ("gather", m, self.quantized)
        if not hasattr(self, "_gather_jit"):
            self._gather_jit = {}
        if key not in self._gather_jit:
            ps = self.page_size

            @functools.partial(jax.jit, donate_argnums=(1,))
            def gat(pool, scratch_arr, idx):
                r = pool[:, idx]  # [L, m, KVH, PS, ...]
                r = jnp.moveaxis(r, 1, 2)  # [L, KVH, m, PS, ...]
                r = r.reshape(r.shape[:2] + (m * ps,) + r.shape[4:])
                return jax.lax.dynamic_update_slice(
                    scratch_arr,
                    r[:, None].astype(scratch_arr.dtype),
                    (0,) * scratch_arr.ndim,
                )

            self._gather_jit[key] = gat
        gat = self._gather_jit[key]
        idx = jnp.asarray(pages, jnp.int32)
        out = (gat(self.pool_k, scratch[0], idx), gat(self.pool_v, scratch[1], idx))
        if self.quantized:
            out += (gat(self.scale_k, scratch[2], idx), gat(self.scale_v, scratch[3], idx))
        return out

    def copy_pages(self, src: Sequence[int], dst: Sequence[int]) -> None:
        """pool[:, dst[i]] = pool[:, src[i]] for all buffers — the paged
        beam-search copy-on-divergence primitive (one donated dispatch for
        all pairs, vs the dense path's whole-row reorder which moves
        max_len/page_size times more data per beam)."""
        import functools

        if not src:
            return
        key = ("copy", len(src))
        if not hasattr(self, "_copy_jit"):
            self._copy_jit = {}
        if key not in self._copy_jit:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def cp(pool, s, d):
                return pool.at[:, d].set(pool[:, s], unique_indices=True)

            self._copy_jit[key] = cp
        cp = self._copy_jit[key]
        s = jnp.asarray(src, jnp.int32)
        d = jnp.asarray(dst, jnp.int32)
        self.pool_k = cp(self.pool_k, s, d)
        self.pool_v = cp(self.pool_v, s, d)
        if self.quantized:
            self.scale_k = cp(self.scale_k, s, d)
            self.scale_v = cp(self.scale_v, s, d)

    def state(self) -> Tuple:
        if self.quantized:
            return (self.pool_k, self.pool_v, self.scale_k, self.scale_v)
        return (self.pool_k, self.pool_v)

    def set_state(self, state: Tuple) -> None:
        if self.quantized:
            self.pool_k, self.pool_v, self.scale_k, self.scale_v = state
        else:
            self.pool_k, self.pool_v = state


class PrefixRegistry:
    """Content-addressed prompt-page cache (vLLM-style automatic prefix
    caching — exceeds the reference, which has no KV reuse of any kind).

    A FULL prompt page is identified by the hash chain of every token from
    position 0 through its last token, so equal hashes imply identical
    K/V contents (RoPE is applied at absolute positions and shared prefixes
    start at 0). Pages in use by a slot carry a refcount; pages whose last
    user finished are RETAINED in an LRU instead of freed, and evicted back
    to the pool only under allocation pressure.
    """

    def __init__(self):
        self.by_hash: Dict[int, int] = {}  # chain hash -> page id
        self.page_hash: Dict[int, int] = {}  # page id -> chain hash
        self.rc: Dict[int, int] = {}  # page id -> active references
        self.retained: "OrderedDict[int, None]" = OrderedDict()  # rc==0 LRU
        self.hits = 0  # full-page reuse events (observability)
        self.misses = 0

    @staticmethod
    def hash_chain(tokens: Sequence[int], page_size: int) -> List[int]:
        """Chain hash per FULL page of the token sequence."""
        out: List[int] = []
        h = 0
        for i in range(len(tokens) // page_size):
            h = hash((h, tuple(tokens[i * page_size : (i + 1) * page_size])))
            out.append(h)
        return out

    def match(self, hashes: Sequence[int]) -> List[int]:
        """Longest run of already-cached pages for this hash chain.
        Hit/miss accounting happens in `acquire`/`account_miss` — the
        scheduler may clamp the match to chunk alignment, and counting here
        would overstate actual reuse on /metrics."""
        pages: List[int] = []
        for h in hashes:
            p = self.by_hash.get(h)
            if p is None:
                break
            pages.append(p)
        return pages

    def acquire(self, pages: Sequence[int]) -> None:
        self.hits += len(pages)
        for p in pages:
            self.rc[p] = self.rc.get(p, 0) + 1
            self.retained.pop(p, None)

    def account_miss(self, n: int) -> None:
        self.misses += max(n, 0)

    def register(self, h: int, page: int) -> bool:
        """Publish a freshly-written full prompt page. Returns False when a
        concurrent slot already published this hash (the duplicate page then
        stays private to its slot and is freed normally)."""
        if h in self.by_hash:
            return False
        self.by_hash[h] = page
        self.page_hash[page] = h
        self.rc[page] = self.rc.get(page, 0) + 1
        return True

    def release(self, pages: Sequence[int]) -> List[int]:
        """Drop one reference per page; returns the subset that is NOT
        registered (caller frees those to the pool). Registered pages whose
        refcount hits 0 move to the retained LRU."""
        free_now: List[int] = []
        for p in pages:
            if p not in self.page_hash:
                free_now.append(p)
                continue
            self.rc[p] -= 1
            if self.rc[p] == 0:
                self.retained[p] = None
                self.retained.move_to_end(p)
        return free_now

    @property
    def reclaimable(self) -> int:
        return len(self.retained)

    def evict(self, n: int) -> List[int]:
        """Unregister up to n LRU retained pages; caller frees them."""
        out: List[int] = []
        while self.retained and len(out) < n:
            p, _ = self.retained.popitem(last=False)
            h = self.page_hash.pop(p)
            del self.by_hash[h]
            del self.rc[p]
            out.append(p)
        return out


class PageTable:
    """Host-managed per-slot page tables, exported as one int32 array."""

    def __init__(self, num_slots: int, max_pages: int):
        self.table = np.zeros((num_slots, max_pages), np.int32)
        self.num_blocks = np.zeros(num_slots, np.int32)

    def assign(self, slot: int, pages: List[int]) -> None:
        self.table[slot, : len(pages)] = pages
        self.table[slot, len(pages):] = 0
        self.num_blocks[slot] = len(pages)

    def append(self, slot: int, page: int) -> None:
        self.table[slot, self.num_blocks[slot]] = page
        self.num_blocks[slot] += 1

    def release(self, slot: int) -> List[int]:
        pages = list(self.table[slot, : self.num_blocks[slot]])
        self.table[slot] = 0
        self.num_blocks[slot] = 0
        return pages
