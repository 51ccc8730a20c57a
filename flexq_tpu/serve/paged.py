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

from typing import List, Optional, Tuple

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
    ):
        assert page_size % 128 == 0, "page size must be a multiple of 128"
        shape = (num_layers, num_pages, kv_heads, page_size, head_dim)
        self.page_size = page_size
        self.num_pages = num_pages
        self.quantized = dtype == jnp.int8
        self.pool_k = jnp.zeros(shape, dtype)
        self.pool_v = jnp.zeros(shape, dtype)
        if self.quantized:
            self.scale_k = jnp.zeros(shape[:-1], jnp.float32)
            self.scale_v = jnp.zeros(shape[:-1], jnp.float32)
        else:
            self.scale_k = self.scale_v = None
        self._free: List[int] = list(range(num_pages - 1, -1, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int = 1) -> List[int]:
        if len(self._free) < n:
            raise MemoryError(f"page pool exhausted ({n} wanted, {len(self._free)} free)")
        return [self._free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        for p in pages:
            self._free.append(int(p))

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

    def state(self) -> Tuple:
        if self.quantized:
            return (self.pool_k, self.pool_v, self.scale_k, self.scale_v)
        return (self.pool_k, self.pool_v)

    def set_state(self, state: Tuple) -> None:
        if self.quantized:
            self.pool_k, self.pool_v, self.scale_k, self.scale_v = state
        else:
            self.pool_k, self.pool_v = state


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

    def device_table(self) -> jax.Array:
        return jnp.asarray(self.table)
