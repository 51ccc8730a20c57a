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
from flexq_tpu.models.llama import span_mask
from flexq_tpu.serve.sampling import (
    NEG_INF, SamplingParams, dynamic_params, process_logits,
    process_logits_dynamic, sample, structural_key,
)


def _cache_spec(cfg, mesh, scales: bool = False, batch_ax=None):
    """Sharding for KV buffers: [L, B|P, KVH, S(, D)]. ``batch_ax`` shards
    axis 1 over `data`: the slot dim of a dense cache, or a page pool's
    page axis (per-data-shard pool partitions, localized tables).
    ``scales`` drops the head_dim axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    head_ax = "model" if cfg.num_kv_heads >= mesh.shape["model"] else None
    dims = (None, batch_ax, head_ax, None) + (() if scales else (None,))
    return NamedSharding(mesh, P(*dims))


@dataclasses.dataclass
class _Slot:
    req_id: Optional[int] = None
    pos: int = 0  # next cache position to write
    generated: List[int] = dataclasses.field(default_factory=list)
    sampling: SamplingParams = SamplingParams()
    eos_id: int = 2
    max_new: int = 64
    prompt: List[int] = dataclasses.field(default_factory=list)
    # chunked-prefill admission state (phase == "prefill" while the prompt
    # is being chunked into the scratch cache; decode ticks skip the slot)
    phase: str = "decode"
    prefill_pos: int = 0
    bucket: int = 0
    scratch: Optional[Tuple] = None
    prior: List[int] = dataclasses.field(default_factory=list)
    # per-token log probs (requested via add_request(logprobs=True))
    want_logprobs: bool = False
    lps: List[float] = dataclasses.field(default_factory=list)
    prior_lps: List[float] = dataclasses.field(default_factory=list)
    # prefix-cache state (paged mode): pages reused from the registry, the
    # token length they cover (chunk-aligned), and the prompt's full-page
    # hash chain for registering freshly written pages
    shared_pages: List[int] = dataclasses.field(default_factory=list)
    prefix_len: int = 0
    page_hashes: List[int] = dataclasses.field(default_factory=list)
    # True while this slot is one lane of a beam-search group (the group,
    # keyed by req_id, owns sampling: the slot skips _sample_one/_record)
    beam: bool = False


@dataclasses.dataclass
class _Pending:
    req_id: int
    prompt: List[int]
    sampling: SamplingParams
    max_new: int
    eos_id: int
    # tokens already generated before a preemption: the request re-prefills
    # with prompt+prior and they are prepended to the final output
    prior: List[int] = dataclasses.field(default_factory=list)
    want_logprobs: bool = False
    prior_lps: List[float] = dataclasses.field(default_factory=list)
    # beam search (beam_width > 1): the request occupies beam_width slots
    beam_width: int = 1
    n_best: int = 1
    length_penalty: float = 1.0


@dataclasses.dataclass
class _BeamGroup:
    """Host state of one in-flight beam-search request (reference
    DynamicDecodeLayer.cc:519 -> OnlineBeamSearchLayer: cumulative scores,
    finished flags, per-step parent indirection). The k beams live in k
    scheduler slots and decode inside the SAME batched step as regular
    requests; after each step the group reorders its slots' KV-cache rows
    by parent (the TPU analogue of FT's cache_indir pointer chasing)."""

    req_id: int
    slots: List[int]
    k: int
    n_best: int
    eos_id: int
    max_new: int
    length_penalty: float
    scores: np.ndarray  # [k] f32 cumulative log-probs
    finished: np.ndarray  # [k] bool
    histories: List[List[int]]  # [k] token lists (pads after finish)
    # per-beam per-token logprobs (threaded through parents like histories);
    # the pad continuation of a frozen beam contributes 0.0
    want_logprobs: bool = False
    lps: List[List[float]] = dataclasses.field(default_factory=list)


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
        prefill_chunk: Optional[int] = None,
        mesh=None,
        prefix_cache: bool = False,
        fused_tick: int = 0,
        pp_mesh=None,
        max_prefilling: Optional[int] = None,
    ):
        # mesh => multi-device serving: params TP-sharded (column/row split),
        # KV cache / page pool (values AND int8 scales) sharded on the
        # kv-head axis, every scheduler step a shard_map TP forward
        # (parallel/tp.py). dp>1 additionally shards the slot dim of the
        # dense cache — or the page axis of a paged pool (per-data-shard
        # partitions with localized page ids) — over `data`.
        self.mesh = mesh
        # pp_mesh => pipeline-parallel continuous batching: stacked layer
        # params + the dense cache's layer axis sharded over `pipe`, every
        # tick one serve_step_pp (stage-serial ppermute hops; reference
        # Llama.cc:970-1240 decode-PP through the engine). Dense cache only;
        # fused ticks stay off (PP latency is boundary hops, not dispatch).
        self.pp_mesh = pp_mesh
        if pp_mesh is not None:
            assert mesh is None, "pp_mesh and mesh are mutually exclusive (v1)"
            assert not paged and not prefix_cache, "PP scheduler: dense cache"
            assert fused_tick == 0, "fused ticks unsupported under PP"
            from flexq_tpu.parallel.pp import shard_params_pp

            params = shard_params_pp(params, pp_mesh)
        self._dp = 1 if mesh is None else mesh.shape.get("data", 1)
        if mesh is not None:
            from flexq_tpu.parallel.tp import shard_params

            assert num_slots % self._dp == 0, (
                f"num_slots {num_slots} must divide by dp {self._dp}"
            )
            if paged and self._dp > 1:
                # per-data-shard page pools: the pool's page axis and the
                # table's slot axis shard over `data`; each shard's slots
                # allocate only from its own partition and table entries
                # are localized before dispatch (PagePool docstring)
                assert not prefix_cache, (
                    "prefix_cache requires dp=1 (reuse would be "
                    "partition-local; pages cannot cross data shards)"
                )
            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.policy = policy
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len
        self.paged = paged
        self.quantized = kv_dtype == jnp.int8
        # chunked-prefill admission: long prompts prefill `prefill_chunk`
        # tokens per scheduler tick instead of one monolithic pass, so
        # decoding slots keep emitting tokens while a long prompt is being
        # admitted (the reference stalls its whole static batch on one
        # O(L²) context pass, LlamaContextDecoder.cc).
        self.prefill_chunk = prefill_chunk
        # automatic prefix caching (vLLM-style; paged mode only): full prompt
        # pages are content-addressed and reused across requests; suffix
        # prefill attends over reused pages gathered into its scratch.
        # Reuse granularity = prefill_chunk so chunk starts stay aligned.
        self.registry = None
        if prefix_cache:
            assert paged, "prefix_cache requires paged=True"
            if self.prefill_chunk is None:
                self.prefill_chunk = page_size
            assert self.prefill_chunk % page_size == 0, (
                "prefix_cache needs prefill_chunk to be a page multiple"
            )
            from flexq_tpu.serve.paged import PrefixRegistry

            self.registry = PrefixRegistry()
        if paged:
            # paged pool: memory scales with live tokens, not slots*max_len
            # (exceeds the reference's dense per-GPU cache, Llama.cc:112-115)
            from flexq_tpu.serve.paged import PagePool, PageTable

            assert max_seq_len % page_size == 0
            if num_pages is None:
                num_pages = num_slots * (max_seq_len // page_size) + self._dp
            num_pages += (-num_pages) % self._dp  # equal partitions
            self.pool = PagePool(
                cfg.num_layers, num_pages, cfg.num_kv_heads, page_size,
                cfg.head_dim, dtype=kv_dtype, partitions=self._dp,
            )
            if mesh is not None:
                page_ax = "data" if self._dp > 1 else None
                sh = _cache_spec(cfg, mesh, batch_ax=page_ax)
                self.pool.pool_k = jax.device_put(self.pool.pool_k, sh)
                self.pool.pool_v = jax.device_put(self.pool.pool_v, sh)
                if self.quantized:
                    ssh = _cache_spec(cfg, mesh, scales=True, batch_ax=page_ax)
                    self.pool.scale_k = jax.device_put(self.pool.scale_k, ssh)
                    self.pool.scale_v = jax.device_put(self.pool.scale_v, ssh)
            self.ptable = PageTable(num_slots, max_seq_len // page_size)
            # local page 0 of every partition is that shard's garbage page:
            # inactive slots (table all-zero) decode junk into it without
            # corrupting live pages
            for d in range(self._dp):
                garbage = self.pool.alloc(1, part=d)
                assert garbage == [d * self.pool.pages_per_partition]
            self.kv_k = self.kv_v = None
        else:
            shape = (cfg.num_layers, num_slots, cfg.num_kv_heads, max_seq_len, cfg.head_dim)
            self.kv_k = jnp.zeros(shape, kv_dtype)
            self.kv_v = jnp.zeros(shape, kv_dtype)
            if self.quantized:
                self.kv_ks = jnp.zeros(shape[:-1], jnp.float32)
                self.kv_vs = jnp.zeros(shape[:-1], jnp.float32)
            if mesh is not None:
                batch_ax = "data" if self._dp > 1 else None
                sh = _cache_spec(cfg, mesh, batch_ax=batch_ax)
                self.kv_k = jax.device_put(self.kv_k, sh)
                self.kv_v = jax.device_put(self.kv_v, sh)
                if self.quantized:
                    ssh = _cache_spec(cfg, mesh, scales=True, batch_ax=batch_ax)
                    self.kv_ks = jax.device_put(self.kv_ks, ssh)
                    self.kv_vs = jax.device_put(self.kv_vs, ssh)
            elif pp_mesh is not None:
                from flexq_tpu.parallel.pp import shard_cache_pp

                self.kv_k, self.kv_v = shard_cache_pp(
                    pp_mesh, self.kv_k, self.kv_v
                )
                if self.quantized:
                    self.kv_ks, self.kv_vs = shard_cache_pp(
                        pp_mesh, self.kv_ks, self.kv_vs
                    )
        self.slots = [_Slot() for _ in range(num_slots)]
        self.pending: Deque[_Pending] = deque()
        self.done: Dict[int, List[int]] = {}
        self.done_logprobs: Dict[int, List[float]] = {}
        # beam search: req_id -> group; done_nbest: req_id -> ranked
        # [(tokens, length-penalized score)] for HTTP n/best_of
        self.beam_groups: Dict[int, _BeamGroup] = {}
        self.done_nbest: Dict[int, List[Tuple[List[int], float]]] = {}
        self.last_tokens = jnp.zeros((num_slots, 1), jnp.int32)
        self._req_counter = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        if paged:
            self._step_jit = jax.jit(self._step_paged_fn, donate_argnums=(2, 3))
        else:
            self._step_jit = jax.jit(self._step_fn, donate_argnums=(2, 3))
        self._prefill_cache: Dict[int, Any] = {}
        # fused multi-step decode ticks: when every active slot is decoding
        # (no prefill chunk pending, no beam group) and all share one
        # SamplingParams, run `fused_tick` decode steps inside ONE on-device
        # lax.while_loop per host tick — per-slot eos/budget masking on
        # device, up to fused_tick tokens surfaced per slot per dispatch.
        # This brings the Engine fused loop's ~0.8 ms/step dispatch saving
        # (CLAUDE.md measured) to continuous batching; the reference's decode
        # loop likewise never re-enters host code per token (Llama.cc:970).
        # 0 disables (exact per-token admission granularity).
        self.fused_tick = int(fused_tick)
        assert self.fused_tick >= 0
        self._fused_cache: Dict[Any, Any] = {}
        # cap on slots in chunked-prefill phase at once: each holds a B=1
        # scratch cache sized to its prompt bucket (~1 GB at 7B/4K tokens),
        # so unbounded concurrent admissions can OOM the chip long before
        # the page pool runs out. None = unbounded (v2 default).
        self.max_prefilling = max_prefilling

    # ---- jitted pieces -------------------------------------------------
    def _forward(self, params, ids, cache, positions, cache_pos, mask=None,
                 table=None, prefill_bf16=False, last_only=False):
        """Route to the single-device or the shard_map TP forward.

        ``prefill_bf16``/``last_only`` apply to admission prefills: the
        W6A16 large-M layer path (compute-bound prefill; same dispatch rule
        as Engine.prefill_bf16_threshold) and the last-position-only vocab
        projection. The pp route derives both internally."""
        scales = (
            {"kv_k_scale": cache[2], "kv_v_scale": cache[3]}
            if len(cache) == 4
            else {}
        )
        if self.pp_mesh is not None:
            from flexq_tpu.parallel.pp import serve_step_pp

            # serve_step_pp derives per-slot positions and masks from
            # cache_pos itself (scalar prefill start or [S] decode vector)
            return serve_step_pp(
                params, self.cfg, self.policy, ids, self.pp_mesh,
                tuple(cache), cache_pos,
            )
        if self.mesh is not None:
            from flexq_tpu.parallel.tp import forward_serve_tp

            return forward_serve_tp(
                params, self.cfg, self.policy, ids, self.mesh,
                kv_k=cache[0], kv_v=cache[1], cache_pos=cache_pos,
                mask=mask, positions=positions, page_table=table,
                kv_k_scale=cache[2] if len(cache) == 4 else None,
                kv_v_scale=cache[3] if len(cache) == 4 else None,
                prefill_bf16=prefill_bf16, last_only=last_only,
            )
        extra = {"page_table": table} if table is not None else {"mask": mask}
        return forward_serve(
            params, self.cfg, self.policy, ids,
            positions=positions,
            kv_k=cache[0], kv_v=cache[1], cache_pos=cache_pos,
            prefill_bf16=prefill_bf16, last_only=last_only,
            **extra, **scales,
        )

    def _step_fn(self, params, ids, cache, positions):
        """One decode step over all slots; per-slot positions [S].
        ``cache`` = (k, v) or (k, v, ks, vs) for the int8 quantized cache."""
        mask = span_mask(
            positions[:, None], self.max_seq_len, self.cfg.sliding_window
        )
        logits, kv = self._forward(
            params, ids, cache, positions[:, None], positions, mask=mask
        )
        return logits[:, 0], kv

    def _step_paged_fn(self, params, ids, cache, positions, table):
        """Paged decode step: pools + page table instead of a dense cache."""
        logits, kv = self._forward(
            params, ids, cache, positions[:, None], positions, table=table
        )
        return logits[:, 0], kv

    # ---- fused multi-step decode tick ----------------------------------
    def _fused_loop_body(
        self, step_fwd, last, cache, positions, active, eos_ids, remaining,
        gen0, key, counts, dyn, k_steps: int, sampling: SamplingParams,
        use_counts: bool, logprobs: bool,
    ):
        """K decode steps in one lax.while_loop (early exit when every row
        is finished). Per-row semantics mirror the stepwise host tick
        exactly: forward(last, pos) -> sample -> record -> pos+1, with eos
        and remaining-budget stops masked per slot on device. Finished (and
        inactive) rows keep stepping but their tokens stay -1 and their KV
        writes land in masked/garbage territory, same as the stepwise
        path's inactive slots. Under dp>1 all arrays here are the LOCAL
        data shard."""
        b = last.shape[0]
        rows = jnp.arange(b)
        tokens0 = jnp.full((b, k_steps), -1, jnp.int32)
        lps0 = jnp.zeros((b, k_steps), jnp.float32)
        finished0 = ~active

        def cond(st):
            return (st[0] < k_steps) & ~jnp.all(st[7])

        def body(st):
            i, last, cache, pos, key, counts, nrec, finished, tokens, lps = st
            logits, cache = step_fwd(last, cache, pos)
            # dynamic float knobs: distinct temperatures etc. share ONE
            # compiled K-step program (per-row eos/min-length on device)
            proc = process_logits_dynamic(
                logits, dyn, top_k=sampling.top_k,
                use_top_p=sampling.top_p < 1.0,
                token_counts=counts if use_counts else None,
                cur_length=gen0 + nrec, eos_ids=eos_ids,
            )
            key, sub = jax.random.split(key)
            nxt = sample(proc, sampling, sub)
            record = ~finished
            tokens = tokens.at[:, i].set(jnp.where(record, nxt, -1))
            if logprobs:
                lp = jax.nn.log_softmax(proc, axis=-1)[rows, nxt]
                lps = lps.at[:, i].set(jnp.where(record, lp, 0.0))
            nrec = nrec + record.astype(jnp.int32)
            finished = finished | (
                record & ((nxt == eos_ids) | (nrec >= remaining))
            )
            if use_counts:
                counts = counts.at[rows, nxt].add(record.astype(jnp.int32))
            # `last` tracks the most recent RECORDED token per row, so the
            # host reads the next tick's feed token straight off the device
            last = jnp.where(record[:, None], nxt[:, None], last)
            return (
                i + 1, last, cache, pos + 1, key, counts, nrec, finished,
                tokens, lps,
            )

        st = (
            jnp.int32(0), last, cache, positions, key, counts,
            jnp.zeros((b,), jnp.int32), finished0, tokens0, lps0,
        )
        st = jax.lax.while_loop(cond, body, st)
        return st[8], st[9], st[1], st[2]  # tokens, lps, last, cache

    def _fused_fn(self, k_steps: int, sampling: SamplingParams,
                  use_counts: bool, logprobs: bool):
        """Jitted fused-tick callable, cached per static config. Uniform
        signature: fn(params, last, cache, positions, active, eos_ids,
        remaining, gen0, key, counts, table) ->
        (tokens [S,K], lps [S,K], last [S,1], cache)."""
        # keyed on the STRUCTURAL sampling config only — float knobs are
        # traced operands (process_logits_dynamic), so client temperature
        # changes never recompile the K-step graph
        key_t = (k_steps, structural_key(sampling), use_counts, logprobs)
        fn = self._fused_cache.get(key_t)
        if fn is not None:
            return fn
        if len(self._fused_cache) >= 64:  # bound a long-lived server's cache
            self._fused_cache.clear()
        if self.mesh is not None:
            fn = self._build_fused_mesh(k_steps, sampling, use_counts, logprobs)
        else:

            def run(params, last, cache, positions, active, eos_ids,
                    remaining, gen0, key, counts, dyn, table):
                if self.paged:
                    def step_fwd(lt, c, p):
                        logits, kv = self._forward(
                            params, lt, c, p[:, None], p, table=table
                        )
                        return logits[:, 0], kv
                else:
                    def step_fwd(lt, c, p):
                        mask = span_mask(
                            p[:, None], self.max_seq_len,
                            self.cfg.sliding_window,
                        )
                        logits, kv = self._forward(
                            params, lt, c, p[:, None], p, mask=mask
                        )
                        return logits[:, 0], kv

                return self._fused_loop_body(
                    step_fwd, last, cache, positions, active, eos_ids,
                    remaining, gen0, key, counts, dyn, k_steps, sampling,
                    use_counts, logprobs,
                )

            fn = jax.jit(run, donate_argnums=(2,))
        self._fused_cache[key_t] = fn
        return fn

    def _build_fused_mesh(self, k_steps: int, sampling: SamplingParams,
                          use_counts: bool, logprobs: bool):
        """Fused tick under the mesh: shard_map around the while_loop (the
        same structure as Engine._decode_loop's mesh path) — per-layer psums
        ride ICI inside the loop, sampling runs rank-redundantly on gathered
        logits, and dp>1 shards the slot axis of every per-slot array."""
        from jax.sharding import PartitionSpec as P

        from flexq_tpu.parallel.tp import _local_cfg, param_specs, tp_forward_local

        mesh = self.mesh
        lcfg = _local_cfg(self.cfg, mesh.shape["model"])
        specs = param_specs(self.params)
        quant = self.quantized
        paged = self.paged
        data_ax = "data" if self._dp > 1 else None
        head_ax = (
            "model" if self.cfg.num_kv_heads >= mesh.shape["model"] else None
        )
        # dense: slots over data; paged dp>1: per-data-shard pool partitions
        # (page axis over data, localized tables — see PagePool)
        kv_batch = data_ax
        kv_spec = P(None, kv_batch, head_ax, None, None)
        ks_spec = P(None, kv_batch, head_ax, None)
        cache_specs = (kv_spec, kv_spec) + ((ks_spec, ks_spec) if quant else ())
        vec, mat = P(data_ax), P(data_ax, None)

        def body(params, last, positions, active, eos_ids, remaining, gen0,
                 key, counts, dyn, table, *cache):
            if data_ax is not None:
                # decorrelate sampling across data shards (see engine.py)
                key = jax.random.fold_in(key, jax.lax.axis_index("data"))

            def step_fwd(lt, c, p):
                if paged:
                    kv_t = ("paged8" if quant else "paged",) + tuple(c) + (table,)
                    mask = None
                else:
                    kv_t = ("dense8" if quant else "dense",) + tuple(c)
                    mask = span_mask(
                        p[:, None], self.max_seq_len, self.cfg.sliding_window
                    )
                logits, pieces = tp_forward_local(
                    params, self.cfg, lcfg, self.policy, lt, kv=kv_t,
                    positions=p[:, None], cache_pos=p, mask=mask,
                )
                return logits[:, 0], tuple(pieces)

            tokens, lps, last, cache_o = self._fused_loop_body(
                step_fwd, last, tuple(cache), positions, active, eos_ids,
                remaining, gen0, key, counts, dyn, k_steps, sampling,
                use_counts, logprobs,
            )
            return (tokens, lps, last) + tuple(cache_o)

        smfn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                specs, mat, vec, vec, vec, vec, vec, P(),
                mat if use_counts else P(), P(),
                mat if paged else P(),
            ) + cache_specs,
            out_specs=(mat, mat, mat) + cache_specs,
            check_vma=False,
        )
        n_cache = len(cache_specs)
        jfn = jax.jit(
            smfn, donate_argnums=tuple(range(11, 11 + n_cache))
        )

        def run(params, last, cache, positions, active, eos_ids, remaining,
                gen0, key, counts, dyn, table):
            out = jfn(
                params, last, positions, active, eos_ids, remaining, gen0,
                key, counts, dyn, table, *cache,
            )
            return out[0], out[1], out[2], out[3:]

        return run

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
                cache = (kv_k, kv_v)
                if self.quantized:
                    cache += (
                        jnp.zeros(shape1[:-1], jnp.float32),
                        jnp.zeros(shape1[:-1], jnp.float32),
                    )
                logits, kv = self._forward(
                    params, ids, cache, None, jnp.int32(0),
                    mask=prefill_mask(ids.shape[1], bucket, self.cfg.sliding_window),
                    prefill_bf16=ids.shape[1] >= 64, last_only=True,
                )
                return logits[:, -1], kv

            self._prefill_cache[key] = jax.jit(fn)
        ids = jnp.asarray(np.asarray(prompt, np.int32))[None]
        return self._prefill_cache[key](self.params, ids)

    # ---- chunked-prefill admission --------------------------------------
    def _new_scratch(self, bucket: int) -> Tuple:
        """Fresh B=1 scratch cache tuple sized to the prompt bucket."""
        shape1 = (
            self.cfg.num_layers, 1, self.cfg.num_kv_heads, bucket, self.cfg.head_dim,
        )
        dt = self.pool.pool_k.dtype if self.paged else self.kv_k.dtype
        kv = (jnp.zeros(shape1, dt), jnp.zeros(shape1, dt))
        # two distinct buffers — an aliased pair would be donated twice
        scales = (
            (jnp.zeros(shape1[:-1], jnp.float32),
             jnp.zeros(shape1[:-1], jnp.float32))
            if self.quantized
            else ()
        )
        if self.mesh is not None:
            sh = _cache_spec(self.cfg, self.mesh)
            kv = tuple(jax.device_put(x, sh) for x in kv)
            ssh = _cache_spec(self.cfg, self.mesh, scales=True)
            scales = tuple(jax.device_put(x, ssh) for x in scales)
        return kv + scales

    def _chunk_fn(self, bucket: int):
        """Jitted one-chunk prefill over a bucket-sized scratch cache.
        One compile per bucket (≤ max_seq_len / chunk buckets total) instead
        of one per prompt length."""
        key = ("chunk", bucket)
        if key not in self._prefill_cache:

            def fn(params, ids, cache, start):
                b, c = ids.shape
                positions = start + jnp.broadcast_to(jnp.arange(c), (b, c))
                mask = span_mask(
                    (start + jnp.arange(c))[None], bucket,
                    self.cfg.sliding_window,
                )
                logits, kv = self._forward(
                    params, ids, cache, positions, start, mask=mask,
                    prefill_bf16=ids.shape[1] >= 64,
                )
                return logits, kv

            self._prefill_cache[key] = jax.jit(fn, donate_argnums=(2,))
        return self._prefill_cache[key]

    def _advance_prefill(self, i: int):
        """Run ONE chunk of slot i's prompt; on completion, insert the
        scratch into the main cache and emit the first token."""
        slot = self.slots[i]
        chunk = self.prefill_chunk
        start = slot.prefill_pos
        plen = len(slot.prompt)
        padded = slot.prompt + [0] * (slot.bucket - plen)
        ids = jnp.asarray(
            np.asarray(padded[start : start + chunk], np.int32)
        )[None]
        logits, slot.scratch = self._chunk_fn(slot.bucket)(
            self.params, ids, slot.scratch, jnp.int32(start)
        )
        slot.prefill_pos = start + chunk
        if slot.prefill_pos >= plen:
            # padding queries (positions >= plen) produced garbage logits and
            # garbage KV past plen; neither is consumed — only [:plen] is
            # inserted and the last real token's row is sampled.
            self._insert_scratch(i, slot.scratch, plen, slot=slot)
            slot.scratch = None
            slot.phase = "decode"
            slot.pos = plen
            tok = self._sample_one(logits[0, (plen - 1) - start], slot)
            self._record(i, slot, tok)

    def _part_of(self, i: int) -> int:
        """Data-shard partition owning slot i (slots shard contiguously)."""
        return i // (self.num_slots // self._dp)

    def _alloc(self, n: int, part: int = 0) -> List[int]:
        """Pool alloc that reclaims LRU retained prefix pages under pressure."""
        if self.registry is not None and self.pool.free_in(part) < n:
            self.pool.free(self.registry.evict(n - self.pool.free_in(part)))
        return self.pool.alloc(n, part=part)

    def _release_slot_pages(self, i: int) -> None:
        s = self.slots[i]
        pages = [p for p in self.ptable.release(i) if p != 0]
        if s.phase == "prefill" and s.shared_pages:
            pages += s.shared_pages  # acquired but not yet table-mapped
        if self.registry is not None:
            pages = self.registry.release(pages)
        self.pool.free(pages)

    def _preempt(self, exclude: Optional[int] = None,
                 part: Optional[int] = None) -> bool:
        """Evict the youngest other request back to the pending queue
        (recompute-style preemption, what vLLM does when the pool runs dry;
        the reference's static batch simply cannot run out mid-flight).
        Its pages free immediately; on re-admission it prefills
        prompt+generated-so-far and the final output is stitched together
        from `prior` + the new generation. ``part`` restricts candidates to
        one data shard's slots (its pool partition is the one that ran dry)."""
        cands = [
            i for i, s in enumerate(self.slots)
            if i != exclude and s.req_id is not None and not s.beam
            and (part is None or self._part_of(i) == part)
        ]  # beam lanes are never preempted: re-prefilling one lane cannot
        # reconstruct the group's diverged KV mid-search
        if not cands:
            return False
        i = max(cands, key=lambda j: self.slots[j].req_id)
        s = self.slots[i]
        self._release_slot_pages(i)
        self.pending.appendleft(_Pending(
            s.req_id, s.prompt + s.generated, s.sampling, s.max_new,
            s.eos_id, prior=s.prior + s.generated,
            want_logprobs=s.want_logprobs, prior_lps=s.prior_lps + s.lps,
        ))
        self.slots[i] = _Slot()
        return True

    def _insert_scratch(self, i: int, kv1: Tuple, plen: int,
                        slot: Optional[_Slot] = None):
        """Copy a B=1 scratch cache's positions [prefix_len, plen) into slot
        i's pages; prefix pages (if any) are table-mapped without a copy."""
        if self.paged:
            shared = slot.shared_pages if slot is not None else []
            pfx = slot.prefix_len if slot is not None else 0
            ps = self.pool.page_size
            part = self._part_of(i)
            while True:
                try:
                    new_pages = self._alloc(
                        self.pool.pages_for(plen) - len(shared), part
                    )
                    break
                except MemoryError:
                    if not self._preempt(exclude=i, part=part):
                        raise
            region = tuple(
                x[:, :, :, pfx:] for x in (kv1 if self.quantized else kv1[:2])
            )
            self.pool.insert_prefill(
                new_pages, region[0], region[1], plen - pfx, *region[2:]
            )
            self.ptable.assign(i, shared + new_pages)
            if self.registry is not None and slot is not None:
                # publish freshly written FULL prompt pages for future reuse;
                # losing a register race keeps the page private to this slot
                full = plen // ps
                for j, page in enumerate(new_pages):
                    blk = len(shared) + j
                    if blk < full:
                        self.registry.register(slot.page_hashes[blk], page)
            return
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

    # ---- public API ----------------------------------------------------
    def add_request(
        self,
        prompt: Sequence[int],
        sampling: SamplingParams = SamplingParams(),
        max_new_tokens: int = 64,
        eos_id: int = 2,
        logprobs: bool = False,
        beam_width: int = 1,
        n_best: int = 1,
        length_penalty: float = 1.0,
    ) -> int:
        """``beam_width > 1`` runs the request as beam search across
        beam_width slots; the best hypothesis lands in the normal result
        and the ranked n_best list in done_nbest (entries are
        (tokens, score, logprobs-or-None)). Dense beams reorder KV rows;
        paged beams share pages with copy-on-divergence of the current
        block only (FT's cache_indir analogue at page granularity)."""
        req_id = next(self._req_counter)
        assert len(prompt) + max_new_tokens <= self.max_seq_len
        if beam_width > 1:
            assert beam_width <= self.num_slots, (beam_width, self.num_slots)
            if self.paged:
                assert self._dp == 1, (
                    "paged beam requires dp=1: lanes share pages, which "
                    "cannot span data-shard pool partitions"
                )
        self.pending.append(
            _Pending(req_id, list(prompt), sampling, max_new_tokens, eos_id,
                     want_logprobs=logprobs, beam_width=beam_width,
                     n_best=n_best, length_penalty=length_penalty)
        )
        return req_id

    @property
    def has_work(self) -> bool:
        return bool(self.pending) or any(s.req_id is not None for s in self.slots)

    def cancel(self, req_id: int) -> Optional[List[int]]:
        """Best-effort early stop. A still-pending request is dropped and its
        prior tokens returned (the caller surfaces them as the result); an
        in-flight request/beam group has its budget clamped so it finishes
        on the next recorded token (returns None — the normal completion
        flow delivers it). Deterministic, so multi-process replicas applying
        the same cancel stay in lockstep (serve/replicated.py)."""
        for p in list(self.pending):
            if p.req_id == req_id:
                self.pending.remove(p)
                return list(p.prior)
        g = self.beam_groups.get(req_id)
        if g is not None:
            g.max_new = max(1, len(g.histories[0]))
            return None
        for s in self.slots:
            if s.req_id == req_id:
                s.max_new = max(1, len(s.prior) + len(s.generated))
                return None
        return None

    def _admit(self):
        # beam requests at the queue head admit into beam_width slots at
        # once (FIFO preserved: if not enough slots are free, everything
        # behind the beam request waits too)
        while self.pending and self.pending[0].beam_width > 1:
            req = self.pending[0]
            free = [i for i, s in enumerate(self.slots) if s.req_id is None]
            if len(free) < req.beam_width:
                return
            if self.paged:
                # worst-case budget: shared prompt pages + each beam's
                # private generation span (incl. a straddled partial block),
                # PLUS the unallocated worst case of every in-flight beam
                # group — beams are never preempted, so admitting without
                # reserving their future pages can deadlock the pool
                ps = self.pool.page_size
                plen = len(req.prompt)
                per_beam = (plen + req.max_new - 1) // ps - plen // ps + 1
                need = self.pool.pages_for(plen) + req.beam_width * per_beam
                for gb in self.beam_groups.values():
                    for i2 in gb.slots:
                        s2 = self.slots[i2]
                        total = -(-(len(s2.prompt) + s2.max_new) // ps)
                        need += max(0, total - int(self.ptable.num_blocks[i2]))
                avail = self.pool.free_pages + (
                    self.registry.reclaimable if self.registry is not None else 0
                )
                if avail < need:
                    return
            self._admit_beam(self.pending.popleft(), free)
        for i, slot in enumerate(self.slots):
            if slot.req_id is not None or not self.pending:
                continue
            if self.pending[0].beam_width > 1:
                break  # FIFO: a beam request is next; admit it next tick
            req = self.pending.popleft()
            if (
                self.max_prefilling is not None
                and self.prefill_chunk
                and len(req.prompt) > self.prefill_chunk
            ):
                n_pref = sum(
                    1 for s2 in self.slots
                    if s2.req_id is not None and s2.phase == "prefill"
                )
                if n_pref >= self.max_prefilling:
                    # bounded in-flight prefills: each chunk-prefilling slot
                    # holds a prompt-sized B=1 scratch cache (~1 GB at
                    # 7B/4K); wait FIFO for one to drain
                    self.pending.appendleft(req)
                    break
            if self.paged:
                avail = self.pool.free_in(self._part_of(i)) + (
                    self.registry.reclaimable if self.registry is not None else 0
                )
                # charge only the REMAINING generation budget: a preempted
                # request re-queues with prompt+generated and unchanged
                # max_new, so charging the full max_new again could demand
                # more pages than the pool has and starve it forever
                need = len(req.prompt) + req.max_new - len(req.prior)
                if avail < self.pool.pages_for(need):
                    self.pending.appendleft(req)  # not enough pages; retry later
                    break
            plen = len(req.prompt)
            slot.req_id = req.req_id
            slot.generated = []
            slot.sampling = req.sampling
            slot.eos_id = req.eos_id
            slot.max_new = req.max_new
            slot.prompt = req.prompt
            slot.prior = req.prior
            slot.want_logprobs = req.want_logprobs
            slot.lps = []
            slot.prior_lps = req.prior_lps
            slot.shared_pages = []
            slot.prefix_len = 0
            if self.registry is not None:
                ps = self.pool.page_size
                c = self.prefill_chunk
                slot.page_hashes = self.registry.hash_chain(req.prompt, ps)
                matched = self.registry.match(slot.page_hashes)
                # PAGE-granular reuse (chunk starts are traced scalars, so
                # any ps-aligned start compiles to the same program); leave
                # >=1 token to compute (its logits seed sampling)
                m_tok = min(len(matched) * ps, (plen - 1) // ps * ps)
                if m_tok > 0:
                    slot.shared_pages = matched[: m_tok // ps]
                    slot.prefix_len = m_tok
                    self.registry.acquire(slot.shared_pages)
                self.registry.account_miss(
                    len(slot.page_hashes) - len(slot.shared_pages)
                )
            if self.prefill_chunk and plen - slot.prefix_len > 0 and (
                plen > self.prefill_chunk or slot.prefix_len
            ):
                # chunked admission: defer the compute to step() ticks.
                # Scratch must be page-aligned in paged mode (insert_prefill
                # reshapes it into whole pages). With a prefix hit, the
                # scratch's leading region is gathered from the reused pages
                # and chunks start at prefix_len.
                c = self.prefill_chunk
                slot.phase = "prefill"
                slot.prefill_pos = slot.prefix_len
                # 128-align the scratch so chunked windows take the same
                # flash-prefill kernel as monolithic admission (a smaller
                # bucket falls back to the jnp path and its different
                # rounding makes chunked != unchunked token streams)
                unit = self.pool.page_size if self.paged else 128
                # bucket covers every chunk write: starts run prefix_len,
                # prefix_len+c, ... (prefix_len is page- not chunk-aligned),
                # so the last write ends at prefix_len + ceil(rest/c)*c
                pfx = slot.prefix_len
                span = pfx + -(-(plen - pfx) // c) * c
                slot.bucket = -(-span // unit) * unit
                slot.scratch = self._new_scratch(slot.bucket)
                if slot.shared_pages:
                    slot.scratch = self.pool.gather_prefix(
                        slot.shared_pages, slot.scratch
                    )
                continue
            logits, kv1 = self._prefill_one(req.prompt)
            self._insert_scratch(i, kv1, plen, slot=slot)
            slot.pos = plen
            # sample the first token from the prefill logits
            tok = self._sample_one(logits[0], slot)
            self._record(i, slot, tok)

    # ---- beam search ---------------------------------------------------
    BEAM_NEG = -1e9
    BEAM_PAD = 0  # frozen-beam continuation token (serve/beam.py pad_id)

    def _admit_beam(self, req: _Pending, free: List[int]):
        """Prefill once, seed beam_width slots with identical prompt KV,
        expand the first top-k tokens (serve/beam.py's first expansion).
        Paged mode writes the prompt pages ONCE and maps them into every
        beam's table (prefix sharing); the block the first decode step will
        write is privatized per beam before any write happens."""
        k = req.beam_width
        idx = free[:k]
        plen = len(req.prompt)
        logits, kv1 = self._prefill_one(req.prompt)
        if self.paged:
            # shared prompt pages for the whole group (written once). Beam
            # pages stay OUT of the prefix registry: their contents diverge
            # from the prompt-hash chain the moment decode writes start.
            while True:
                try:
                    pages = self._alloc(self.pool.pages_for(plen))
                    break
                except MemoryError:
                    if not self._preempt():
                        raise
            region = tuple(kv1 if self.quantized else kv1[:2])
            self.pool.insert_prefill(
                pages, region[0], region[1], plen, *region[2:]
            )
            for i in idx:
                self.ptable.assign(i, pages)
        for i in idx:
            if not self.paged:
                self._insert_scratch(i, kv1, plen)
            s = self.slots[i]
            s.req_id = req.req_id
            s.beam = True
            s.pos = plen
            s.prompt = req.prompt
            s.max_new = req.max_new
            s.eos_id = req.eos_id
            s.generated = []
        logp0 = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        scores, first = jax.lax.top_k(logp0, k)
        first_np = np.asarray(first)
        for j, i in enumerate(idx):
            self.last_tokens = self.last_tokens.at[i, 0].set(int(first_np[j]))
        scores_np = np.asarray(scores, np.float32)
        g = _BeamGroup(
            req_id=req.req_id, slots=idx, k=k, n_best=req.n_best,
            eos_id=req.eos_id, max_new=req.max_new,
            length_penalty=req.length_penalty,
            scores=scores_np,
            finished=first_np == req.eos_id,
            histories=[[int(t)] for t in first_np],
            want_logprobs=req.want_logprobs,
            lps=[[float(s)] for s in scores_np],
        )
        self.beam_groups[req.req_id] = g
        if self.paged:
            # first decode write lands at pos=plen
            self._privatize_beam_blocks(g, plen)
        self._maybe_finish_beam(g)

    def _beam_advance(self, g: _BeamGroup, logits: jax.Array):
        """One beam step off the batched decode logits: top-k over k*V with
        frozen-beam pad continuations, history re-threading through parents,
        and KV-cache slot-row reorder (beam.py._beam_step semantics, so the
        in-scheduler path generates exactly what standalone beam_search
        does)."""
        rows = jnp.asarray(g.slots)
        logp = jax.nn.log_softmax(logits[rows].astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        frozen = jnp.full((v,), self.BEAM_NEG, jnp.float32).at[self.BEAM_PAD].set(0.0)
        fin = jnp.asarray(g.finished)
        logp = jnp.where(fin[:, None], frozen[None, :], logp)
        total = jnp.asarray(g.scores)[:, None] + logp
        top_scores, top_idx = jax.lax.top_k(total.reshape(-1), g.k)
        fetched = np.asarray(jnp.concatenate(
            [top_idx.astype(jnp.float32), top_scores]
        ))  # one host fetch
        top_idx_np = fetched[: g.k].astype(np.int64)
        parent = top_idx_np // v
        token = top_idx_np % v
        g.histories = [
            g.histories[int(p)] + [int(t)] for p, t in zip(parent, token)
        ]
        new_scores = fetched[g.k:].astype(np.float32)
        # token logprob = score delta vs the parent (0.0 for a frozen pad)
        g.lps = [
            g.lps[int(p)] + [float(new_scores[j]) - float(g.scores[int(p)])]
            for j, p in enumerate(parent)
        ]
        g.finished = np.asarray(
            [bool(g.finished[int(p)]) or int(t) == g.eos_id
             for p, t in zip(parent, token)]
        )
        g.scores = new_scores
        if self.paged:
            self._reorder_beam_paged(g, [int(p) for p in parent])
        else:
            self._reorder_slots(
                [g.slots[int(p)] for p in parent], g.slots
            )
        for j, i in enumerate(g.slots):
            self.last_tokens = self.last_tokens.at[i, 0].set(int(token[j]))
            self.slots[i].pos += 1
        if self.paged:
            # next decode write position (pos was just incremented)
            self._privatize_beam_blocks(g, self.slots[g.slots[0]].pos)
        self._maybe_finish_beam(g)

    def _reorder_slots(self, src: List[int], dst: List[int]):
        """cache[:, dst] = cache[:, src] for the dense KV (+ scale) buffers —
        the gather-based TPU replacement for FT's cache_indir indirection
        (decoder_masked_multihead_attention chases parent pointers; XLA
        fuses nothing through an indirection, so beams reorder rows)."""
        import functools

        if src == dst:
            return
        if not hasattr(self, "_reorder_jit"):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def f(arr, src_idx, dst_idx):
                return arr.at[:, dst_idx].set(
                    arr[:, src_idx], unique_indices=True
                )

            self._reorder_jit = f
        s = jnp.asarray(src, jnp.int32)
        d = jnp.asarray(dst, jnp.int32)
        self.kv_k = self._reorder_jit(self.kv_k, s, d)
        self.kv_v = self._reorder_jit(self.kv_v, s, d)
        if self.quantized:
            self.kv_ks = self._reorder_jit(self.kv_ks, s, d)
            self.kv_vs = self._reorder_jit(self.kv_vs, s, d)

    def _beam_page_rc(self, g: _BeamGroup) -> Dict[int, int]:
        """How many of the group's slots map each (non-garbage) page. The
        page tables are authoritative; recounting k*blocks host ints per
        step is noise next to the device work."""
        rc: Dict[int, int] = {}
        for i in g.slots:
            for p in self.ptable.table[i, : self.ptable.num_blocks[i]]:
                if p:
                    rc[int(p)] = rc.get(int(p), 0) + 1
        return rc

    def _reorder_beam_paged(self, g: _BeamGroup, parent: List[int]):
        """Page-table reorder: beam j adopts its parent's table (sharing the
        parent's pages) — the paged analogue of FT's cache_indir parent
        chasing (decoder_masked_multihead_attention), with no KV copied
        here at all; divergence is handled by `_privatize_beam_blocks`.
        Pages no longer referenced by any beam return to the pool."""
        if parent == list(range(g.k)):
            return
        before = self._beam_page_rc(g)
        olds = {
            i: (self.ptable.table[i].copy(), int(self.ptable.num_blocks[i]))
            for i in g.slots
        }
        for j, p in enumerate(parent):
            src, dst = g.slots[p], g.slots[j]
            self.ptable.table[dst] = olds[src][0]
            self.ptable.num_blocks[dst] = olds[src][1]
        after = self._beam_page_rc(g)
        dropped = [p for p in before if p not in after]
        self.pool.free(dropped)

    def _privatize_beam_blocks(self, g: _BeamGroup, next_pos: int):
        """Ensure the block the next decode write (at `next_pos`) lands in
        is private to each beam: copy-on-divergence of ONE page per beam
        that shares it (dense beams instead copy whole max_len rows). A
        block boundary needs nothing — step()'s allocator appends fresh
        private pages."""
        if all(g.finished) or len(g.histories[0]) >= g.max_new:
            return  # group completes before another write happens
        ps = self.pool.page_size
        blk = next_pos // ps
        rc = self._beam_page_rc(g)
        src, dst = [], []
        aborted = False
        try:
            for i in g.slots:
                if blk >= int(self.ptable.num_blocks[i]):
                    continue  # boundary: appended privately by the allocator
                p = int(self.ptable.table[i, blk])
                if p == 0 or rc.get(p, 0) <= 1:
                    continue
                while True:
                    try:
                        newp = self._alloc(1)[0]
                        break
                    except MemoryError:
                        if not self._preempt():
                            aborted = True
                            break
                if aborted:
                    break
                rc[p] -= 1
                rc[newp] = 1
                self.ptable.table[i, blk] = newp
                src.append(p)
                dst.append(newp)
        finally:
            # copy even when aborting mid-loop: tables already point at
            # the fresh pages allocated so far — leaving them uncopied
            # would corrupt those beams' KV
            self.pool.copy_pages(src, dst)
        if aborted:
            # no page left for copy-on-divergence: another decode step
            # would make diverged beams overwrite one shared page, so the
            # group finishes NOW with its hypotheses so far; freeing its
            # pages also relieves the pool
            g.max_new = max(1, len(g.histories[0]))
            self._maybe_finish_beam(g)

    def shed_beam(self) -> bool:
        """Force-finish the youngest beam group with its hypotheses so far —
        the pool-exhaustion escape hatch when no preemptible (non-beam)
        slot remains: beams are never preempted because re-prefilling one
        lane cannot rebuild the group's diverged KV. Returns False when no
        group exists."""
        if not self.beam_groups:
            return False
        g = max(self.beam_groups.values(), key=lambda x: x.req_id)
        g.max_new = max(1, len(g.histories[0]))
        self._maybe_finish_beam(g)
        return True

    def _maybe_finish_beam(self, g: _BeamGroup):
        if not (all(g.finished) or len(g.histories[0]) >= g.max_new):
            return
        hyps = []
        for j in range(g.k):
            toks = list(g.histories[j])
            if g.eos_id in toks:
                toks = toks[: toks.index(g.eos_id) + 1]
            ln = max(len(toks), 1)
            norm = ((5.0 + ln) / 6.0) ** g.length_penalty  # GNMT
            lps = g.lps[j][: len(toks)] if g.want_logprobs else None
            hyps.append((toks, float(g.scores[j]) / norm, lps))
        hyps.sort(key=lambda h: -h[1])
        self.done[g.req_id] = hyps[0][0]
        self.done_nbest[g.req_id] = hyps[: max(g.n_best, 1)]
        if g.want_logprobs:
            self.done_logprobs[g.req_id] = hyps[0][2]
        if self.paged:
            freed = set(self._beam_page_rc(g))
            for i in g.slots:
                self.ptable.release(i)
            self.pool.free(freed)
        for i in g.slots:
            self.slots[i] = _Slot()
        del self.beam_groups[g.req_id]

    def _sample_batch(self, idx: List[int], logits) -> List[Tuple[int, Optional[float]]]:
        """Sample the given slots' next tokens with ONE device dispatch and
        ONE host fetch per sampling-param group — per-slot eager chains
        cost ~35 ms/slot/tick through the axon tunnel and dominated the
        per-token tick (bench_sched_parts). Greedy results are identical
        to _sample_one's (same process_logits math per row)."""
        if not idx:
            return []
        out: Dict[int, Tuple[int, Optional[float]]] = {}
        groups: Dict[Any, List[int]] = {}
        for i in idx:
            groups.setdefault(self.slots[i].sampling, []).append(i)
        for sp, members in groups.items():
            use_counts = (
                sp.repetition_penalty != 1.0
                or sp.presence_penalty != 0.0
                or sp.frequency_penalty != 0.0
            )
            want_lp = any(self.slots[i].want_logprobs for i in members)
            g = len(members)
            counts = jnp.zeros((), jnp.int32)
            if use_counts:
                c = np.zeros((g, self.cfg.vocab_size), np.int32)
                for j, i in enumerate(members):
                    for t in self.slots[i].prompt + self.slots[i].generated:
                        c[j, t] += 1
                counts = jnp.asarray(c)
            eos = np.asarray([self.slots[i].eos_id for i in members], np.int32)
            gen0 = np.asarray(
                [len(self.slots[i].prior) + len(self.slots[i].generated)
                 for i in members],
                np.int32,
            )
            self._key, sub = jax.random.split(self._key)
            fn = self._sample_batch_fn(g, sp, use_counts, want_lp)
            res = np.asarray(fn(
                logits, jnp.asarray(members, jnp.int32), counts,
                jnp.asarray(eos), jnp.asarray(gen0), sub,
                dynamic_params(sp),
            ))
            for j, i in enumerate(members):
                out[i] = (
                    int(res[0, j]), float(res[1, j]) if want_lp else None
                )
        return [out[i] for i in idx]

    def _sample_batch_fn(self, g: int, sp: SamplingParams, use_counts: bool,
                         want_lp: bool):
        key_t = ("sample", g, structural_key(sp), use_counts, want_lp)
        fn = self._fused_cache.get(key_t)
        if fn is not None:
            return fn
        if len(self._fused_cache) >= 64:
            self._fused_cache.clear()

        def f(logits, rows, counts, eos, gen0, key, dyn):
            lr = logits[rows]
            proc = process_logits_dynamic(
                lr, dyn, top_k=sp.top_k, use_top_p=sp.top_p < 1.0,
                token_counts=counts if use_counts else None,
                cur_length=gen0, eos_ids=eos,
            )
            toks = sample(proc, sp, key)
            lp = (
                jax.nn.log_softmax(proc, axis=-1)[jnp.arange(g), toks]
                if want_lp
                else jnp.zeros((g,), jnp.float32)
            )
            return jnp.stack([toks.astype(jnp.float32), lp])

        fn = jax.jit(f)
        self._fused_cache[key_t] = fn
        return fn

    def _sample_one(self, logits_row: jax.Array, slot: _Slot) -> int:
        counts = np.zeros((1, self.cfg.vocab_size), np.int32)
        for t in slot.prompt + slot.generated:
            counts[0, t] += 1
        # after a preemption, prior generated tokens live inside slot.prompt;
        # cur_length must still count them as generated (min-length/eos gates)
        cur = len(slot.prior) + len(slot.generated)
        proc = process_logits(
            logits_row[None],
            slot.sampling,
            token_counts=jnp.asarray(counts),
            cur_length=jnp.asarray([cur], jnp.int32),
            eos_id=slot.eos_id,
        )
        self._key, sub = jax.random.split(self._key)
        tok = sample(proc, slot.sampling, sub)[0]
        if slot.want_logprobs:
            # one combined fetch: a second device->host read per token would
            # double the ~1ms tunnel round-trip this host loop already pays
            lp = jax.nn.log_softmax(proc, axis=-1)[0, tok]
            both = np.asarray(jnp.stack([tok.astype(jnp.float32), lp]))
            slot.lps.append(float(both[1]))
            return int(both[0])
        return int(tok)

    def _record(self, i: int, slot: _Slot, tok: int):
        slot.generated.append(tok)
        self.last_tokens = self.last_tokens.at[i, 0].set(tok)
        self._finish_check(i, slot, tok)

    def _finish_check(self, i: int, slot: _Slot, tok: int):
        """Complete slot i if `tok` (already appended) ends its request."""
        if tok == slot.eos_id or len(slot.prior) + len(slot.generated) >= slot.max_new:
            self.done[slot.req_id] = slot.prior + slot.generated
            if slot.want_logprobs:
                self.done_logprobs[slot.req_id] = slot.prior_lps + slot.lps
            if self.paged:
                if self.registry is not None:
                    # multi-turn reuse: pages filled during DECODE become
                    # full once the conversation's next prompt includes this
                    # turn's response — publish every full page over
                    # prompt+generated (cache position p holds the K/V of
                    # token p, so the hash chain stays content-addressed)
                    ps = self.pool.page_size
                    history = slot.prompt + slot.generated
                    hashes = self.registry.hash_chain(history, ps)
                    nb = int(self.ptable.num_blocks[i])
                    for blk, h in enumerate(hashes[:nb]):
                        page = int(self.ptable.table[i, blk])
                        if page and page not in self.registry.page_hash:
                            self.registry.register(h, page)
                # registered pages drop a ref (rc==0 -> retained LRU, evicted
                # only under pool pressure); private pages free immediately
                self._release_slot_pages(i)
            self.slots[i] = _Slot()

    def _fusible(self, active: List[int]) -> bool:
        """The fused multi-step tick applies when every active slot is a
        plain decode with one shared SamplingParams (per-slot eos/budget are
        handled on device; differing sampling configs would need per-row
        params plumbed through process_logits — rare enough to fall back)."""
        if self.fused_tick < 1 or self.beam_groups:
            return False
        s0 = self.slots[active[0]].sampling
        return all(self.slots[i].sampling == s0 for i in active[1:])

    def _fused_step(self, active: List[int]) -> None:
        """Run up to `fused_tick` decode steps in one device dispatch.

        With requests WAITING (pending queue non-empty), the tick shortens
        to at most 4 steps so a slot that frees up admits within ~4 steps
        instead of K — bounding queued-request TTFT without giving up the
        fused tick's dispatch amortization when the system is not full.
        (Each distinct K compiles its own program; at most two exist.)"""
        k_steps = self.fused_tick
        if self.pending and k_steps > 4:
            k_steps = 4
        if self.paged:
            # preallocate every page the K steps might write (writes at
            # pos .. pos+K-1); a slot that finishes early wastes at most one
            # page, reclaimed when the slot completes
            ps = self.pool.page_size
            max_blocks = self.ptable.table.shape[1]
            for i in list(active):
                if self.slots[i].req_id is None:
                    continue
                needed = min(
                    (self.slots[i].pos + k_steps - 1) // ps + 1, max_blocks
                )
                part = self._part_of(i)
                while self.ptable.num_blocks[i] < needed:
                    try:
                        page = self._alloc(1, part)[0]
                    except MemoryError:
                        if not self._preempt(part=part):
                            raise
                        if self.slots[i].req_id is None:
                            break
                        continue
                    self.ptable.append(i, page)
            active = [
                i for i in active
                if self.slots[i].req_id is not None
                and self.slots[i].phase == "decode"
            ]
            if not active:
                return
        sampling = self.slots[active[0]].sampling
        use_counts = (
            sampling.repetition_penalty != 1.0
            or sampling.presence_penalty != 0.0
            or sampling.frequency_penalty != 0.0
        )
        logprobs = any(self.slots[i].want_logprobs for i in active)
        s = self.num_slots
        positions = np.zeros(s, np.int32)
        act = np.zeros(s, bool)
        eos = np.zeros(s, np.int32)
        remaining = np.ones(s, np.int32)
        gen0 = np.zeros(s, np.int32)
        for i in active:
            sl = self.slots[i]
            positions[i] = sl.pos
            act[i] = True
            eos[i] = sl.eos_id
            gen0[i] = len(sl.prior) + len(sl.generated)
            remaining[i] = max(1, sl.max_new - int(gen0[i]))
        counts = jnp.zeros((), jnp.int32)
        if use_counts:
            c = np.zeros((s, self.cfg.vocab_size), np.int32)
            for i in active:
                for t in self.slots[i].prompt + self.slots[i].generated:
                    c[i, t] += 1
            counts = jnp.asarray(c)
        import os as _os
        import time as _time

        dbg = _os.environ.get("FLEXQ_SCHED_DEBUG")
        t0 = _time.perf_counter()
        self._key, sub = jax.random.split(self._key)
        if self.paged:
            cache = self.pool.state()
            table = jnp.asarray(self.pool.localize(self.ptable.table))
        else:
            cache = (
                (self.kv_k, self.kv_v, self.kv_ks, self.kv_vs)
                if self.quantized
                else (self.kv_k, self.kv_v)
            )
            table = jnp.zeros((), jnp.int32)
        fn = self._fused_fn(k_steps, sampling, use_counts, logprobs)
        t1 = _time.perf_counter()
        tokens, lps, last, cache = fn(
            self.params, self.last_tokens, cache, jnp.asarray(positions),
            jnp.asarray(act), jnp.asarray(eos), jnp.asarray(remaining),
            jnp.asarray(gen0), sub, counts, dynamic_params(sampling), table,
        )
        t2 = _time.perf_counter()
        if self.paged:
            self.pool.set_state(cache)
        elif self.quantized:
            self.kv_k, self.kv_v, self.kv_ks, self.kv_vs = cache
        else:
            self.kv_k, self.kv_v = cache
        self.last_tokens = last
        tok_np = np.asarray(tokens)
        if dbg:
            print(
                f"[fused_tick] prep {(t1-t0)*1e3:.1f}ms dispatch "
                f"{(t2-t1)*1e3:.1f}ms fetch "
                f"{(_time.perf_counter()-t2)*1e3:.1f}ms",
                flush=True,
            )
        lp_np = np.asarray(lps) if logprobs else None
        for i in active:
            slot = self.slots[i]
            for j in range(k_steps):
                t = int(tok_np[i, j])
                if t < 0 or self.slots[i] is not slot:
                    break  # device masked, or _finish_check reset the slot
                slot.pos += 1
                slot.generated.append(t)
                if slot.want_logprobs and lp_np is not None:
                    slot.lps.append(float(lp_np[i, j]))
                self._finish_check(i, slot, t)

    def step(self) -> Dict[int, List[int]]:
        """Admit pending requests, run one decode tick, return finished.

        With chunked admission, at most ONE prompt chunk runs per tick (FIFO
        over prefilling slots), bounding the latency hit decoding slots take
        from a long-prompt admission to one chunk's compute."""
        self._admit()
        prefilling = [
            i for i, s in enumerate(self.slots)
            if s.req_id is not None and s.phase == "prefill"
        ]
        if prefilling:
            self._advance_prefill(min(prefilling, key=lambda i: self.slots[i].req_id))
        active = [
            i for i, s in enumerate(self.slots)
            if s.req_id is not None and s.phase == "decode"
        ]
        if active and not prefilling and self._fusible(active):
            # fused multi-step tick: prefilling slots force the per-token
            # path so admission latency stays one-chunk-bounded
            self._fused_step(active)
        elif active:
            if self.paged:
                ps = self.pool.page_size
                for i in active:
                    if self.slots[i].req_id is None:
                        continue  # preempted by an earlier slot's allocation
                    # the write at pos may open a new logical block
                    needed = self.slots[i].pos // ps + 1
                    part = self._part_of(i)
                    while self.ptable.num_blocks[i] < needed:
                        try:
                            page = self._alloc(1, part)[0]
                        except MemoryError:
                            # youngest request in this partition yields —
                            # possibly this very slot (then it skips the step)
                            if not self._preempt(part=part):
                                raise
                            if self.slots[i].req_id is None:
                                break
                            continue
                        self.ptable.append(i, page)
                # preemption may have vacated slots mid-loop
                active = [
                    i for i in active
                    if self.slots[i].req_id is not None
                    and self.slots[i].phase == "decode"
                ]
                if not active:
                    finished, self.done = self.done, {}
                    return finished
            positions = jnp.asarray(
                [
                    s.pos if s.req_id is not None and s.phase == "decode" else 0
                    for s in self.slots
                ],
                jnp.int32,
            )
            if self.paged:
                logits, state = self._step_jit(
                    self.params, self.last_tokens, self.pool.state(), positions,
                    jnp.asarray(self.pool.localize(self.ptable.table)),
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
            # beam groups consume their slots' rows jointly (top-k over
            # k*vocab + KV row reorder); regular slots batch-sample in one
            # dispatch per sampling group
            for g in list(self.beam_groups.values()):
                self._beam_advance(g, logits)
            plain = [
                i for i in active
                if not self.slots[i].beam and self.slots[i].req_id is not None
            ]
            results = self._sample_batch(plain, logits)
            upd_idx, upd_tok = [], []
            for i, (tok, lp) in zip(plain, results):
                slot = self.slots[i]
                slot.pos += 1
                if slot.want_logprobs and lp is not None:
                    slot.lps.append(lp)
                slot.generated.append(tok)
                upd_idx.append(i)
                upd_tok.append(tok)
                self._finish_check(i, slot, tok)
            if upd_idx:  # one batched last_tokens update (not one op/slot)
                self.last_tokens = self.last_tokens.at[
                    jnp.asarray(upd_idx, jnp.int32), 0
                ].set(jnp.asarray(upd_tok, jnp.int32))
        finished, self.done = self.done, {}
        return finished

    def run(self) -> Dict[int, List[int]]:
        """Drain all requests; returns {req_id: generated tokens}."""
        out: Dict[int, List[int]] = {}
        while self.has_work:
            out.update(self.step())
        return out
