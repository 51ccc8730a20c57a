"""Pallas W6Ax quantized matmul for TPU.

TPU-native replacement for the reference's bit-serial BTC GEMM
(engine/src/bgemm/flexq_bmma_kernel.h:97-447). The reference emulates W6A6/
W6A8 with 1-bit `and.popc` MMAs because GPUs lack a native INT6 MMA; the TPU
MXU has native int8×int8→int32, so the speed-of-light design is:

  HBM:  6-bit packed weight planes (biased nibble + crumb, packing/pack6.py)
        + per-group(128) scales — 6 bits/weight of traffic, the decode
        bottleneck.
  VMEM: SWAR unpack — `pltpu.bitcast` packs 4 consecutive K-rows into one
        int32 lane word, so masked word-wide shifts reconstruct the biased
        int8 tile in ~1.5 vector ops/byte with zero per-byte sign handling.
  MXU:  one int8 dot per K-group (contraction 128 == one systolic pass) on
        the biased-unsigned weights.
  VPU:  per-group dequant + bias correction fused into the accumulation:
        acc_f32 += (P_u − 32·Σx)(int32) · x_scale[m,g] · w_scale[g,n]
        (the analogue of the reference's in-loop cfrag dequant,
        flexq_bmma_kernel.h:360-373; the −32·Σx term undoes the storage bias
        exactly in integer arithmetic).

W6A6 and W6A8 are the same kernel: activation values are quantized to the
6- or 8-bit range upstream but both live in an int8 container — int6
activations would only shave activation bytes, which are negligible next to
weight bytes, and the MXU computes int8 natively either way.

Measured on TPU v5e (LLaMA-7B down_proj decode shape M=8, K=11008, N=4096):
~35µs ≈ full HBM bandwidth on the 6-bit planes — 3.3× faster than the bf16
dense matmul (115µs) at the same shape.

Exactness: integer dot + f32 scale algebra reproduce the fake-quant oracle
(quant/quantizer.py) to f32 rounding, so perplexity measured on the
fake-quant path transfers to the serving path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexq_tpu.kernels.common import (
    GROUP_SIZE,
    largest_divisor_tile,
    rope_epilogue,
    round_up,
    use_interpret,
)
from flexq_tpu.packing.pack6 import BIAS, PACK_KT

_M0F = 0x0F0F0F0F
_M3C = 0x3C3C3C3C
_M03 = 0x03030303


def _unpack_w_block(hi_blk: jax.Array, lo_blk: jax.Array, bk: int, bn: int) -> jax.Array:
    """SWAR-unpack a [bk/2, bn] hi plane + [bk/4, bn] lo plane into
    biased-unsigned int8 [bk, bn] (values in [0, 63]).

    pltpu.bitcast(int8→int32) packs 4 consecutive sublanes (K-rows) per word,
    so all shifts/masks below act on 4 rows at once and never need per-byte
    sign extension (values are biased-unsigned by the pack format).
    """
    nt = bk // PACK_KT
    h32 = pltpu.bitcast(hi_blk, jnp.int32).reshape(nt, 16, bn)
    c32 = pltpu.bitcast(lo_blk, jnp.int32).reshape(nt, 8, bn)
    a = (h32 & _M0F) << 2  # K-rows [0, 64): biased hi nibble * 4
    b = (h32 >> 2) & _M3C  # K-rows [64, 128)
    c0 = c32 & _M03
    c1 = (c32 >> 2) & _M03
    c2 = (c32 >> 4) & _M03
    c3 = (c32 >> 6) & _M03
    w32 = jnp.concatenate(
        [a[:, :8] | c0, a[:, 8:] | c1, b[:, :8] | c2, b[:, 8:] | c3], axis=1
    )  # [nt, 32, bn] words == [nt, 128, bn] bytes
    return pltpu.bitcast(w32.reshape(bk // 4, bn), jnp.int8)


def _w6_matmul_kernel(
    x_ref,  # int8 [bm, bk]
    xs_ref,  # f32  [bk/G, bm, 1]  (group axis leading: static sublane index)
    hi_ref,  # int8 [bk/2, bn]
    lo_ref,  # int8 [bk/4, bn]
    ws_ref,  # f32  [bk/G, 1, bn]
    o_ref,  # out  [bm, bn]
    acc_ref,  # f32 scratch [bm, bn]
    *,
    bm: int,
    bn: int,
    bk: int,
    out_dtype,
):
    # Scales carry the group axis as the *leading* dim so each group's
    # [bm,1] / [1,bn] factor is a static index — Mosaic cannot lower dynamic
    # lane-dim offsets, and this layout needs no in-kernel transpose.
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_w_block(hi_ref[:], lo_ref[:], bk, bn)  # biased [0, 63]

    ngroups = bk // GROUP_SIZE
    acc = acc_ref[:]
    for g in range(ngroups):
        xg = x_ref[:, g * GROUP_SIZE : (g + 1) * GROUP_SIZE]
        wg = w[g * GROUP_SIZE : (g + 1) * GROUP_SIZE, :]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # exact bias correction: Σx·(u−32) = Σx·u − 32·Σx  (int32)
        rowsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
        part = part - BIAS * rowsum
        # fused per-group dequant: int32 partial × (x_scale ⊗ w_scale)
        sg = xs_ref[g] * ws_ref[g]
        acc = acc + part.astype(jnp.float32) * sg
    acc_ref[:] = acc

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_blocks(
    m: int,
    n: int,
    k: int,
    exact_int: bool = False,
    bk_cap: int = 256,
    rope: bool = False,
):
    """Block-size selection: measured dispatch table first (autotune.py),
    then the shape heuristic (replaces the reference's 325-config library +
    per-M-bucket table, flexq_gemm_wrapper.cu:53-86).

    ``exact_int`` marks the A8 kernel (int8-act, int32 group partials): its
    per-group int32 partial tile doubles the VMEM scratch vs the bf16-act
    variant, so large-M blocks must shrink — (512, 2048, 512) busts the
    16 MB scoped-vmem limit there (measured: quantized-lm_head prefill and
    scripts/bench_prefill_a8.py; (512, 2048, 256) fits and swept fastest).

    ``rope`` marks the fused-rope bf16 kernels: the two f32 rope operands +
    the f32 epilogue temporaries bust the same 16 MB limit at the prefill
    blocks (measured 16.09 MB at (512, 2048, 512) on the 7B q-proj shape);
    bm=256 fits with ~5 MB headroom and timed within noise of the other
    fitting configs (scripts/bench_rope_fusion.py).
    """
    from flexq_tpu.kernels import autotune

    tuned = autotune.lookup(m, k, n)
    if tuned is not None:
        if rope and m > 32:
            bm, bn, bk = tuned
            return min(bm, 256), bn, bk
        return tuned
    # decode bk=256: bk=512 looked marginally faster on the 7B e2e matrix
    # but dropped the reference-shape kernel metric (M=1 + 70B shapes) from
    # 2.667x to 2.583x vs bf16 — 256 wins across the full matrix.
    # ``bk_cap`` overrides for A/B sweeps (bench scripts only).
    bk = largest_divisor_tile(k, cap=bk_cap)
    if m <= 32:
        # decode: weight-streaming bound — maximize N block for DMA depth
        # (cap 8192: measured ~10-20% over 4096 on wide-N 7B shapes; VMEM
        # budget 0.75*bk*bn*2buf + acc stays ~8 MB at bk=256, bn=8192)
        bm = round_up(m, 8)
        bn = largest_divisor_tile(n, cap=8192)
    else:
        # prefill: MXU-bound. Swept at M=2048 over 7B shapes: bm=512 with
        # wide bn (2048) and bk=512 runs 162-172 TF vs ~135-150 for the old
        # (1024, 512, 256) choice — wider N amortizes the in-kernel weight
        # dequant across more MXU work per block. f32 acc 512x2048 = 4 MB.
        bk = largest_divisor_tile(k, cap=256 if exact_int else 512)
        bm = min(256 if rope else 512, round_up(m, 256))
        bn = largest_divisor_tile(n, cap=2048)
    return bm, bn, bk


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_dtype", "block_m", "block_n", "block_k", "interpret", "use_stream"
    ),
)
def w6_matmul(
    x_q: jax.Array,  # int8 [M, K] quantized activations (6- or 8-bit values)
    x_scale: jax.Array,  # f32 [M, K/128] per-token per-group scales
    w_hi: jax.Array,  # int8 [K/2, N] packed (biased) hi nibbles
    w_lo: jax.Array,  # int8 [K/4, N] packed lo crumbs
    w_scale: jax.Array,  # f32 [K/128, N] per-group weight scales
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    use_stream: Optional[bool] = None,
) -> jax.Array:
    """out[m,n] = Σ_g (Σ_{k∈g} x_q·w_q) · x_scale[m,g] · w_scale[g,n].

    The serving-path analogue of FLEXQGEMMWrapper::gemm
    (e2e .../flexq_gemm_wrapper.cu:21-97).

    ``use_stream``: None = auto-dispatch K-tall decode shapes to the manual
    streaming kernel; False forces the grid kernel (A/B sweeps).
    """
    m, k = x_q.shape
    n = w_hi.shape[1]
    assert k % GROUP_SIZE == 0, f"K={k} must be a multiple of {GROUP_SIZE}"
    assert w_hi.shape == (k // 2, n) and w_lo.shape == (k // 4, n)
    assert x_scale.shape == (m, k // GROUP_SIZE)
    assert w_scale.shape == (k // GROUP_SIZE, n)

    if interpret is None:
        interpret = use_interpret()

    if (
        m <= 32
        and k > n
        and block_m is None
        and use_stream is not False
    ):
        # K-tall decode shapes (down_proj/fc2): the manual triple-buffered
        # streaming kernel measures ~3-5% faster (9/12 repeats) — deep-K
        # loops favor owning the DMA pipeline (same finding as flash_decode)
        from flexq_tpu.kernels.w6_stream import w6_matmul_stream

        return w6_matmul_stream(
            x_q, x_scale, w_hi, w_lo, w_scale,
            out_dtype=out_dtype, block_n=block_n, block_k=block_k,
            interpret=interpret,
        )

    abm, abn, abk = _pick_blocks(m, n, k, exact_int=True)
    bm = block_m or abm
    bn = block_n or abn
    bk = block_k or abk

    # M is ragged at serve time (decode batch); pad to the block.
    mp = round_up(m, bm)
    if mp != m:
        x_q = jnp.pad(x_q, ((0, mp - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, mp - m), (0, 0)))

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    # group axis leading (see kernel docstring)
    xs_t = x_scale.astype(jnp.float32).T.reshape(ng, mp, 1)
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)

    grid = (mp // bm, n // bn, k // bk)
    kernel = functools.partial(
        _w6_matmul_kernel, bm=bm, bn=bn, bk=bk, out_dtype=out_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ngb, bm, 1), lambda i, j, kk: (kk, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 4, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + (k * n * 3) // 4 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, xs_t, w_hi, w_lo, ws_t)
    return out[:m] if mp != m else out


def w6_matmul_ref(x_q, x_scale, w_hi, w_lo, w_scale, out_dtype=jnp.float32):
    """Golden reference: same math via unpacked int8 in plain jnp.

    TPU analogue of the reference's CPU bit-serial compute_ref
    (engine/test_bgemm_kernel.cu:113-146).
    """
    from flexq_tpu.packing.pack6 import unpack6

    m, k = x_q.shape
    w = unpack6(w_hi, w_lo)  # signed int8 [K, N]
    n = w.shape[1]
    ng = k // GROUP_SIZE
    xg = x_q.astype(jnp.int32).reshape(m, ng, GROUP_SIZE)
    wg = w.astype(jnp.int32).reshape(ng, GROUP_SIZE, n)
    # exact integer per-group partials, then f32 scale algebra
    parts = jnp.einsum("mgk,gkn->mgn", xg, wg).astype(jnp.float32)
    out = jnp.einsum(
        "mgn,mg,gn->mn", parts, x_scale.astype(jnp.float32), w_scale.astype(jnp.float32)
    )
    return out.astype(out_dtype)


def _w6_bf16_kernel(
    x_ref,  # bf16 [bm, bk]
    hi_ref,  # int8 [bk/2, bn]
    lo_ref,  # int8 [bk/4, bn]
    ws_ref,  # f32  [bk/G, 1, bn]
    *rest,  # with rope: (cos_ref [bm,128] f32, sin2_ref [bm,128] f32) then
    #         o_ref [bm, bn], acc_ref f32 scratch [bm, bn]
    bm: int,
    bn: int,
    bk: int,
    out_dtype,
    rope: bool = False,
):
    """W6A16 tile kernel; ``rope=True`` adds a fused RoPE epilogue (q/k
    projections at prefill).

    Each 128-lane group of the output is one head (head_dim == 128 — the
    caller gates on it). HF half-rotate rope on the f32 accumulator:
        out = t * cos + rotate_half(t) * sin
    with rotate_half(t) * sin rewritten as roll(t, 64) * sin2 (sin2 carries
    the sign flip — see kernels.common.rope_epilogue), so the whole epilogue
    is one lane-roll + 2 mul + add with no sub-128 lane slicing
    (Mosaic-hostile). Fusing removes the separate rope pass over q and k
    (reference analogue: rope applied inside the fused QKV-bias kernel,
    unfused_attention_kernels.cu).
    """
    if rope:
        cos_ref, sin2_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_u = _unpack_w_block(hi_ref[:], lo_ref[:], bk, bn)  # biased [0, 63]
    ngroups = bk // GROUP_SIZE
    ws = ws_ref[:].reshape(ngroups, 1, bn)
    ws_rep = pltpu.repeat(ws, GROUP_SIZE, axis=1).reshape(bk, bn)
    w_deq = ((w_u.astype(jnp.float32) - BIAS) * ws_rep).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_deq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_step == nk - 1)
    def _():
        if rope:
            o_ref[:] = rope_epilogue(
                acc_ref[:], cos_ref, sin2_ref, bm, bn, out_dtype
            )
        else:
            o_ref[:] = acc_ref[:].astype(out_dtype)


def _w6_glu_bf16_kernel(
    x_ref,  # bf16 [bm, bk]
    ghi_ref,  # int8 [bk/2, bn]   gate plane
    glo_ref,  # int8 [bk/4, bn]
    gws_ref,  # f32  [bk/G, 1, bn]
    uhi_ref,  # int8 [bk/2, bn]   up plane
    ulo_ref,  # int8 [bk/4, bn]
    uws_ref,  # f32  [bk/G, 1, bn]
    o_ref,  # out [bm, bn]
    accg_ref,  # f32 scratch [bm, bn]
    accu_ref,  # f32 scratch [bm, bn]
    *,
    bm: int,
    bn: int,
    bk: int,
    act: str,
    out_dtype,
):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    ngroups = bk // GROUP_SIZE
    x = x_ref[:]
    for acc_ref, hi_ref, lo_ref, ws_ref in (
        (accg_ref, ghi_ref, glo_ref, gws_ref),
        (accu_ref, uhi_ref, ulo_ref, uws_ref),
    ):
        w_u = _unpack_w_block(hi_ref[:], lo_ref[:], bk, bn)
        ws = ws_ref[:].reshape(ngroups, 1, bn)
        ws_rep = pltpu.repeat(ws, GROUP_SIZE, axis=1).reshape(bk, bn)
        w_deq = ((w_u.astype(jnp.float32) - BIAS) * ws_rep).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            x, w_deq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k_step == nk - 1)
    def _():
        g = accg_ref[:]
        u = accu_ref[:]
        if act == "silu":
            a = g * jax.lax.logistic(g)
        elif act == "gelu":
            a = jax.nn.gelu(g)
        else:
            raise ValueError(act)
        o_ref[:] = (a * u).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def w6_glu_matmul_bf16(
    x: jax.Array,  # bf16/f32 [M, K]
    g_hi: jax.Array,  # gate 6-bit planes [K/2, N], [K/4, N]
    g_lo: jax.Array,
    g_scale: jax.Array,  # f32 [K/G, N]
    u_hi: jax.Array,  # up planes
    u_lo: jax.Array,
    u_scale: jax.Array,
    *,
    act: str = "silu",
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused W6A16 GLU: act(x @ gate) * (x @ up) in ONE kernel.

    The prefill FFN producer chain the reference fuses on GPU
    (activation_kernels.cu:246-446 fused SiLU-dot): three separate ops
    (gate GEMM -> HBM, up GEMM -> HBM, elementwise silu*mul pass) become one
    — x is read once instead of twice, the two [M, N_ffn] GEMM outputs and
    the activation pass's reads never touch HBM (~180 MB/layer at 7B
    L=2048), and only the activated product is written. Weight traffic is
    unchanged (both 6-bit planes stream once).
    """
    m, k = x.shape
    n = g_hi.shape[1]
    assert k % GROUP_SIZE == 0
    assert u_hi.shape[1] == n
    if interpret is None:
        interpret = use_interpret()

    abm, abn, abk = _pick_blocks(m, n, k)
    bm = block_m or abm
    # two f32 accumulators + two weight streams: halve the auto N block to
    # stay inside the 16 MB scoped-VMEM budget at bm=512
    bn = block_n or min(abn, 1024)
    bk = block_k or abk
    mp = round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    x = x.astype(jnp.bfloat16)

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    gws_t = g_scale.astype(jnp.float32).reshape(ng, 1, n)
    uws_t = u_scale.astype(jnp.float32).reshape(ng, 1, n)

    grid = (mp // bm, n // bn, k // bk)
    w_spec = lambda div: pl.BlockSpec(
        (bk // div, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _w6_glu_bf16_kernel, bm=bm, bn=bn, bk=bk, act=act, out_dtype=out_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            w_spec(2), w_spec(4), s_spec,
            w_spec(2), w_spec(4), s_spec,
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * n * k,
            bytes_accessed=mp * k * 2 + 2 * (k * n * 3) // 4 + mp * n * 2,
            transcendentals=mp * n,
        ),
        interpret=interpret,
    )(x, g_hi, g_lo, gws_t, u_hi, u_lo, uws_t)
    return out[:m] if mp != m else out


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def w6_glu_fused_bf16(
    x: jax.Array,  # bf16/f32 [M, K]
    hi: jax.Array,  # FUSED gate|up planes [K/2, 2*Nh] (quantize_params fuse=True)
    lo: jax.Array,  # [K/4, 2*Nh]
    scale: jax.Array,  # f32 [K/G, 2*Nh]
    *,
    act: str = "silu",
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused-plane variant of :func:`w6_glu_matmul_bf16`: the gate_up weight
    is ONE packed matrix with gate in columns [0, Nh) and up in [Nh, 2Nh)
    (quantize_params ``fuse=True`` layout). The same plane is passed twice
    with different column index maps — no slice materialization (a sliced
    operand to pallas_call would copy half the plane per layer)."""
    m, k = x.shape
    n2 = hi.shape[1]
    nh = n2 // 2
    assert k % GROUP_SIZE == 0 and n2 % 2 == 0
    if interpret is None:
        interpret = use_interpret()

    abm, abn, abk = _pick_blocks(m, nh, k)
    bm = block_m or abm
    bn = block_n or min(abn, 1024)
    bk = block_k or abk
    assert nh % bn == 0, (nh, bn)
    off = nh // bn  # up view: gate column-block index + off
    mp = round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    x = x.astype(jnp.bfloat16)

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    ws_t = scale.astype(jnp.float32).reshape(ng, 1, n2)

    grid = (mp // bm, nh // bn, k // bk)
    gw = lambda div: pl.BlockSpec(
        (bk // div, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
    )
    uw = lambda div: pl.BlockSpec(
        (bk // div, bn), lambda i, j, kk: (kk, j + off), memory_space=pltpu.VMEM
    )
    gs = pl.BlockSpec(
        (ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM
    )
    us = pl.BlockSpec(
        (ngb, 1, bn), lambda i, j, kk: (kk, 0, j + off), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _w6_glu_bf16_kernel, bm=bm, bn=bn, bk=bk, act=act, out_dtype=out_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            gw(2), gw(4), gs,
            uw(2), uw(4), us,
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, nh), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * nh * k,
            bytes_accessed=mp * k * 2 + (k * n2 * 3) // 4 + mp * nh * 2,
            transcendentals=mp * nh,
        ),
        interpret=interpret,
    )(x, hi, lo, ws_t, hi, lo, ws_t)
    return out[:m] if mp != m else out


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def w6_matmul_bf16(
    x: jax.Array,  # bf16/f32 [M, K] full-precision activations
    w_hi: jax.Array,
    w_lo: jax.Array,
    w_scale: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    rope_cos: Optional[jax.Array] = None,  # f32 [M, 128]: fused rope epilogue
    rope_sin2: Optional[jax.Array] = None,  # f32 [M, 128] = (-sin | sin)
) -> jax.Array:
    """W6A16: in-kernel dequant to bf16 + one full-K MXU dot per block.

    The prefill path: compute-bound at large M, where the exact-int kernel's
    per-group VPU dequant dominates. Dequantizing the *weights* instead costs
    ~4 VPU ops per (k,n) amortized over bm rows (<1% at bm=256), runs the MXU
    in bf16, and keeps the 6-bit HBM traffic. Activations stay unquantized —
    strictly more accurate than the W6Ax decode path; the fake-quant oracle
    remains the accuracy bound for generated tokens (decode is exact).

    ``rope_cos``/``rope_sin2``: apply HF half-rotate RoPE to the f32
    accumulator before the output cast (q/k projections; requires
    head_dim == 128 so each 128-lane output group is one head). Build the
    operands with models.llama.rope_gemm_operands.
    """
    m, k = x.shape
    n = w_hi.shape[1]
    assert k % GROUP_SIZE == 0
    rope = rope_cos is not None
    if rope:
        assert rope_sin2 is not None and rope_cos.shape == (m, 128)
    if interpret is None:
        interpret = use_interpret()

    abm, abn, abk = _pick_blocks(m, n, k, rope=rope)
    bm = block_m or abm
    bn = block_n or abn
    bk = block_k or abk
    mp = round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    x = x.astype(jnp.bfloat16)

    ng = k // GROUP_SIZE
    ngb = bk // GROUP_SIZE
    ws_t = w_scale.astype(jnp.float32).reshape(ng, 1, n)

    grid = (mp // bm, n // bn, k // bk)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (bk // 4, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (ngb, 1, bn), lambda i, j, kk: (kk, 0, j), memory_space=pltpu.VMEM
        ),
    ]
    operands = [x, w_hi, w_lo, ws_t]
    kernel = functools.partial(
        _w6_bf16_kernel, bm=bm, bn=bn, bk=bk, out_dtype=out_dtype, rope=rope
    )
    if rope:
        cs_spec = pl.BlockSpec(
            (bm, 128), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs += [cs_spec, cs_spec]

        def pad_cs(a):
            a = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a
            return a.astype(jnp.float32)

        operands += [pad_cs(rope_cos), pad_cs(rope_sin2)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + (k * n * 3) // 4 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m] if mp != m else out
