"""On-device timing harness (TPU analogue of engine/common/timer.h CudaTimer).

Measurement pitfalls this works around (axon-tunneled TPU):
  * per-dispatch round-trip is ~1ms and `block_until_ready` can return before
    execution finishes — only fetching a value truly synchronizes;
  * XLA narrows `matmul[0,0]`-style reductions through dots and hoists
    loop-invariant bodies, so the loop threads a data-dependent (runtime-zero)
    delta into the inputs and fully reduces every output.

So: run the whole loop in ONE jitted program, fetch the scalar, and report
the *marginal* time between two iteration counts to cancel the fixed
dispatch/transfer overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _make_loop(fn: Callable, iters: int):
    @jax.jit
    def run(args):
        def body(_, acc):
            first, *rest = args
            # data-dependent zero: defeats hoisting/CSE without changing math
            delta = (acc > jnp.float32(1e30)).astype(first.dtype)
            out = fn(first + delta, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + leaves[0].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def bench_fn(
    fn: Callable,
    args: Sequence,
    iters: int = 250,
    reps: int = 3,
) -> float:
    """Median marginal seconds per call of fn(*args), measured on device.

    The marginal baseline uses iters/5 (not 1) so that ±ms round-trip noise
    is divided by a large iteration delta — essential for sub-100µs kernels.
    """
    bench_fn.last_fallback = False
    args = tuple(args)
    lo_iters, hi_iters = max(1, iters // 5), iters
    run_lo = _make_loop(fn, lo_iters)
    run_hi = _make_loop(fn, hi_iters)
    # warm both compilations and force real execution via value fetch
    float(run_lo(args))
    float(run_hi(args))

    def timed(run):
        t0 = time.perf_counter()
        float(run(args))
        return time.perf_counter() - t0

    def med(v):
        return sorted(v)[len(v) // 2]

    # Median the lo and hi POPULATIONS separately, then difference the
    # medians. Per-pair deltas (the old statistic) are fragile: one axon
    # stall on a single lo run makes that pair's delta <= 0, and with few
    # reps the median collapses to ~0 — observed as "0us / 52770x" entries
    # that poison the headline average. A stall inflates one sample of one
    # population; the population median shrugs it off.
    los, his = [], []
    for _ in range(reps):  # interleaved: tunnel drift hits both populations
        los.append(timed(run_lo))
        his.append(timed(run_hi))
    delta = med(his) - med(los)
    if delta <= 0:
        # pathological stall pattern: one fresh round of samples
        for _ in range(reps):
            los.append(timed(run_lo))
            his.append(timed(run_hi))
        delta = med(his) - med(los)
    if delta <= 0:
        # Give up on the marginal estimate; report the absolute per-iter
        # time of the big loop (includes dispatch overhead). NOTE: this
        # OVERSTATES the measured fn's time — conservative when it fires on
        # the candidate kernel, but if it fires on the BASELINE side of a
        # ratio the ratio is inflated. Flag it so harnesses (bench.py) can
        # exclude or annotate the shape instead of silently mixing marginal
        # and absolute estimates into one average.
        bench_fn.last_fallback = True
        print(
            "bench_fn: marginal estimate failed (persistent stall); "
            "falling back to absolute per-iter time",
            file=__import__("sys").stderr,
            flush=True,
        )
        return med(his) / hi_iters
    return delta / (hi_iters - lo_iters)


# True when the most recent bench_fn call used the absolute-time fallback
# instead of the marginal estimate; callers reset it before measuring.
bench_fn.last_fallback = False


def bandwidth_gbs(nbytes: int, seconds: float) -> float:
    return nbytes / seconds / 1e9


def tflops(flops: int, seconds: float) -> float:
    return flops / seconds / 1e12
