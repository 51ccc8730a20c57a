"""Kernel block-config autotuner + dispatch table.

Parity with the reference's config machinery done the TPU way: instead of
325 precompiled template configs selected by a hand-written M-bucket table
(engine/flexq_bmma_library.cu + flexq_gemm_wrapper.cu:53-86), the kernel has
a shape heuristic (`_pick_blocks`) plus an optional measured dispatch table:
`sweep()` benchmarks candidate (bm, bn, bk) blocks per workload shape on the
actual device (the sweep-as-test pattern, engine/test_flexq_kernel.sh) and
the winning configs are persisted as JSON; `w6_matmul` consults the loaded
table before falling back to the heuristic.

CLI (run on TPU):
    python -m flexq_tpu.kernels.autotune --out flexq_tpu/kernels/tuned/v5e.json

Caution (measured): with iters=100 the marginal-timing noise (~±10%) is
larger than many config deltas, and a noisy table made end-to-end decode
*slower* than the heuristic (8.75 vs 7.89 ms/step at 7B). Sweep with
--iters 500+ and re-validate e2e before shipping a table; none is shipped
by default.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---- dispatch table --------------------------------------------------------

_TABLE: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}
_DEFAULT_LOADED = False


def m_bucket(m: int) -> int:
    """Decode M-buckets match the reference's {1,2,4,≥8} idea, coarser."""
    if m <= 8:
        return 8
    if m <= 32:
        return 32
    return 0  # prefill — heuristic only


def lookup(m: int, k: int, n: int) -> Optional[Tuple[int, int, int]]:
    global _DEFAULT_LOADED
    if not _TABLE and not _DEFAULT_LOADED:
        _DEFAULT_LOADED = True
        try_load_default()
    return _TABLE.get((m_bucket(m), k, n))


def load_table(path: str) -> int:
    """Load a tuned table; returns number of entries."""
    global _TABLE
    with open(path) as f:
        raw = json.load(f)
    _TABLE = {
        tuple(int(x) for x in key.split(",")): tuple(val)
        for key, val in raw["entries"].items()
    }
    return len(_TABLE)


def save_table(path: str, table: Dict[Tuple[int, int, int], Tuple[int, int, int]]):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {"entries": {",".join(map(str, k)): list(v) for k, v in table.items()}},
            f,
            indent=2,
        )


def _default_table_path() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    import jax

    plat = "v5e" if jax.default_backend() not in ("cpu",) else None
    if plat is None:
        return None
    path = os.path.join(here, "tuned", f"{plat}.json")
    return path if os.path.exists(path) else None


def try_load_default() -> None:
    path = _default_table_path()
    if path:
        try:
            load_table(path)
        except Exception:
            pass


# ---- sweep -----------------------------------------------------------------

# (K, N) workload matrix (reference test_flexq_kernel.sh shapes, padded)
DEFAULT_SHAPES: List[Tuple[int, int]] = [
    (4096, 12288), (4096, 4096), (4096, 11264), (11008, 4096),    # llama-7b
    (5120, 15360), (5120, 5120), (5120, 13824), (13824, 5120),    # llama-2-13b
    (8192, 10240), (8192, 8192), (8192, 28672), (28672, 8192),    # llama-2-70b
]


def candidate_configs(m: int, k: int, n: int) -> List[Tuple[int, int, int]]:
    """Candidate set ALWAYS includes the heuristic's own pick, so a measured
    table can only tie or beat the heuristic (modulo timing noise). The first
    sweep shipped without this and a noisy table regressed e2e decode."""
    from flexq_tpu.kernels.common import largest_divisor_tile, round_up
    from flexq_tpu.kernels.w6_matmul import _pick_blocks

    bks = [bk for bk in (512, 256, 128) if k % bk == 0]
    bns = []
    for cap in (8192, 4096, 2048):
        bn = largest_divisor_tile(n, cap=cap)
        if bn not in bns:
            bns.append(bn)
    bm = round_up(m, 8)
    configs = [(bm, bn, bk) for bn in bns for bk in bks]
    heur = _pick_blocks(m, n, k)
    if heur not in configs:
        configs.insert(0, heur)
    return configs


def sweep(
    shapes: Sequence[Tuple[int, int]] = DEFAULT_SHAPES,
    ms: Sequence[int] = (8, 32),
    iters: int = 100,
    verbose: bool = True,
) -> Dict[Tuple[int, int, int], Tuple[int, int, int]]:
    """Benchmark candidates on-device; returns {(m_bucket,k,n): (bm,bn,bk)}."""
    import jax.numpy as jnp

    from flexq_tpu.kernels.w6_matmul import w6_matmul
    from flexq_tpu.packing import pack6
    from flexq_tpu.utils import bench_fn

    rng = np.random.default_rng(0)
    table: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}
    for m in ms:
        for k, n in shapes:
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // 128)), jnp.float32)
            wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
            ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // 128, n)), jnp.float32)
            hi, lo = pack6(jnp.asarray(wq))
            best, best_t = None, float("inf")
            for bm, bn, bk in candidate_configs(m, k, n):
                try:
                    t = bench_fn(
                        lambda a, b, c, d, e: w6_matmul(
                            a, b, c, d, e, block_m=bm, block_n=bn, block_k=bk
                        ),
                        (xq, xs, hi, lo, ws),
                        iters=iters,
                    )
                except Exception:
                    continue
                if t < best_t:
                    best, best_t = (bm, bn, bk), t
            if best:
                table[(m_bucket(m), k, n)] = best
                if verbose:
                    print(
                        f"M={m} K={k} N={n}: best {best} {best_t*1e6:.0f}us",
                        flush=True,
                    )
    return table


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    table = sweep(iters=args.iters)
    save_table(args.out, table)
    print(f"saved {len(table)} entries -> {args.out}")


if __name__ == "__main__":
    main()
