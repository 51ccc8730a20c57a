#!/usr/bin/env python
"""TODO-2 validation: does any block config beat the shape heuristic by more
than axon timing noise (+-10-15%) on the 24 decode shapes, at iters=500?

Per shape: benchmark the heuristic pick and every candidate config at
iters=500 reps=5 (median marginal timing), print a table and a JSON summary.
Ship a tuned table only if some shape shows a consistent >15% win.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from flexq_tpu.kernels import autotune
from flexq_tpu.kernels.w6_matmul import _pick_blocks, w6_matmul
from flexq_tpu.packing import pack6
from flexq_tpu.utils import bench_fn

G = 128
ITERS = int(os.environ.get("VAL_ITERS", "500"))
REPS = int(os.environ.get("VAL_REPS", "5"))


def main():
    rng = np.random.default_rng(0)
    rows = []
    for m in (8, 32):
        for k, n in autotune.DEFAULT_SHAPES:
            xq = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, k // G)), jnp.float32)
            wq = rng.integers(-32, 32, (k, n)).astype(np.int8)
            ws = jnp.asarray(rng.uniform(0.01, 0.1, (k // G, n)), jnp.float32)
            hi, lo = pack6(jnp.asarray(wq))
            heur = _pick_blocks(m, n, k)
            times = {}
            for cfg in autotune.candidate_configs(m, k, n):
                bm, bn, bk = cfg
                try:
                    t = bench_fn(
                        lambda a, b, c, d, e: w6_matmul(
                            a, b, c, d, e, block_m=bm, block_n=bn, block_k=bk
                        ),
                        (xq, xs, hi, lo, ws),
                        iters=ITERS,
                        reps=REPS,
                    )
                except Exception as e:  # config invalid for this shape
                    print(f"  skip {cfg}: {type(e).__name__}", flush=True)
                    continue
                times[cfg] = t
            if heur not in times:
                continue
            t_h = times[heur]
            best_cfg, t_b = min(times.items(), key=lambda kv: kv[1])
            win = t_h / t_b - 1.0
            plane = (k * n * 3) // 4
            print(
                f"M={m} K={k} N={n}: heur {heur} {t_h*1e6:6.1f}us "
                f"({plane/t_h/1e9:4.0f} GB/s) | best {best_cfg} {t_b*1e6:6.1f}us "
                f"| best-vs-heur +{win*100:.1f}%",
                flush=True,
            )
            rows.append(
                {
                    "m": m, "k": k, "n": n,
                    "heur": list(heur), "t_heur_us": t_h * 1e6,
                    "best": list(best_cfg), "t_best_us": t_b * 1e6,
                    "win_pct": win * 100,
                    "all": {str(c): t * 1e6 for c, t in times.items()},
                }
            )
    sig = [r for r in rows if r["win_pct"] > 15.0]
    print(f"\n== {len(rows)} shapes; {len(sig)} with >15% win over heuristic ==")
    for r in sig:
        print(f"  M={r['m']} K={r['k']} N={r['n']}: {r['best']} +{r['win_pct']:.1f}%")
    with open("/tmp/autotune_validate.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote /tmp/autotune_validate.json", flush=True)


if __name__ == "__main__":
    main()
