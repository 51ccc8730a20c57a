#!/bin/bash
# The reference's central e2e comparison (README.md:193: FlexQ W6Ax is
# 1.25-1.33x over SmoothQuant W8A8) measured at 13B, where the weight
# fraction of a decode step is largest (7B gave 1.13-1.21x; attention +
# epilogues dilute the weight-stream win there — see
# scripts/bench_decode_parts.py breakdown). ONE TPU process at a time:
#   nohup bash scripts/run_w6_vs_w8a8.sh > /tmp/w6_vs_w8a8.log 2>&1 &
#
# W8A8 runs B=1 ONLY: 13B int8 weights (~13 GB) + B=4 int8 KV caches do not
# fit the 16 GB chip (RESOURCE_EXHAUSTED, measured) — that OOM IS the
# memory half of the reference's claim (W6 planes are 1.33x smaller and DO
# fit B=4; reference README.md:14 reports 1.19-1.24x memory saving).
set -e
cd "$(dirname "$0")/.."

echo "=== 13B W8A8 (SmoothQuant-baseline path), int8 KV, B=1 ==="
FLEXQ_BENCH_MODEL=13b FLEXQ_BENCH_KV=int8 FLEXQ_BENCH_WBITS=8 \
  FLEXQ_BENCH_BS=1 python scripts/bench_e2e7b.py

echo "=== 13B W6 (llama_flex), int8 KV, B=1,4 — same-session re-run ==="
FLEXQ_BENCH_MODEL=13b FLEXQ_BENCH_KV=int8 \
  python scripts/bench_e2e7b.py

echo "=== done: ratio = W8A8 ms / W6 ms per (B, pos) cell ==="
