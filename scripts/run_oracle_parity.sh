#!/bin/bash
# 7B serve-vs-oracle parity sweep on the TPU: three configs, each phase its
# own process (serve: packed tree; oracle: fake-quant dense tree — they
# cannot coexist in 16 GB HBM). ONE TPU process at a time; run via
#   nohup bash scripts/run_oracle_parity.sh > /tmp/oracle_parity.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
for cfg in "w6 bf16" "w6 int8" "w4a8 bf16"; do
  set -- $cfg
  echo "=== config policy=$1 kv=$2 ==="
  python scripts/oracle_parity.py serve   --policy "$1" --kv "$2"
  python scripts/oracle_parity.py oracle  --policy "$1" --kv "$2"
  python scripts/oracle_parity.py compare --policy "$1" --kv "$2"
done
echo "=== all configs done ==="
