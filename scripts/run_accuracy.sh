#!/bin/bash
# One-command accuracy acceptance run (reference algorithm/main.py:43-121 +
# README.md:110 table): WikiText2 perplexity (FP16 vs W6Ax, Δ must be <=0.1)
# and the six README zero-shot tasks, the moment real weights + datasets are
# mounted. Until then it dry-runs cleanly to the dataset gate and prints what
# is missing (this environment ships only LFS stubs — verified round 1).
#
# Usage:
#   MODEL=/path/to/llama-7b-hf \
#   WIKITEXT=/path/to/wikitext2 \
#   TASKS_ROOT=/path/to/task-datasets \
#   bash scripts/run_accuracy.sh
#
# TASKS_ROOT holds one datasets.save_to_disk dir per task:
#   $TASKS_ROOT/{piqa,arc_easy,arc_challenge,boolq,hellaswag,winogrande}
set -e
cd "$(dirname "$0")/.."

MODEL="${MODEL:-/data/llama-7b-hf}"
WIKITEXT="${WIKITEXT:-/data/wikitext2}"
TASKS_ROOT="${TASKS_ROOT:-/data/lm_eval_tasks}"
TASKS="piqa,arc_easy,arc_challenge,boolq,hellaswag,winogrande"

missing=0
gate() {
  python - "$1" "$2" <<'EOF'
import sys
from flexq_tpu.eval.data import dataset_available
ok = dataset_available(sys.argv[1], sys.argv[2])
print(("OK   " if ok else "MISS ") + sys.argv[1])
sys.exit(0 if ok else 1)
EOF
}

echo "== dataset gate =="
gate "$WIKITEXT" test || missing=1
for t in ${TASKS//,/ }; do
  gate "$TASKS_ROOT/$t" validation || missing=1
done
if [ ! -d "$MODEL" ]; then
  echo "MISS $MODEL (HF checkpoint dir)"
  missing=1
fi
if [ "$missing" = "1" ]; then
  echo "-- gated: mount the missing data above, then re-run. Nothing executed."
  exit 0
fi

echo "== FP16 baseline ppl =="
python -m flexq_tpu.main --model "$MODEL" --wbits 16 --abits 16 \
  --eval_ppl --ppl-data "$WIKITEXT" --seqlen 2048

echo "== FlexQ W6Ax (llama_flex policy, symmetric default) ppl + README tasks =="
python -m flexq_tpu.main --model "$MODEL" \
  --wbits 6 --abits 8 --w_group_size 128 --a_group_size 128 \
  --flex_linear_quant \
  --eval_ppl --ppl-data "$WIKITEXT" --seqlen 2048 \
  --tasks "$TASKS" --task-data-root "$TASKS_ROOT"

echo "== done: compare the two ppl lines (acceptance: delta <= 0.1) =="
