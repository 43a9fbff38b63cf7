#!/bin/bash
# Reproduce the round-4 chunking-method downstream A/B (BASELINE.md table).
# Each leg: 3 seeds of tools/eval_chunking.py on the realistic corpus.
# Legs run SEQUENTIALLY (the 1-core host serializes anyway):
#   1. main A/B: whole_doc + char@1000 + splitter + grouping (+ KNRM leg)
#   2. char@1500 and char@3000 granularity controls
#   3. semantic_splitter_dp (the reference's dead-code config, working)
#   4. hash-tokenizer counterpart (subword-vs-hash delta)
# Aggregate with: python tools/quality_report.py
set -u
cd "$(dirname "$0")/.."

run() { # name extra-args...
  local name=$1; shift
  for s in 0 1 2; do
    [ -s "bench_results/${name}_s$s.json" ] && {
      echo "skip ${name}_s$s (exists)"; continue; }
    nice -n 5 python tools/eval_chunking.py --seed $s "$@" \
      --output "bench_results/${name}_s$s" \
      > "bench_results/${name}_s$s.json" \
      2> "bench_results/${name}_s$s.log"
    echo "done ${name}_s$s rc=$?"
  done
}

run chunk_ab
run chunk_ab_charctl --configs "" --char-size 1500
run chunk_ab_char3k  --configs "" --char-size 3000
run chunk_ab_dp      --configs semantic_splitter_dp
run chunk_ab_hash    --tokenizer hash --rerankers none
echo ALL_DONE_CHUNKING_AB
