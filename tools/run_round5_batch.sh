#!/bin/bash
# Round-5 CPU quality batch (VERDICT-r4 items 1, 2, 4, 5) — run ALONE on
# the 1-core host (any concurrent bench corrupts host timings; quality
# metrics themselves are timing-independent but the batch starves siblings).
#
# Phase A: unified capstone x chunking x realistic corpus (item 1 + 4):
#   the full best-known recipe (MLM 3ep + mining x2 + subword + tuned
#   fusion + blend) at the best semantic chunking configs + the char@1000
#   frontier winner as control, rerankers esim/match_lstm/cross_encoder
#   (warm start, 50-candidate pool, 12 ep) + distilled CE variant. 3 seeds.
# Phase B: high-granularity semantic frontier (item 2): semantic operating
#   points at ~750 and ~1100 chunks via dp_penalty_scale / cap_soft /
#   soft_cap, vs char@1000/@1500. 3 seeds, no rerank leg.
# Phase C: OIE gold re-measure with the teacher-agreement gate (item 5c).
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
mkdir -p "$OUT"

for seed in 0 1 2; do
  echo "=== capstone chunking seed $seed ==="
  timeout 14400 python tools/eval_chunking.py \
    --seed "$seed" --recipe capstone \
    --configs semantic_grouping,semantic_splitter_dp --char-size 1000 \
    --rerankers esim,match_lstm,cross_encoder,cross_encoder_distill \
    --output "/tmp/capstone_chunk_s$seed" \
    > "$OUT/capstone_chunk_s$seed.json" \
    2> "$OUT/capstone_chunk_s$seed.log"
done

for seed in 0 1 2; do
  echo "=== granularity frontier seed $seed ==="
  timeout 7200 python tools/eval_chunking.py \
    --seed "$seed" --rerankers none \
    --configs GRANULARITY_CONFIGS_PLACEHOLDER \
    --char-size 1500 \
    --output "/tmp/gran_frontier_s$seed" \
    > "$OUT/gran_frontier_s$seed.json" \
    2> "$OUT/gran_frontier_s$seed.log"
done

echo "=== OIE gold with self-check ==="
timeout 3600 python tools/eval_oie_gold.py \
  > "$OUT/oie_gold_r5.json" 2> "$OUT/oie_gold_r5.log"

echo "round-5 batch done"
