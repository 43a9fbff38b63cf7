#!/bin/bash
# Round-5 CPU quality batch (VERDICT-r4 items 1, 2, 4, 5) — run ALONE on
# the 1-core host (any concurrent bench corrupts host timings; quality
# metrics themselves are timing-independent but the batch starves siblings).
#
# Interleaved by seed so a time-bounded run still yields multi-seed tables
# for every family:
#   OIE gold re-measure (item 5c, fast, first)
#   then per seed: capstone x chunking (items 1+4), granularity frontier
#   (item 2, BASIC recipe — comparable to the r4 chunking A/B table).
# GRAN_VARIANTS must be filled from the seed-0 calibration run.
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
mkdir -p "$OUT"

echo "=== OIE gold with self-check ==="
timeout 3600 python tools/eval_oie_gold.py \
  > "$OUT/oie_gold_r5.json" 2> "$OUT/oie_gold_r5.log"

# Calibrated at seed 0 (see docs/ROADMAP.md r5 item 2): the representative
# high-granularity set — splitter soft_cap=3 (~843 chunks), grouping
# cap_soft=3 (~487; its over-cap split is single-level so counts saturate),
# DP splitter + soft_cap=4 (~832).
GRAN_VARIANTS=${GRAN_VARIANTS:-"--variant split3=semantic_splitter:soft_cap=3 --variant grp3=semantic_grouping:cap_soft=3 --variant dpcap4=semantic_splitter_dp:soft_cap=4"}

for seed in 0 1 2; do
  echo "=== capstone chunking seed $seed ==="
  timeout 10800 python tools/eval_chunking.py \
    --seed "$seed" --recipe capstone \
    --configs semantic_grouping,semantic_splitter_dp --char-size 1000 \
    --rerankers esim,match_lstm,cross_encoder,cross_encoder_distill \
    --ce-configs semantic_grouping \
    --restricted-rerankers match_lstm,cross_encoder \
    --output "/tmp/capstone_chunk_s$seed" \
    > "$OUT/capstone_chunk_s$seed.json" \
    2> "$OUT/capstone_chunk_s$seed.log"

  echo "=== granularity frontier seed $seed ==="
  # shellcheck disable=SC2086
  timeout 7200 python tools/eval_chunking.py \
    --seed "$seed" --rerankers none \
    --configs "" --char-size 1500 \
    $GRAN_VARIANTS \
    --output "/tmp/gran_frontier_s$seed" \
    > "$OUT/gran_frontier_s$seed.json" \
    2> "$OUT/gran_frontier_s$seed.log"
done

echo "round-5 batch done"
