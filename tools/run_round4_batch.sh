#!/bin/bash
# Round-4 measurement runbook (VERDICT r3 item 3), in priority order:
#   1. capstone_bt2_s{0,1,2}: capstone + validation-tuned blend, all 3 seeds
#      under ONE protocol (disjoint blend-tuning split, fc7ad29), reusing each
#      seed's saved encoder from bench_results/capstone_bt_s*/encoder_ckpt.
#   2. ce_scale_s{0,1,2}: the cross-encoder scale-quality row (200 topics,
#      encoder_full warm start, 12 epochs — the r3 A/B showed 4 underfits),
#      reusing the same encoders.
# Each stage writes bench_results/<name>.json + .log; quality_report.py
# aggregates. Runs at nice 10 so foreground work keeps priority on the
# 1-core host.
set -u
cd /root/repo
CAP="--scale --tokenizer subword --mlm-epochs 3 --mine-rounds 2 \
  --reranker-vocab subword --reranker-keep-best --rerank-candidates wrrf"

for s in 0 1 2; do
  name=capstone_bt2_s$s
  [ -s bench_results/$name.json ] && { echo "skip $name (exists)"; continue; }
  nice -n 10 python tools/eval_quality.py $CAP --rerankers all \
    --reranker-embed-init encoder --seed $s \
    --load-encoder bench_results/capstone_bt_s$s/encoder_ckpt \
    --output bench_results/$name \
    > bench_results/$name.json 2> bench_results/$name.log
  echo "done $name rc=$?"
done

for s in 0 1 2; do
  name=ce_scale_s$s
  [ -s bench_results/$name.json ] && { echo "skip $name (exists)"; continue; }
  nice -n 10 python tools/eval_quality.py $CAP --rerankers cross_encoder \
    --reranker-embed-init encoder_full --reranker-epochs 12 --seed $s \
    --load-encoder bench_results/capstone_bt_s$s/encoder_ckpt \
    --output bench_results/$name \
    > bench_results/$name.json 2> bench_results/$name.log
  echo "done $name rc=$?"
done
echo ALL_DONE_R4
