#!/bin/bash
# Round-3 quality batch: capstone + validation-tuned blend (3 seeds), then
# margin-MSE distillation probes at seed 0 (reusing the capstone encoder).
# Strictly sequential — the box has ONE host core (CLAUDE.md).
set -u
cd /root/repo
CAP="--scale --tokenizer subword --mlm-epochs 3 --mine-rounds 2 \
  --reranker-vocab subword --reranker-embed-init encoder \
  --reranker-keep-best --rerank-candidates wrrf"

for s in 0 1 2; do
  name=capstone_bt_s$s
  python tools/eval_quality.py $CAP --rerankers all --seed $s \
    --output bench_results/$name \
    > bench_results/$name.json 2> bench_results/$name.log
  echo "done $name rc=$?"
done

ENC=bench_results/capstone_bt_s0/encoder_ckpt
for spec in "0.3:5" "0.7:5" "0.3:1" "1.0:5"; do
  w=${spec%%:*}; sc=${spec##*:}
  name=distill_probe_w${w}_sc${sc}_s0
  python tools/eval_quality.py $CAP --rerankers match_lstm,conv_knrm \
    --seed 0 --load-encoder $ENC \
    --reranker-distill $w --reranker-distill-scale $sc \
    --output bench_results/$name \
    > bench_results/$name.json 2> bench_results/$name.log
  echo "done $name rc=$?"
done
echo ALL_DONE
