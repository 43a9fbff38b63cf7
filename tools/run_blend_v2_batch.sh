#!/bin/bash
# Re-run the capstone + validation-tuned blend at all 3 seeds under ONE
# protocol (blend beta tuned on the fresh seed+3000 split, disjoint from
# the alpha split — fc7ad29), reusing each seed's saved encoder.
set -u
cd /root/repo
CAP="--scale --tokenizer subword --mlm-epochs 3 --mine-rounds 2 \
  --reranker-vocab subword --reranker-embed-init encoder \
  --reranker-keep-best --rerank-candidates wrrf"

for s in 0 1 2; do
  name=capstone_bt2_s$s
  python tools/eval_quality.py $CAP --rerankers all --seed $s \
    --load-encoder bench_results/capstone_bt_s$s/encoder_ckpt \
    --output bench_results/$name \
    > bench_results/$name.json 2> bench_results/$name.log
  echo "done $name rc=$?"
done
echo ALL_DONE_V2
