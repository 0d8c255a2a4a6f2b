#!/bin/bash
set -x
cd /root/repo
# resume the full-track stage from the it500 snapshot (hang recovery);
# remaining ~500 iters of the original 1000
python scripts/train_race.py --config configs/getting_started.yaml --obs rgb \
  --img 64x48 --fov 110 --camera velocity --n_envs 512 --n_steps 64 \
  --iters 500 --end_after_gate 0 --save_every 250 --lr_decay \
  --init results/px5/full_it500.msgpack \
  --out results/px5/full.msgpack > results/px5/full2.log 2>&1
for ck in results/px5/full_it250 results/px5/full_it500 results/px5/full; do
  python scripts/eval_race_rgb.py --policy $ck.msgpack >> results/px5/evals.jsonl 2>> results/px5/eval.log
done
python scripts/eval_race_rgb.py --policy results/px5/full.msgpack --stochastic >> results/px5/evals.jsonl 2>> results/px5/eval.log
echo PX_ALL_DONE
