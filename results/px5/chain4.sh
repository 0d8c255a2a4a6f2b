#!/bin/bash
set -x
cd /root/repo
python scripts/train_race.py --config configs/getting_started.yaml --obs rgb \
  --img 64x48 --fov 110 --camera velocity --n_envs 512 --n_steps 64 \
  --iters 300 --end_after_gate 0 --save_every 150 --lr 1e-4 --lr_decay \
  --init results/px5/full.msgpack \
  --out results/px5/full_b2.msgpack > results/px5/full_b2.log 2>&1
for ck in results/px5/full_b2_it150 results/px5/full_b2; do
  python scripts/eval_race_rgb.py --policy $ck.msgpack >> results/px5/evals.jsonl 2>> results/px5/eval.log
done
echo PX_B2_DONE
