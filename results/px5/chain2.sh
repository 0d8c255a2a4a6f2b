#!/bin/bash
set -x
cd /root/repo
python scripts/train_race.py --config configs/getting_started.yaml --obs rgb \
  --img 64x48 --fov 110 --camera velocity --n_envs 512 --n_steps 64 \
  --iters 500 --end_after_gate 3 --save_every 250 --lr_decay \
  --init results/px5/g2.msgpack \
  --out results/px5/g3.msgpack > results/px5/g3.log 2>&1
python scripts/eval_race_rgb.py --policy results/px5/g3.msgpack >> results/px5/evals.jsonl 2>> results/px5/eval.log
python scripts/train_race.py --config configs/getting_started.yaml --obs rgb \
  --img 64x48 --fov 110 --camera velocity --n_envs 512 --n_steps 64 \
  --iters 1000 --end_after_gate 0 --save_every 250 --lr_decay \
  --init results/px5/g3.msgpack \
  --out results/px5/full.msgpack > results/px5/full.log 2>&1
for ck in results/px5/full_it250 results/px5/full_it500 results/px5/full_it750 results/px5/full; do
  python scripts/eval_race_rgb.py --policy $ck.msgpack >> results/px5/evals.jsonl 2>> results/px5/eval.log
done
echo PX_ALL_DONE
