#!/bin/bash
set -x
cd /root/repo
# wait for the current league evals to finish
while ! grep -q LEAGUE_DONE results/league/run.log 2>/dev/null; do sleep 20; done
POOL=results/level3_mastery.msgpack,results/seedsweep/best.msgpack,results/captrain/w64_s4.msgpack,results/level3_selfplay.msgpack
# L-C: minimal-perturbation league — tiny constant lr, frozen pool
python scripts/train_race.py --config configs/level3.yaml --rowfast --compete \
  --n_drones 4 --n_envs 1024 --n_steps 64 --iters 2000 --end_after_gate 0 \
  --lr 3e-5 --elim_penalty 3 --league $POOL \
  --init results/level3_mastery.msgpack --save_every 500 \
  --out results/league/lc.msgpack > results/league/lc.log 2>&1
for ck in results/league/lc_it500 results/league/lc_it1000 results/league/lc_it1500 results/league/lc; do
  python - <<PYEOF >> results/league/evals.jsonl 2>> results/league/eval.log
import json, importlib.util
s = importlib.util.spec_from_file_location('er', 'scripts/eval_race.py')
er = importlib.util.module_from_spec(s); s.loader.exec_module(er)
out = er.evaluate('$ck.msgpack', 'level3', 128, n_drones=4)
out['checkpoint'] = '$ck'
print(json.dumps(out))
PYEOF
done
echo LC_DONE
# pixels stage 1: getting_started gate-2 curriculum, 64x48 @ 110 deg,
# velocity-gimbal camera (round-5 visibility study)
mkdir -p results/px5
python scripts/train_race.py --config configs/getting_started.yaml --obs rgb \
  --img 64x48 --fov 110 --camera velocity --n_envs 512 --n_steps 64 \
  --iters 700 --end_after_gate 2 --save_every 350 --lr_decay \
  --out results/px5/g2.msgpack > results/px5/g2.log 2>&1
echo PX_G2_DONE
