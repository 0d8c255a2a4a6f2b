#!/bin/bash
# League study (VERDICT r5 item 2): sequential TPU jobs — never concurrent.
# L-A: frozen diverse pool (mastery 52.7%, seedsweep best 48.4%,
#      capacity-study w64_s4 30.3%, round-2 selfplay) — the learner
#      optimizes against the opponent MIXTURE.
# L-B: past-selves league — slot 0 refreshed with the live learner every
#      200 iters (AlphaStar-style), rest of the pool frozen.
# Both: shipped mastery recipe (lr 1e-4 linear decay, elim_penalty 3),
# learner warm-started from the mastery artifact, checkpoints every 500.
set -x
cd /root/repo
POOL=results/level3_mastery.msgpack,results/seedsweep/best.msgpack,results/captrain/w64_s4.msgpack,results/level3_selfplay.msgpack
python scripts/train_race.py --config configs/level3.yaml --rowfast --compete \
  --n_drones 4 --n_envs 1024 --n_steps 64 --iters 2000 --end_after_gate 0 \
  --lr 1e-4 --lr_decay --elim_penalty 3 --league $POOL \
  --init results/level3_mastery.msgpack --save_every 500 \
  --out results/league/la.msgpack > results/league/la.log 2>&1
python scripts/train_race.py --config configs/level3.yaml --rowfast --compete \
  --n_drones 4 --n_envs 1024 --n_steps 64 --iters 2000 --end_after_gate 0 \
  --lr 1e-4 --lr_decay --elim_penalty 3 --league $POOL --league_refresh 200 \
  --init results/level3_mastery.msgpack --save_every 500 \
  --out results/league/lb.msgpack > results/league/lb.log 2>&1
for ck in results/league/la_it500 results/league/la_it1000 results/league/la_it1500 results/league/la \
          results/league/lb_it500 results/league/lb_it1000 results/league/lb_it1500 results/league/lb; do
  python - <<PYEOF >> results/league/evals.jsonl 2>> results/league/eval.log
import json, importlib.util
s = importlib.util.spec_from_file_location('er', 'scripts/eval_race.py')
er = importlib.util.module_from_spec(s); s.loader.exec_module(er)
out = er.evaluate('$ck.msgpack', 'level3', 128, n_drones=4)
out['checkpoint'] = '$ck'
print(json.dumps(out))
PYEOF
done
echo LEAGUE_DONE
