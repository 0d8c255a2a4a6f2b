"""Evaluate a trained race policy: gates passed, completion rate, lap time.

Deterministic (mean-action) rollouts over a batch of envs on the row-fast
path — the counterpart of the reference's scripts/sim.py episode loop with
an RLController (reference user_controller/RLController.py:39-56 +
sim.py:63-108), vectorized.

Usage:
  python scripts/eval_race.py --policy results/gs_full_policy.msgpack \
      --config getting_started [--envs 128] [--stochastic]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def evaluate(policy_path, config_name="getting_started", n_envs=128,
             stochastic=False, seed=42, platform=None, n_drones=1):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if platform:
        jax.config.update("jax_platforms", platform)

    from gym_pybullet_adrp_tpu.envs import race as race_mod
    from gym_pybullet_adrp_tpu.envs import race_rl_rowfast
    from gym_pybullet_adrp_tpu.models.policy import ActorCritic, sample_action
    from gym_pybullet_adrp_tpu.rl import checkpoint as ckpt
    from gym_pybullet_adrp_tpu.utils.config import load_config
    from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode

    cfg = load_config(config_name)
    mode = RaceMode.COMPETE if n_drones > 1 else RaceMode.COMPARE
    spec = race_mod.RaceSpec.from_config(cfg, n_drones, mode, Physics.PYB)
    track = race_mod.track_from_config(cfg, n_drones)
    B = n_envs
    interpret = jax.devices()[0].platform == "cpu"
    # per-drone rewards expose gate passes (+5) and finish (+10) as
    # reward edges — the only pre-autoreset signal that survives a done
    # step (the packed state is already reset when step returns)
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=interpret, per_drone_reward=True
    )
    net = ActorCritic(act_dim=4)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros((1, spec.obs_size)))
    params = ckpt.load_policy(policy_path, tmpl)
    G = spec.num_gates
    N = n_drones
    ep_steps = int(spec.episode_len_sec * spec.pyb_freq / spec.steps_per_ctrl)

    st = reset(jax.random.PRNGKey(seed))
    obs0 = reset.initial_obs(st)

    @jax.jit
    def roll(st, obs, key):
        def body(carry, _):
            st, obs, k = carry
            flat = obs.reshape(B * N, -1) if N > 1 else obs
            mean, log_std, _ = net.apply(params, flat)
            if stochastic:
                k, ka = jax.random.split(k)
                act, _ = sample_action(ka, mean, log_std)
            else:
                act = mean
            act = jnp.clip(act, -1.0, 1.0)
            act = act.reshape(B, N, 4) if N > 1 else act
            k, ks = jax.random.split(k)
            st, obs, rew, done = step(st, act, ks)
            return (st, obs, k), (rew.reshape(B, N), done)

        (st, obs, k), (rews, dones) = jax.lax.scan(
            body, (st, obs, key), None, length=ep_steps
        )
        return rews, dones

    rews, dones = roll(st, obs0, jax.random.PRNGKey(seed + 1))
    rews = np.asarray(rews)          # (T, B, N)
    dones = np.asarray(dones)        # (T, B)

    # host-side first-episode accounting from reward edges: +5 per gate
    # pass, +10 finish (the final pass lands as ~+15, 5 + 10 together);
    # dense progress per step is bounded well below 2.5. The packed state
    # is already autoreset when step returns, so reward edges are the only
    # pre-done signal (tested: tests/test_learned_racing.py)
    first_done = np.where(
        dones.any(axis=0), dones.argmax(axis=0), ep_steps - 1
    )                                 # (B,) inclusive last step of episode 1
    t_idx = np.arange(ep_steps)[:, None, None]
    live = t_idx <= first_done[None, :, None]
    # finish fires one env step AFTER the final pass (the finished flag is
    # read at the next tail evaluation) carrying +10 plus a wrap-around +5
    # (shape_gate_id mod G, the reference wrapper's lap semantics) — so
    # finish steps are >= 12.5 and are NOT gate passes themselves
    passes = (rews >= 2.5) & (rews < 12.5) & live
    gates = passes.sum(axis=0)                  # (B, N)
    fin_event = (rews >= 12.5) & live           # (T, B, N)
    has_fin = fin_event.any(axis=0)             # (B, N)
    first_fin = np.where(
        has_fin, fin_event.argmax(axis=0), ep_steps + 1
    )                                           # (B, N)
    completed = has_fin.all(axis=1)             # (B,)
    # lap time = when the LAST drone of the env finished
    fin_step = first_fin.max(axis=1)
    lap_t = (fin_step + 1) * spec.steps_per_ctrl / spec.pyb_freq
    hist = {g: int((gates.min(axis=1) == g).sum()) for g in range(G + 1)}
    return {
        "gates_hist": hist,
        "completion_rate": float(completed.mean()),
        "mean_gates": float(gates.mean()),
        "mean_lap_time": float(lap_t[completed].mean()) if completed.any()
        else None,
        "best_lap_time": float(lap_t[completed].min()) if completed.any()
        else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", default="results/gs_full_policy.msgpack")
    ap.add_argument("--config", default="getting_started")
    ap.add_argument("--envs", type=int, default=128)
    ap.add_argument("--n_drones", type=int, default=1)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    out = evaluate(args.policy, args.config, args.envs, args.stochastic,
                   args.seed, args.platform, args.n_drones)
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
