"""Evaluate a trained race policy: gates passed, completion rate, lap time.

Deterministic (mean-action) rollouts over a batch of envs on the row-fast
path — the counterpart of the reference's scripts/sim.py episode loop with
an RLController (reference user_controller/RLController.py:39-56 +
sim.py:63-108), vectorized.

Race accounting is read DIRECTLY from the fused kernel's pre-autoreset
telemetry block (current_gate / finished / eliminated rows emitted before
the same-step reset wipes them — ops/pallas_race_step.py telemetry=True),
not decoded from reward edges: gates passed per drone is the final
``current_gate``, completion is the final ``finished`` flag, lap time is
the first step whose ``finished`` row is set.

Usage:
  python scripts/eval_race.py --policy results/gs_full_policy.msgpack \
      --config getting_started [--envs 128] [--n_drones 4] [--stochastic]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def evaluate(policy_path, config_name="getting_started", n_envs=128,
             stochastic=False, seed=42, platform=None, n_drones=1,
             hidden=(64, 64)):
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
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=interpret, per_drone_reward=True,
        telemetry=True,
    )
    net = ActorCritic(act_dim=4, hidden=tuple(hidden))
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros((1, spec.obs_size)))
    params = ckpt.load_policy(policy_path, tmpl)
    G = spec.num_gates
    N = n_drones
    ep_steps = int(spec.episode_len_sec * spec.pyb_freq / spec.steps_per_ctrl)

    st = reset(jax.random.PRNGKey(seed))
    obs0 = reset.initial_obs(st)

    # params are an ARGUMENT (not a closure constant): evaluating a new
    # artifact reuses the compiled roll from the persistent cache
    @jax.jit
    def roll(params, st, obs, key):
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
            st, obs, rew, done, info = step(st, act, ks)
            cg = info["current_gate"].reshape(B, N)
            fin = info["finished"].reshape(B, N)
            el = info["eliminated"].reshape(B, N)
            return (st, obs, k), (cg, fin, el, done)

        (st, obs, k), (cgs, fins, els, dones) = jax.lax.scan(
            body, (st, obs, key), None, length=ep_steps
        )
        return cgs, fins, els, dones

    cgs, fins, els, dones = roll(params, st, obs0,
                                 jax.random.PRNGKey(seed + 1))
    cgs = np.asarray(cgs)            # (T, B, N) pre-reset gates passed
    fins = np.asarray(fins) > 0.5    # (T, B, N) pre-reset finished flags
    els = np.asarray(els) > 0.5      # (T, B, N) pre-reset eliminated flags
    dones = np.asarray(dones)        # (T, B)

    # first-episode accounting, directly from the pre-autoreset telemetry:
    # episode 1 of env b ends (inclusive) at its first done step, or runs
    # to the rollout horizon
    first_done = np.where(
        dones.any(axis=0), dones.argmax(axis=0), ep_steps - 1
    )                                 # (B,)
    env_i = np.arange(B)
    gates = cgs[first_done, env_i, :]           # (B, N) final gates passed
    has_fin = fins[first_done, env_i, :]        # (B, N) finished the lap
    t_idx = np.arange(ep_steps)[:, None, None]
    live = t_idx <= first_done[None, :, None]
    fin_event = fins & live                     # sticky flag, first set = lap
    first_fin = np.where(
        fin_event.any(axis=0), fin_event.argmax(axis=0), ep_steps + 1
    )                                           # (B, N)
    completed = has_fin.all(axis=1)             # (B,) every drone finished
    # lap time = when the LAST drone of the env finished
    fin_step = first_fin.max(axis=1)
    lap_t = (fin_step + 1) * spec.steps_per_ctrl / spec.pyb_freq
    hist = {g: int((gates.min(axis=1) == g).sum()) for g in range(G + 1)}
    elim = els[first_done, env_i, :]            # (B, N) eliminated flags
    return {
        "gates_hist": hist,
        "completion_rate": float(completed.mean()),
        "per_drone_completion_rate": float(has_fin.mean()),
        "per_drone_elimination_rate": float(elim.mean()),
        # mean gates passed by drones that were eliminated (where did
        # eliminations happen on the track?)
        "mean_gates_eliminated": (
            float(gates[elim].mean()) if elim.any() else None
        ),
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
    ap.add_argument("--hidden", default="64,64",
                    help="ActorCritic tower widths of the artifact")
    args = ap.parse_args()
    out = evaluate(args.policy, args.config, args.envs, args.stochastic,
                   args.seed, args.platform, args.n_drones,
                   hidden=tuple(int(x) for x in args.hidden.split(",")))
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
