"""Evaluate a camera-based (pixels-to-actions) race policy.

Deterministic mean-action rollouts of a CnnActorCritic over the general
race path with in-graph ray-cast frames (envs/race_rl.compute_rgb_obs) —
the pixels counterpart of scripts/eval_race.py. Gates/completion read
from the pre-autoreset telemetry of batched_rl_race_step.

    python scripts/eval_race_rgb.py --policy results/px5/full.msgpack \
        --config getting_started --img 64x48 --fov 110 --camera velocity
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def evaluate(policy_path, config_name="getting_started", n_envs=128,
             img="64x48", fov=110.0, camera="velocity", seed=42,
             platform=None, max_steps=None, stochastic=False):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if platform:
        jax.config.update("jax_platforms", platform)

    from gym_pybullet_adrp_tpu.envs import race as race_mod, race_rl
    from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic
    from gym_pybullet_adrp_tpu.rl import checkpoint as ckpt
    from gym_pybullet_adrp_tpu.utils.config import load_config
    from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode

    cfg = load_config(config_name)
    spec = race_mod.RaceSpec.from_config(
        cfg, 1, RaceMode.COMPARE, Physics.PYB
    )
    track = race_mod.track_from_config(cfg, 1)
    W, H = (int(x) for x in img.split("x"))
    net = CnnActorCritic(act_dim=4, img_h=H, img_w=W)
    tmpl = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H * W * 3), jnp.float32)
    )
    params = ckpt.load_policy(policy_path, tmpl)

    B = n_envs
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    st = jax.vmap(lambda k: race_rl.rl_race_reset(spec, track, k))(keys)
    rgb = jax.vmap(
        lambda s: race_rl.compute_rgb_obs(
            spec, s, width=W, height=H, fov_deg=fov, camera=camera
        )
    )

    @jax.jit
    def roll(st, key):
        obs0 = rgb(st)

        def body(carry, t):
            st, obs, key, best_gate, done_seen, fin_step = carry
            t = t.astype(jnp.int32)       # x64-safe scan carry
            mean, log_std, _ = net.apply(params, obs)
            key, k_act = jax.random.split(key)
            act = mean
            if stochastic:
                act = mean + jnp.exp(log_std) * jax.random.normal(
                    k_act, mean.shape
                )
            a = jnp.clip(act, -1, 1).reshape(B, 1, 4)
            key, k = jax.random.split(key)
            ks = jax.random.split(k, B)
            st, _, _, te, tr, telem = race_rl.batched_rl_race_step(
                spec, track, st, a, ks, telemetry=True
            )
            gate = telem["current_gate"][:, 0]
            fin = telem["finished"][:, 0] > 0
            live = ~done_seen
            best_gate = jnp.maximum(best_gate, jnp.where(live, gate, 0))
            fin_step = jnp.where(
                live & fin & (fin_step < 0), t, fin_step
            )
            done_seen = done_seen | te | tr
            obs = rgb(st)
            return (st, obs, key, best_gate, done_seen, fin_step), None

        T = max_steps or int(
            spec.episode_len_sec * spec.ctrl_freq
        )
        carry = (
            st, obs0, key, jnp.zeros(B, jnp.int32),
            jnp.zeros(B, bool), jnp.full(B, -1, jnp.int32),
        )
        (st, _, _, best_gate, _, fin_step), _ = jax.lax.scan(
            body, carry, jnp.arange(T)
        )
        return best_gate, fin_step

    best_gate, fin_step = roll(st, jax.random.PRNGKey(1))
    best_gate = np.asarray(best_gate)
    fin_step = np.asarray(fin_step)
    G = spec.num_gates
    done = best_gate >= G
    laps = fin_step[fin_step >= 0] / spec.ctrl_freq
    out = {
        "gates_hist": {
            str(g): int((best_gate == g).sum()) for g in range(G + 1)
        },
        "completion_rate": float(done.mean()),
        "mean_gates": float(best_gate.mean()),
        "mean_lap_time": float(laps.mean()) if laps.size else None,
        "img": img, "fov": fov, "camera": camera,
    }
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--policy", required=True)
    ap.add_argument("--config", default="getting_started")
    ap.add_argument("--envs", type=int, default=128)
    ap.add_argument("--img", default="64x48")
    ap.add_argument("--fov", type=float, default=110.0)
    ap.add_argument("--camera", default="velocity")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--stochastic", action="store_true")
    args = ap.parse_args()
    out = evaluate(args.policy, args.config, args.envs, args.img,
                   args.fov, args.camera, platform=args.platform,
                   max_steps=args.max_steps, stochastic=args.stochastic)
    out["stochastic"] = args.stochastic
    print(json.dumps(out))
