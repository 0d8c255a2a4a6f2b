"""Hover-PPO return ceiling: the reference threshold is unattainable.

The reference's stop-training callback waits for a deterministic eval
return of 474.15 on HoverAviary with ONE_D_RPM actions (reference
examples/learn.py:78-79). VALIDATION.md argues that threshold sits ABOVE
what the environment's own physics allows; this script is that argument as
reproducible code (VERDICT r1 item 7):

1. **Analytic upper bound** — ONE_D_RPM limits rpm to HOVER_RPM*(1±0.05),
   i.e. net vertical acceleration in [-0.0975 g, +0.1025 g] (reference
   BaseRLAviary.py:192 action map, thrust ~ rpm^2). Ignoring drag and
   attitude dynamics (both only hurt), the best possible reward is the
   8 s * 30 Hz sum of max(0, 2 - e^4) along the time-optimal bang-bang
   climb from z0 = 0.1125 to the z = 1 target (reference
   HoverAviary.py:68-79 reward).
2. **Probe lower bound** — a saturated PD controller (bang-bang while far,
   P-hold near the target) swept over a 32x32 gain grid, every candidate a
   vmapped env instance, on the REAL environment. Best measured return.

The learner's parity claim (VALIDATION §3): PPO reaches ~471.9, i.e.
>= 99.9% of the probe, while the 474.15 threshold exceeds even the
frictionless upper bound — SB3 on the reference would run its full 1e7
steps without ever triggering the stop callback.

    python examples/hover_ceiling.py [--grid 32]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def analytic_upper_bound(z0=0.1125, zt=1.0, ep_sec=8.0, ctrl_hz=30,
                         g=9.8, up=0.1025):
    """Rigorous frictionless bound: at time t the error can't be smaller
    than the target distance minus the distance coverable under pure max
    acceleration (no braking requirement — a genuine per-step bound, not a
    specific trajectory). Drag and attitude dynamics only lower it."""
    a_up = up * g
    d = zt - z0
    dt = 1.0 / ctrl_hz
    # the episode truncates at the first step whose time EXCEEDS ep_sec
    # (reference HoverAviary._computeTruncated:100-117), and that step's
    # reward still counts — so n = ep_sec*ctrl_hz + 1 rewarded steps
    n = int(ep_sec * ctrl_hz) + 1
    t = np.arange(1, n + 1) * dt
    e_min = np.maximum(0.0, d - 0.5 * a_up * t * t)
    return float(np.sum(np.maximum(0.0, 2.0 - e_min ** 4)))


def probe_best_return(grid=32, n_steps=None, platform=None):
    """Best saturated-PD return over a gain grid, real env, one vmap."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if platform:
        jax.config.update("jax_platforms", platform)

    from gym_pybullet_adrp_tpu.envs import rl as rlenv
    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.rl.ppo import PPOConfig, hover_adapter
    from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel

    n_envs = grid * grid
    kp = jnp.repeat(jnp.linspace(1.0, 40.0, grid), grid)
    kd = jnp.tile(jnp.linspace(0.0, 20.0, grid), grid)

    rl_cfg = rlenv.RLConfig(
        aviary=AviaryConfig(ctrl_freq=30), act_type=ActionType.ONE_D_RPM
    )
    params = drone_params(DroneModel.CF2X)
    cfg = PPOConfig(n_envs=n_envs)
    adapter = hover_adapter(
        cfg, rl_cfg, params,
        np.array([[0.0, 0.0, 0.1125]]), np.zeros((1, 3)),
    )
    n_steps = n_steps or (8 * 30 + 2)

    @jax.jit
    def rollout():
        env_state, obs = adapter.batched_reset(jax.random.PRNGKey(0))

        def body(carry, _):
            env_state, obs, ret, done_seen = carry
            z, vz = obs[:, 2], obs[:, 8]
            a = jnp.clip(kp * (1.0 - z) - kd * vz, -1.0, 1.0)[:, None]
            env_state, obs, reward, done = adapter.step(
                env_state, a, jax.random.PRNGKey(0)
            )
            ret = ret + jnp.where(done_seen, 0.0, reward)
            done_seen = done_seen | done
            return (env_state, obs, ret, done_seen), None

        carry = (env_state, obs, jnp.zeros(n_envs), jnp.zeros(n_envs, bool))
        (_, _, ret, _), _ = jax.lax.scan(body, carry, None, length=n_steps)
        return ret

    rets = np.asarray(rollout())
    i = int(np.argmax(rets))
    return float(rets[i]), float(kp[i]), float(kd[i])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    ub = analytic_upper_bound()
    best, kp, kd = probe_best_return(args.grid, platform=args.platform)
    print(f"analytic upper bound (frictionless): {ub:.2f}")
    print(f"probe best return (kp={kp:.2f}, kd={kd:.2f}): {best:.2f}")
    print(f"reference stop threshold            : 474.15")
    print(f"threshold attainable: {474.15 <= ub}")


if __name__ == "__main__":
    main()
