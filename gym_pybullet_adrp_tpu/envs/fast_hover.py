"""Speed-of-light hover env: packed layout + Pallas fused physics.

The throughput-critical configuration of the RL hover env (single CF2X
drone, Physics.PYB, RPM actions, 240/30 Hz) rebuilt around the fused
Pallas control-step kernel (ops/pallas_step.py): state lives in channel-
major (13, B/128, 128) layout for the whole rollout, physics runs as one
VMEM-resident kernel per control step, and reward/termination/truncation/
autoreset (HoverAviary semantics, reference envs/HoverAviary.py:68-117) are
cheap row ops on the packed block.

Relative to envs/rl.py this omits the action-history block of the
observation (the physics, reward and episode logic are identical); use it
for maximum-throughput rollouts and bench.py --impl pallas.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.models.drone import DroneParams
from gym_pybullet_adrp_tpu.ops import pallas_step

LANE = pallas_step.LANE


class FastHoverState(NamedTuple):
    packed: jnp.ndarray        # (13, B/128, 128)
    step_count: jnp.ndarray    # (B/128, 128) int32, ctrl steps this episode


def reset_packed(init_xyz, B, dtype=jnp.float32) -> FastHoverState:
    T = B // LANE
    st = np.zeros((pallas_step.N_CHANNELS, T, LANE), dtype=np.float32)
    st[0:3] = np.asarray(init_xyz, dtype=np.float32)[:, None, None]
    st[6] = 1.0  # quat w
    return FastHoverState(
        packed=jnp.asarray(st, dtype=dtype),
        step_count=jnp.zeros((T, LANE), dtype=jnp.int32),
    )


def make_step(params: DroneParams, B: int, ctrl_freq: int = 30,
              pyb_freq: int = 240, episode_len_sec: float = 8.0,
              target=(0.0, 0.0, 1.0), interpret: bool = False):
    """Build step(state, action) -> (state, obs12, reward, done).

    action: (4, B/128, 128) in [-1, 1] (RPM action type:
    rpm = HOVER_RPM*(1+0.05a), reference BaseRLAviary:192).
    """
    n_sub = pyb_freq // ctrl_freq
    dt = 1.0 / pyb_freq
    hover = float(np.asarray(params.hover_rpm))
    tx, ty, tz = target
    max_steps = int(episode_len_sec * ctrl_freq)
    reset_template = reset_packed(np.array([tx, ty, 0.1125]), B)

    def step(state: FastHoverState, action):
        rpm = hover * (1.0 + 0.05 * action)
        packed = pallas_step.ctrl_step_packed(
            params, state.packed, rpm, n_sub, dt, interpret=interpret
        )
        px, py, pz = packed[0], packed[1], packed[2]
        qx, qy, qz, qw = packed[3], packed[4], packed[5], packed[6]

        # roll/pitch for the tilt truncation (reference HoverAviary:110-112)
        sinr = 2.0 * (qw * qx + qy * qz)
        cosr = 1.0 - 2.0 * (qx * qx + qy * qy)
        roll = jnp.arctan2(sinr, cosr)
        pitch = jnp.arcsin(jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0))

        err2 = (px - tx) ** 2 + (py - ty) ** 2 + (pz - tz) ** 2
        err = jnp.sqrt(err2)
        reward = jnp.maximum(0.0, 2.0 - err2 * err2)
        terminated = err < 1e-4
        step_count = state.step_count + 1
        truncated = (
            (jnp.abs(px) > 1.5) | (jnp.abs(py) > 1.5) | (pz > 2.0)
            | (jnp.abs(roll) > 0.4) | (jnp.abs(pitch) > 0.4)
            | (step_count > max_steps)
        )
        done = terminated | truncated

        packed = jnp.where(done[None], reset_template.packed, packed)
        step_count = jnp.where(done, 0, step_count)

        # post-reset attitude is identity, so zero the angles for done envs
        yaw = jnp.arctan2(
            2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz)
        )
        zero = jnp.zeros_like(roll)
        obs12 = jnp.stack(
            [packed[0], packed[1], packed[2],
             jnp.where(done, zero, roll),
             jnp.where(done, zero, pitch),
             jnp.where(done, zero, yaw),
             packed[7], packed[8], packed[9], packed[10], packed[11],
             packed[12]],
            axis=0,
        )
        return FastHoverState(packed=packed, step_count=step_count), (
            obs12, reward, done,
        )

    return step


def ppo_adapter(params: DroneParams, n_envs: int, ctrl_freq: int = 30,
                pyb_freq: int = 240, interpret: bool = False):
    """EnvAdapter (rl/ppo.py) over the fused Pallas path.

    Observation is the 12-dim kinematic vector (no action-history block);
    actions are 4-dim RPM type. Drop-in for make_ppo_core when maximum
    training throughput matters more than exact obs parity.
    """
    from gym_pybullet_adrp_tpu.rl.ppo import EnvAdapter

    T = n_envs // LANE
    step_fn = make_step(
        params, n_envs, ctrl_freq=ctrl_freq, pyb_freq=pyb_freq,
        interpret=interpret,
    )

    def batched_reset(key):
        state = reset_packed(np.array([0.0, 0.0, 0.1125]), n_envs)
        obs0 = jnp.zeros((12, T, LANE), dtype=state.packed.dtype)
        obs0 = obs0.at[2].set(0.1125)
        return state, _obs_to_batch(obs0)

    def _obs_to_batch(obs12):
        # (12, T, 128) -> (n_envs, 12)
        return obs12.reshape(12, n_envs).T

    def step(state, action, key):
        act_packed = action.T.reshape(4, T, LANE)
        state, (obs12, reward, done) = step_fn(state, act_packed)
        return (
            state,
            _obs_to_batch(obs12),
            reward.reshape(n_envs),
            done.reshape(n_envs),
        )

    return EnvAdapter(
        batched_reset=batched_reset, step=step, obs_dim=12, act_dim=4
    )
