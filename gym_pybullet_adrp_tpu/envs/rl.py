"""Functional RL envs: BaseRLAviary mechanics + Hover / MultiHover tasks.

TPU-native re-design of the reference's RL stack
(reference envs/BaseRLAviary.py, HoverAviary.py, MultiHoverAviary.py):

* the per-drone ``DSLPIDControl`` objects (BaseRLAviary.py:73-78) become a
  vmapped pure controller folded into the jitted step;
* the 0.5 s ``deque`` action buffer (BaseRLAviary.py:66-67) becomes a rolled
  array carried in the state pytree;
* reward/termination/truncation are pure functions of the state.

``rl_step`` is one control step for one env; batch it with ``jax.vmap`` and
wrap with ``autoreset_step`` for RL training (thousands of envs per chip).
"""

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import core
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig, CoreState
from gym_pybullet_adrp_tpu.control import dslpid
from gym_pybullet_adrp_tpu.models.drone import DroneParams
from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel, ObservationType


def action_size(act: ActionType) -> int:
    """Reference BaseRLAviary._actionSpace:141-149."""
    if act in (ActionType.RPM, ActionType.VEL):
        return 4
    if act == ActionType.PID:
        return 3
    if act in (ActionType.ONE_D_RPM, ActionType.ONE_D_PID):
        return 1
    raise ValueError(f"unsupported ActionType {act}")


@dataclass(frozen=True)
class RLConfig:
    """Static RL env configuration."""

    aviary: AviaryConfig = field(
        default_factory=lambda: AviaryConfig(ctrl_freq=30)
    )
    obs_type: ObservationType = ObservationType.KIN
    act_type: ActionType = ActionType.RPM
    episode_len_sec: float = 8.0
    # task selects reward/termination: "hover" | "multihover" | None
    task: Optional[str] = "hover"

    @property
    def action_buffer_size(self) -> int:
        # reference BaseRLAviary.py:66
        return int(self.aviary.ctrl_freq // 2)

    @property
    def act_size(self) -> int:
        return action_size(self.act_type)

    @property
    def obs_size(self) -> int:
        return 12 + self.action_buffer_size * self.act_size


class RLState(NamedTuple):
    """Dynamic state of one RL env (pytree)."""

    core: CoreState
    ctrl: dslpid.PIDState            # per-drone (N, 3) leaves
    action_buffer: jnp.ndarray       # (BUF, N, A), index 0 = oldest
    target_pos: jnp.ndarray          # (N, 3) task target


def hover_target(cfg: RLConfig, init_xyzs) -> jnp.ndarray:
    """HoverAviary: fixed [0,0,1] (reference HoverAviary.py:51);
    MultiHover: INIT_XYZ + [0,0,1/(i+1)] (reference MultiHoverAviary.py:71)."""
    n = cfg.aviary.num_drones
    init = jnp.asarray(init_xyzs)
    if cfg.task == "multihover":
        off = np.stack(
            [np.zeros(n), np.zeros(n), 1.0 / (np.arange(n) + 1)], axis=-1
        )
        return init + jnp.asarray(off, dtype=init.dtype)
    return jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=init.dtype), (n, 3)
    )


def rl_reset(cfg: RLConfig, init_xyzs, init_rpys, dtype=jnp.float32) -> RLState:
    cstate = core.core_reset(cfg.aviary, init_xyzs, init_rpys, dtype=dtype)
    n = cfg.aviary.num_drones
    return RLState(
        core=cstate,
        ctrl=dslpid.init_state((n,), dtype=dtype),
        action_buffer=jnp.zeros(
            (cfg.action_buffer_size, n, cfg.act_size), dtype=dtype
        ),
        target_pos=hover_target(cfg, jnp.asarray(init_xyzs, dtype=dtype)),
    )


def preprocess_action(cfg: RLConfig, params: DroneParams, state: RLState,
                      action) -> Tuple[jnp.ndarray, dslpid.PIDState]:
    """Action (N, A) in [-1, 1] -> motor rpm (N, 4).

    Faithful to BaseRLAviary._preprocessAction:160-239 per action type,
    vectorized over drones.
    """
    act = cfg.act_type
    sv = core.state_vector(state.core)
    pos, q = sv[:, 0:3], sv[:, 3:7]
    vel = sv[:, 10:13]
    yaw = sv[:, 9]
    ctl = state.ctrl
    dt = cfg.aviary.ctrl_timestep

    if act == ActionType.RPM:
        rpm = params.hover_rpm * (1.0 + 0.05 * action)
        return rpm, ctl
    if act == ActionType.ONE_D_RPM:
        rpm = jnp.repeat(params.hover_rpm * (1.0 + 0.05 * action), 4, axis=-1)
        return rpm, ctl
    if act == ActionType.PID:
        next_pos = core.calculate_next_step(pos, action, step_size=1.0)
        rpm, ctl, _, _ = dslpid.compute_control(
            params, ctl, dt, pos, q, vel, next_pos,
            model=DroneModel.CF2X,
        )
        return rpm, ctl
    if act == ActionType.VEL:
        norm = jnp.linalg.norm(action[:, 0:3], axis=-1, keepdims=True)
        v_unit = jnp.where(norm > 0, action[:, 0:3] / jnp.maximum(norm, 1e-12), 0.0)
        target_vel = (
            params.speed_limit * jnp.abs(action[:, 3:4]) * v_unit
        )
        target_rpy = jnp.stack(
            [jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], axis=-1
        )
        rpm, ctl, _, _ = dslpid.compute_control(
            params, ctl, dt, pos, q, vel, pos,
            target_rpy=target_rpy, target_vel=target_vel,
            model=DroneModel.CF2X,
        )
        return rpm, ctl
    if act == ActionType.ONE_D_PID:
        target = pos + 0.1 * jnp.concatenate(
            [jnp.zeros_like(action), jnp.zeros_like(action), action], axis=-1
        )
        rpm, ctl, _, _ = dslpid.compute_control(
            params, ctl, dt, pos, q, vel, target, model=DroneModel.CF2X,
        )
        return rpm, ctl
    raise ValueError(f"unsupported ActionType {act}")


def compute_obs(cfg: RLConfig, state: RLState) -> jnp.ndarray:
    """(N, 12 + BUF*A) KIN obs + action history
    (reference BaseRLAviary._computeObs:307-319)."""
    obs12 = core.kin_obs_12(state.core)
    n = cfg.aviary.num_drones
    buf = jnp.moveaxis(state.action_buffer, 0, 1).reshape(n, -1)
    return jnp.concatenate([obs12, buf], axis=-1)


def compute_rgb_obs(cfg: RLConfig, params: DroneParams, state: RLState,
                    width: int = 32, height: int = 24) -> jnp.ndarray:
    """Flat drone-0 POV pixel observation, values in [0, 1], (H*W*3,).

    The in-graph analog of the reference's RGB observation mode
    (BaseRLAviary._computeObs:284-305, which copies PyBullet camera frames
    on the host every other control step): here the frame comes from the
    pure-JAX ray caster (ops/render.py) INSIDE the jitted step, so
    pixels-to-actions PPO runs entirely on-device — something the
    reference's per-env CPU camera could not scale to. Scene: ground
    checkerboard + the 4 landmark pillars (the reference's RGB-mode props,
    BaseRLAviary._addObstacles:106-126) + the other drones (self excluded:
    the camera eye sits inside the drone's own collision sphere).
    """
    from gym_pybullet_adrp_tpu.ops import render as render_mod

    phys = state.core.phys
    n = cfg.aviary.num_drones
    dtype = phys.pos.dtype
    scene = render_mod.add_landmarks(
        render_mod.empty_scene(dtype=dtype), dtype=dtype
    )
    if n > 1:
        scene = scene._replace(
            sph_center=phys.pos,
            sph_radius=jnp.full((n,), 0.06, dtype),
            sph_color=jnp.tile(
                jnp.asarray([[0.3, 0.3, 0.3]], dtype=dtype), (n, 1)
            ),
            sph_valid=jnp.arange(n) != 0,   # mask out the camera drone
        )
    eye, target = render_mod.drone_camera(
        phys.pos[0], phys.quat[0], params.arm
    )
    rgba, _, _ = render_mod.render(
        scene, eye, target, width=width, height=height
    )
    return (rgba[..., :3] / 255.0).reshape(-1)


def compute_reward(cfg: RLConfig, state: RLState) -> jnp.ndarray:
    """Scalar reward (reference HoverAviary.py:68-79 /
    MultiHoverAviary.py:75-88)."""
    err = jnp.linalg.norm(state.target_pos - state.core.phys.pos, axis=-1)
    per_drone = jnp.maximum(0.0, 2.0 - err**4)
    return jnp.sum(per_drone)


def compute_terminated(cfg: RLConfig, state: RLState) -> jnp.ndarray:
    """Reference HoverAviary.py:83-96 / MultiHoverAviary.py:92-108."""
    err = jnp.linalg.norm(state.target_pos - state.core.phys.pos, axis=-1)
    if cfg.task == "multihover":
        return jnp.sum(err) < 1e-4
    return err[0] < 1e-4


def compute_truncated(cfg: RLConfig, state: RLState) -> jnp.ndarray:
    """Reference HoverAviary.py:100-117 / MultiHoverAviary.py:112-130."""
    pos = state.core.phys.pos
    rpy = state.core.phys.rpy
    xy_bound = 2.0 if cfg.task == "multihover" else 1.5
    out = (
        (jnp.abs(pos[:, 0]) > xy_bound)
        | (jnp.abs(pos[:, 1]) > xy_bound)
        | (pos[:, 2] > 2.0)
        | (jnp.abs(rpy[:, 0]) > 0.4)
        | (jnp.abs(rpy[:, 1]) > 0.4)
    )
    timeout = (
        state.core.step_counter.astype(jnp.float32) / cfg.aviary.pyb_freq
        > cfg.episode_len_sec
    )
    return jnp.any(out) | timeout


def rl_step(cfg: RLConfig, params: DroneParams, state: RLState, action):
    """One env step. Returns (state, obs, reward, terminated, truncated).

    Equivalent of BaseAviary.step:262-387 specialized for the RL envs,
    fully traceable (no data-dependent control flow).
    """
    action = jnp.asarray(action, dtype=state.core.phys.pos.dtype).reshape(
        cfg.aviary.num_drones, cfg.act_size
    )
    # push into the history buffer (reference appends in _preprocessAction:187)
    buf = jnp.concatenate([state.action_buffer[1:], action[None]], axis=0)
    rpm, ctl = preprocess_action(cfg, params, state, action)
    cstate = core.core_step(cfg.aviary, params, state.core, rpm)
    new_state = RLState(
        core=cstate, ctrl=ctl, action_buffer=buf, target_pos=state.target_pos
    )
    obs = compute_obs(cfg, new_state)
    reward = compute_reward(cfg, new_state)
    terminated = compute_terminated(cfg, new_state)
    truncated = compute_truncated(cfg, new_state)
    return new_state, obs, reward, terminated, truncated


def autoreset_step_with_final(cfg: RLConfig, params: DroneParams,
                              reset_state: RLState, state: RLState, action):
    """Like :func:`autoreset_step` but also returns the ended episode's
    terminal observation (for VecEnv ``final_observation`` infos)."""
    new_state, obs, reward, terminated, truncated = rl_step(
        cfg, params, state, action
    )
    done = terminated | truncated
    final_obs = obs
    new_state = jax.tree_util.tree_map(
        lambda r, s: jnp.where(
            jnp.reshape(done, (1,) * s.ndim), r, s
        ),
        reset_state,
        new_state,
    )
    # on episode end the returned obs is the first obs of the fresh episode
    # (SB3 VecEnv autoreset semantics; reward/terminated refer to the ended
    # episode and GAE masks the bootstrap with `done`)
    obs = jnp.where(done, compute_obs(cfg, new_state), obs)
    return new_state, obs, final_obs, reward, terminated, truncated


def autoreset_step(cfg: RLConfig, params: DroneParams, reset_state: RLState,
                   state: RLState, action):
    """Step + auto-reset on done — the vmap-friendly episode-boundary pattern
    (the reference relied on SB3's VecEnv reset, learn.py:53-65)."""
    new_state, obs, _, reward, terminated, truncated = (
        autoreset_step_with_final(cfg, params, reset_state, state, action)
    )
    return new_state, obs, reward, terminated, truncated
