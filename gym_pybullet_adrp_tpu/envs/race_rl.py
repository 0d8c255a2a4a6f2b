"""RL training interface for the race environment.

The reference trained race policies by wrapping MultiRaceAviary in
``DroneObservationWrapper`` + ``RewardWrapper`` and feeding it to SB3
(reference utils/wrapper.py, user_controller/RLController*.py consume the
resulting policies). Those wrappers are host-side Python; here the same
shaping is a pure function composed into the jitted step so race training
runs on thousands of vmapped env instances.

Action convention matches the reference RL pathway: policy action in
[-1, 1]^4 scaled by [1, 1, 1, pi], interpreted as a FULLSTATE position
offset target (reference RLController.predict:39-73 and MultiRaceAviary's
ndarray-action conversion, step:190-194).
"""

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import race as race_mod
from gym_pybullet_adrp_tpu.envs.race import RaceSpec, RaceState, RaceTrack

ACTION_SCALE = np.array([1.0, 1.0, 1.0, np.pi])


class RaceRLState(NamedTuple):
    """Race state + reward-shaping memory (reference RewardWrapper state,
    wrapper.py:80-99)."""

    race: RaceState
    current_gate_id: jnp.ndarray   # () int32 (drone 0, as in the wrapper)
    current_target: jnp.ndarray    # (4,) [x, y, z, yaw] of the tracked gate
    previous_pos: jnp.ndarray      # (3,)


def rl_race_reset(spec: RaceSpec, track: RaceTrack, key,
                  dtype=jnp.float32) -> RaceRLState:
    rs = race_mod.race_reset(spec, track, key, dtype=dtype)
    obs = race_mod.compute_obs(spec, track, rs)
    return RaceRLState(
        race=rs,
        current_gate_id=obs[0, -1].astype(jnp.int32),
        current_target=obs[0, 12:16],
        previous_pos=obs[0, 0:3],
    )


def compute_rgb_obs(spec: RaceSpec, state: RaceRLState,
                    width: int = 32, height: int = 24,
                    fov_deg: float = 60.0,
                    camera: str = "body") -> jnp.ndarray:
    """Flat drone-0 POV pixel observation of the race scene, [0, 1].

    Camera-based racing: the actual (randomization-resolved) gates,
    obstacles and opponent drones are ray-cast in-graph
    (ops/render.scene_from_race_state), so pixels-to-actions race PPO runs
    entirely on-device. The reference's RGB branch (MultiRaceAviary
    :574-588) was latent/dead code tied to per-env host cameras.

    ``width``/``height`` default to the historical 32x24 frame; the
    reference's own camera spec is 64x48 (BaseRLAviary.py:284-305).
    ``fov_deg`` is the vertical field of view (reference: 60 deg).

    ``camera``: "body" = the reference's rig (eye above CoM, looking
    along body +x, reference _getDroneImages:596-603). The round-5
    visibility study (VALIDATION §5) measured that along a mastering
    racing line the TARGET gate sits inside the body-x frame only 0-20%
    of the time for 3 of getting_started's 4 gates at ANY
    resolution/FOV — the RL action space zeroes yaw (reference
    DroneObservationWrapper, wrapper.py:52-65), so the camera never
    turns. "velocity" = a gimbaled camera facing along the horizontal
    velocity (falling back to body +x below 0.05 m/s), which lifts
    target-gate visibility to 48-92% on the same line — the documented
    deviation the full-track pixels policy trains with.
    """
    from gym_pybullet_adrp_tpu.ops import render as render_mod

    rs = state.race
    n = spec.num_drones
    scene = render_mod.scene_from_race_state(
        rs.gates_actual, rs.obstacles_actual, rs.phys.pos
    )
    # mask the camera drone's own sphere (the eye sits inside it)
    scene = scene._replace(sph_valid=jnp.arange(n) != 0)
    arm = jnp.asarray(rs.drone.arm).reshape(-1)[0]
    if camera == "velocity":
        pos = rs.phys.pos[0]
        hv = rs.phys.vel[0].at[2].set(0.0)
        n = jnp.linalg.norm(hv)
        fwd = jnp.where(
            n > 0.05, hv / jnp.maximum(n, 1e-6),
            quat_rotate_x(rs.phys.quat[0], pos.dtype),
        )
        eye = pos + jnp.asarray([0.0, 0.0, arm], dtype=pos.dtype)
        target = pos + fwd * 1000.0
    else:
        eye, target = render_mod.drone_camera(
            rs.phys.pos[0], rs.phys.quat[0], arm
        )
    rgba, _, _ = render_mod.render(
        scene, eye, target, width=width, height=height, fov_deg=fov_deg
    )
    return (rgba[..., :3] / 255.0).reshape(-1)


def quat_rotate_x(q, dtype):
    """Unit body +x axis in world frame (the body-camera forward)."""
    from gym_pybullet_adrp_tpu.ops import quat as quat_ops

    return quat_ops.rotate(q, jnp.asarray([1.0, 0.0, 0.0], dtype=dtype))


def shaped_reward(spec: RaceSpec, state: RaceRLState, obs, terminated,
                  task_completed):
    """Dense progress + sparse pass/collision/lap reward
    (reference RewardWrapper._compute_reward:121-186, drone 0).

    Returns (reward, new_shaping_state_fields).
    """
    num_gates = spec.num_gates
    gate_id = obs[0, -1].astype(jnp.int32)
    gate_positions = obs[0, 12:12 + 4 * num_gates].reshape(num_gates, 4)

    passed = gate_id > (state.current_gate_id % num_gates)
    new_gate_id = jnp.where(passed, gate_id, state.current_gate_id)
    new_target = jnp.where(
        passed,
        gate_positions[jnp.clip(gate_id, 0, num_gates - 1)],
        state.current_target,
    )
    r_passed = jnp.where(passed, 5.0, 0.0)
    r_collision = jnp.where(terminated & ~task_completed, -1.0, 0.0)
    r_lap = jnp.where(terminated & task_completed, 10.0, 0.0)

    pos = obs[0, 0:3]
    d_prev_xy = jnp.linalg.norm(new_target[0:2] - state.previous_pos[0:2])
    d_cur_xy = jnp.linalg.norm(new_target[0:2] - pos[0:2])
    d_prev_z = jnp.abs(new_target[2] - state.previous_pos[2])
    d_cur_z = jnp.abs(new_target[2] - pos[2])
    reward = (
        (d_prev_xy - d_cur_xy) + (d_prev_z - d_cur_z)
        + r_passed + r_collision + r_lap
    )
    return reward, new_gate_id, new_target, pos


def rl_race_step(spec: RaceSpec, track: RaceTrack, state: RaceRLState,
                 action, end_after_gate: int = 0):
    """One shaped training step.

    action: (N, 4) in [-1, 1]; transformed exactly like the reference's
    RLController (user_controller/RLController.py:60-73): yaw action zeroed,
    scaled by [1,1,1,pi], added to the drone's current [x,y,z,yaw] pose, and
    sent as a FULLSTATE target. ``end_after_gate > 0`` reproduces
    DroneObservationWrapper's early termination after that many gates
    (reference wrapper.py:61-63, used with 2 for twogates training).

    Returns (state, obs, reward, terminated, truncated).
    """
    # pin the env dtype regardless of the caller's (mirrors rl.rl_step)
    action = jnp.asarray(action, dtype=state.race.phys.pos.dtype)
    action = action * ACTION_SCALE.astype(action.dtype)
    action = action.at[:, 3].set(0.0)  # yaw zeroed (reference :64)
    pose = jnp.concatenate(
        [state.race.phys.pos, state.race.phys.rpy[:, 2:3]], axis=-1
    )
    action = pose + action
    cmd_ids, args = race_mod.actions_to_commands(
        spec, action, state.race.step_counter.astype(action.dtype)
    )
    rs, obs, _, terminated, truncated, info = race_mod.race_step(
        spec, track, state.race, cmd_ids, args
    )
    if end_after_gate:
        terminated = terminated | (rs.current_gate[0] >= end_after_gate)

    reward, new_gate_id, new_target, pos = shaped_reward(
        spec, state, obs, terminated, info["task_completed"]
    )
    new_state = RaceRLState(
        race=rs,
        current_gate_id=new_gate_id,
        current_target=new_target,
        previous_pos=pos,
    )
    return new_state, obs, reward, terminated, truncated


def autoreset_race_step(spec: RaceSpec, track: RaceTrack, state: RaceRLState,
                        action, key, end_after_gate: int = 0):
    """Step + on-done re-randomized reset (fresh PRNG fold per episode)."""
    new_state, obs, reward, terminated, truncated = rl_race_step(
        spec, track, state, action, end_after_gate
    )
    done = terminated | truncated
    reset_state = rl_race_reset(spec, track, key, dtype=obs.dtype)
    new_state = jax.tree_util.tree_map(
        lambda r, s: jnp.where(jnp.reshape(done, (1,) * s.ndim), r, s),
        reset_state,
        new_state,
    )
    obs = jnp.where(
        done, race_mod.compute_obs(spec, track, new_state.race), obs
    )
    return new_state, obs, reward, terminated, truncated


def batched_rl_race_step(spec: RaceSpec, track: RaceTrack, bstate,
                         action, keys, end_after_gate: int = 0,
                         fast: bool = False, telemetry: bool = False):
    """Batch-level shaped training step with autoreset.

    bstate: RaceRLState with (B, ...) leaves; action (B, N, 4) in [-1, 1];
    keys (B,) PRNG keys for per-episode re-randomized resets. With
    ``fast=True`` the firmware window runs through the Pallas race kernel
    (envs/race_fast.py) in ONE launch for all B*N agents. With
    ``telemetry=True`` a sixth return value carries the PRE-autoreset race
    rows {current_gate, eliminated, finished, ep_steps} — captured after
    the step but before the on-done reset wipes them, matching the fused
    kernel's telemetry block (ops/pallas_race_step.py) so both
    JaxRaceVectorEnv backends surface identical ``infos`` on done steps.
    """
    from gym_pybullet_adrp_tpu.envs import race_fast

    B, n = action.shape[0], spec.num_drones
    # pin the env dtype regardless of the caller's (mirrors rl.rl_step)
    action = jnp.asarray(action, dtype=bstate.race.phys.pos.dtype)
    act = action * ACTION_SCALE.astype(action.dtype)
    act = act.at[..., 3].set(0.0)
    pose = jnp.concatenate(
        [bstate.race.phys.pos, bstate.race.phys.rpy[..., 2:3]], axis=-1
    )
    act = pose + act
    cmd_ids, args = jax.vmap(
        lambda a, sc: race_mod.actions_to_commands(spec, a, sc)
    )(act, bstate.race.step_counter.astype(action.dtype))

    if fast:
        rs, obs, _, terminated, truncated, info = (
            race_fast.batched_race_step_fast(
                spec, track, bstate.race, cmd_ids, args
            )
        )
    else:
        rs, obs, _, terminated, truncated, info = jax.vmap(
            lambda s, i, a: race_mod.race_step(spec, track, s, i, a)
        )(bstate.race, cmd_ids, args)

    if end_after_gate:
        terminated = terminated | (rs.current_gate[:, 0] >= end_after_gate)

    def shape_one(st, ob, te, tc):
        reward, gid, tgt, pos = shaped_reward(spec, st, ob, te, tc)
        return RaceRLState(
            race=st.race, current_gate_id=gid, current_target=tgt,
            previous_pos=pos,
        ), reward

    # shaped_reward reads the pre-step shaping memory with the post-step obs
    shaped_states, reward = jax.vmap(
        lambda old, new_rs, ob, te, comp: shape_one(
            old._replace(race=new_rs), ob, te, comp
        )
    )(bstate, rs, obs, terminated, info["task_completed"])

    done = terminated | truncated
    telem = None
    if telemetry:
        telem = {
            "current_gate": rs.current_gate,
            "eliminated": rs.eliminated,
            "finished": rs.finished,
            "ep_steps": rs.step_counter / spec.steps_per_ctrl,
        }
    reset_states = jax.vmap(
        lambda k: rl_race_reset(spec, track, k, dtype=obs.dtype)
    )(keys)
    new_state = jax.tree_util.tree_map(
        lambda r, s: jnp.where(
            done.reshape((B,) + (1,) * (s.ndim - 1)), r, s
        ),
        reset_states,
        shaped_states,
    )
    obs = jnp.where(
        done[:, None, None],
        jax.vmap(lambda s: race_mod.compute_obs(spec, track, s.race))(new_state),
        obs,
    )
    if telemetry:
        return new_state, obs, reward, terminated, truncated, telem
    return new_state, obs, reward, terminated, truncated
