"""Multi-drone racing environment — the flagship workload, fully in-graph.

TPU-native re-design of the reference's ``MultiRaceAviary``
(reference envs/MultiRaceAviary.py): N drones race through gates with
COMPARE (ghost) / COMPETE (collision + opponent obs) modes, per-drone
Mellinger firmware controllers, YAML scenario configs with the level0-3
randomization ladder, and config-driven disturbances.

Architectural translation (SURVEY §2.2):

* one Mellinger C-firmware subprocess per drone + 2 pipe round-trips per
  500 Hz tick (reference :107-115, :231-254)  →  a vectorized pure-JAX
  controller evaluated for all drones inside the ``lax.scan`` substep loop;
* ``rayTestBatch`` gate-progress and ``getContactPoints`` collision FFI
  calls  →  analytic geometry (ops/collision.py);
* global/np_random randomization  →  explicit PRNG keys in the state.

Documented behavioral deviations from reference quirks (SURVEY "quirks"):
* the reference seeds its planner clock with the last element of each
  command's args (``process_command_queue(args[-1])``,
  MellingerControl.py:57), which for TAKEOFF/LAND is a *duration*, making
  trajectories evaluate at negative/shifted times; here the planner uses the
  true episode time.
* the reference's per-drone inertia randomization mutates a shared dict so
  drone i's offsets accumulate into drone i+1's base
  (MultiRaceAviary.py:419-424); here offsets are independent per drone.
* ``_computeObs`` ran its expensive gate/obstacle proximity block every
  500 Hz tick and discarded all but the last result (:220); here only the
  kinematics the controllers consume are produced per tick.
* ``info["task_completed"]`` is provided (the reference's RewardWrapper
  expects it but MultiRaceAviary never set it — a latent KeyError,
  wrapper.py:161-162).
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.control import commander as cmdr_mod
from gym_pybullet_adrp_tpu.control import mellinger as mel
from gym_pybullet_adrp_tpu.models.drone import (
    CF2X_LEGACY, DroneParams, drone_params,
)
from gym_pybullet_adrp_tpu.ops import collision as col
from gym_pybullet_adrp_tpu.ops import dynamics, quat as quat_ops
from gym_pybullet_adrp_tpu.utils.constants import (
    DEG_TO_RAD, FIRMWARE_FREQ, VISIBILITY_RANGE,
)
from gym_pybullet_adrp_tpu.utils.enums import (
    Command, DroneModel, Physics, RaceMode,
)


@dataclass(frozen=True)
class RaceSpec:
    """Static race configuration (hashable; closed over by the jitted step).

    Scalar randomization/disturbance parameters come from the YAML config
    (reference config/*.yaml; parsed ad-hoc in MultiRaceAviary). Uniform
    distributions throughout, as in every shipped scenario.
    """

    num_drones: int = 2
    num_gates: int = 4
    num_obstacles: int = 4
    racemode: RaceMode = RaceMode.COMPARE
    physics: Physics = Physics.PYB
    pyb_freq: int = 500
    ctrl_freq: int = 25
    episode_len_sec: float = 33.0
    drone_model: DroneModel = DroneModel.CF2X
    done_on_completion: bool = True
    done_on_collision: bool = True

    random_drone_state: bool = False
    rs_pos: Tuple[Tuple[float, float], ...] = (
        (-0.1, 0.1), (-0.1, 0.1), (0.0, 0.02),
    )
    rs_rot: Tuple[Tuple[float, float], ...] = (
        (-0.1, 0.1), (-0.1, 0.1), (-0.1, 0.1),
    )
    random_drone_inertia: bool = False
    ri_mass: Tuple[float, float] = (-0.01, 0.01)
    ri_ixx: Tuple[float, float] = (-1e-6, 1e-6)
    ri_iyy: Tuple[float, float] = (-1e-6, 1e-6)
    ri_izz: Tuple[float, float] = (-1e-6, 1e-6)
    random_gates_obstacles: bool = False
    rg_gates: Tuple[float, float] = (-0.15, 0.15)
    rg_obstacles: Tuple[float, float] = (-0.15, 0.15)
    disturbances: bool = False
    action_noise_std: float = 0.001
    dyn_dist_low: Tuple[float, float, float] = (-0.1, -0.1, -0.1)
    dyn_dist_high: Tuple[float, float, float] = (0.1, 0.1, 0.1)

    @property
    def steps_per_ctrl(self) -> int:
        return self.pyb_freq // self.ctrl_freq

    @property
    def obs_size(self) -> int:
        # reference _computeObs:590-597: 12 kin + 4 per gate + gate flags +
        # 3 per obstacle + obstacle flags + current gate id
        base = 12 + 5 * self.num_gates + 4 * self.num_obstacles + 1
        if self.racemode == RaceMode.COMPETE:
            base += 6 * (self.num_drones - 1)
        return base

    @classmethod
    def from_config(cls, config, num_drones: int, racemode: RaceMode,
                    physics: Physics = Physics.PYB):
        """Build from a loaded YAML scenario (utils/config.py)."""
        # NOTE(reference quirk preserved): MultiRaceAviary never reads the
        # config's ctrl_freq/pyb_freq — it always runs at FIRMWARE_FREQ=500 /
        # CTRL_FREQ=25 (reference MultiRaceAviary.__init__:37-38; the
        # getting_started config's ctrl_freq: 30 doesn't even divide 500).
        from gym_pybullet_adrp_tpu.utils.constants import CTRL_FREQ, FIRMWARE_FREQ

        kw = dict(
            num_drones=num_drones,
            num_gates=len(config.gates),
            num_obstacles=len(config.obstacles),
            racemode=racemode,
            physics=physics,
            pyb_freq=FIRMWARE_FREQ,
            ctrl_freq=CTRL_FREQ,
            episode_len_sec=float(config.episode_len_sec),
            done_on_completion=bool(config.get("done_on_completion", True)),
            done_on_collision=bool(config.get("done_on_collision", True)),
            random_drone_state=bool(config.get("random_drone_state", False)),
            random_drone_inertia=bool(config.get("random_drone_inertia", False)),
            random_gates_obstacles=bool(
                config.get("random_gates_obstacles", False)
            ),
            disturbances=bool(config.get("disturbances", False)),
        )
        if kw["random_drone_state"]:
            info = config.random_drone_state_info
            kw["rs_pos"] = (
                tuple(info.pos.x), tuple(info.pos.y), tuple(info.pos.z),
            )
            kw["rs_rot"] = (
                tuple(info.rot.r), tuple(info.rot.p), tuple(info.rot.y),
            )
        if kw["random_drone_inertia"]:
            info = config.random_drone_inertia_info
            kw["ri_mass"] = tuple(info.M.range)
            kw["ri_ixx"] = tuple(info.Ixx.range)
            kw["ri_iyy"] = tuple(info.Iyy.range)
            kw["ri_izz"] = tuple(info.Izz.range)
        if kw["random_gates_obstacles"]:
            info = config.random_gates_obstacles_info
            kw["rg_gates"] = tuple(info.gates.range)
            kw["rg_obstacles"] = tuple(info.obstacles.range)
        if kw["disturbances"]:
            info = config.disturbances_info
            kw["action_noise_std"] = float(info.action.std)
            kw["dyn_dist_low"] = tuple(info.dynamics.low)
            kw["dyn_dist_high"] = tuple(info.dynamics.high)
        return cls(**kw)


class RaceTrack(NamedTuple):
    """Nominal track + initial drone states (dynamic arrays, per scenario)."""

    gates_nominal: jnp.ndarray      # (G, 7) [x,y,z,r,p,yaw,type]
    obstacles_nominal: jnp.ndarray  # (O, 6)
    bounds: jnp.ndarray             # (2, 3) [lo, hi]
    init_pos: jnp.ndarray           # (N, 3)
    init_rpy: jnp.ndarray           # (N, 3) radians
    init_vel: jnp.ndarray           # (N, 3)
    init_pqr: jnp.ndarray           # (N, 3)


def track_from_config(config, num_drones: int, dtype=jnp.float32) -> RaceTrack:
    """Mirror of MultiRaceAviary.__init__'s config parsing (reference
    :82-95: rpy given in degrees)."""
    drones = list(config.init_states)

    def rows(field, scale=1.0):
        vals = [
            np.asarray(config.init_states[d][field], dtype=float)
            for d in drones
        ]
        # NOTE(capability extension): configs ship 2 drone entries; racing
        # more drones (e.g. the 4-drone level3 COMPETE benchmark config)
        # spawns extras in a grid offset from the last entry (the reference
        # errors out in BaseAviary.__init__ in this case)
        while len(vals) < num_drones:
            k = len(vals) - len(drones) + 1
            extra = vals[len(drones) - 1].copy()
            if field == "pos":
                extra = extra + np.array([0.2 * k, -0.2 * k, 0.0])
            vals.append(extra)
        return np.array(vals[:num_drones], dtype=float) * scale

    pos = rows("pos")
    rpy = rows("rpy", DEG_TO_RAD)
    vel = rows("vel")
    pqr = rows("pqr")
    return RaceTrack(
        gates_nominal=jnp.asarray(np.array(config.gates, dtype=float), dtype=dtype),
        obstacles_nominal=jnp.asarray(
            np.array(config.obstacles, dtype=float), dtype=dtype
        ),
        bounds=jnp.asarray(np.array(config.bounds, dtype=float), dtype=dtype),
        init_pos=jnp.asarray(pos, dtype=dtype),
        init_rpy=jnp.asarray(rpy, dtype=dtype),
        init_vel=jnp.asarray(vel, dtype=dtype),
        init_pqr=jnp.asarray(pqr, dtype=dtype),
    )


class RaceState(NamedTuple):
    """Full per-env race state (pytree)."""

    phys: dynamics.PhysState
    rpms: jnp.ndarray              # (N, 4) applied next substep
    prev_rpms: jnp.ndarray         # (N, 4) for drag
    mell: mel.MellingerState       # leaves (N, ...)
    cmdr: cmdr_mod.CommanderState  # leaves (N, ...)
    current_gate: jnp.ndarray      # (N,) int32
    eliminated: jnp.ndarray        # (N,) bool
    finished: jnp.ndarray          # (N,) bool
    gates_actual: jnp.ndarray      # (G, 7)
    obstacles_actual: jnp.ndarray  # (O, 6)
    drone: DroneParams             # per-episode randomized (leaves (N,)/(N,3))
    step_counter: jnp.ndarray      # () int32 (pyb substeps)
    key: jax.Array


def _randomized_drone_params(spec: RaceSpec, key, dtype) -> DroneParams:
    """Per-drone mass/inertia (reference _drone_init:407-432: bases come from
    the legacy cf2x.urdf, not the IROS file — preserved)."""
    base = drone_params(spec.drone_model, dtype=dtype)
    n = spec.num_drones
    mass0 = jnp.full((n,), CF2X_LEGACY["mass"], dtype=dtype)
    J0 = jnp.broadcast_to(
        jnp.asarray(CF2X_LEGACY["J"], dtype=dtype), (n, 3)
    )
    if spec.random_drone_inertia:
        km, ki = jax.random.split(key)
        mass_off = jax.random.uniform(
            km, (n,), minval=spec.ri_mass[0], maxval=spec.ri_mass[1],
            dtype=dtype,
        )
        lo = jnp.asarray(
            [spec.ri_ixx[0], spec.ri_iyy[0], spec.ri_izz[0]], dtype=dtype
        )
        hi = jnp.asarray(
            [spec.ri_ixx[1], spec.ri_iyy[1], spec.ri_izz[1]], dtype=dtype
        )
        j_off = jax.random.uniform(ki, (n, 3), dtype=dtype) * (hi - lo) + lo
        mass0 = jnp.clip(mass0 + mass_off, 0.0, 100.0)
        J0 = jnp.clip(J0 + j_off, 0.0, 100.0)
    return base._replace(
        mass=mass0,
        J=J0,
        kf=jnp.broadcast_to(base.kf, (n,)),
        km=jnp.broadcast_to(base.km, (n,)),
        arm=jnp.broadcast_to(base.arm, (n,)),
    )


def race_reset(spec: RaceSpec, track: RaceTrack, key,
               dtype=jnp.float32) -> RaceState:
    """Fresh episode (reference reset:127-167 + _addObstacles + _drone_init)."""
    k_gates, k_obst, k_inertia, k_pos, k_rot, k_next = jax.random.split(key, 6)
    n = spec.num_drones

    gates = track.gates_nominal
    obstacles = track.obstacles_nominal
    if spec.random_gates_obstacles:
        g_off = jax.random.uniform(
            k_gates, (spec.num_gates, 3),
            minval=spec.rg_gates[0], maxval=spec.rg_gates[1], dtype=dtype,
        )
        # offsets apply to x, y, yaw (reference :366-369)
        gates = gates.at[:, 0].add(g_off[:, 0]).at[:, 1].add(g_off[:, 1]) \
                     .at[:, 5].add(g_off[:, 2])
        o_off = jax.random.uniform(
            k_obst, (spec.num_obstacles, 2),
            minval=spec.rg_obstacles[0], maxval=spec.rg_obstacles[1],
            dtype=dtype,
        )
        obstacles = obstacles.at[:, 0].add(o_off[:, 0]).at[:, 1].add(o_off[:, 1])

    pos = track.init_pos
    rpy = track.init_rpy
    if spec.random_drone_state:
        lo_p = jnp.asarray([r[0] for r in spec.rs_pos], dtype=dtype)
        hi_p = jnp.asarray([r[1] for r in spec.rs_pos], dtype=dtype)
        lo_r = jnp.asarray([r[0] for r in spec.rs_rot], dtype=dtype)
        hi_r = jnp.asarray([r[1] for r in spec.rs_rot], dtype=dtype)
        pos = pos + jax.random.uniform(k_pos, (n, 3), dtype=dtype) * (hi_p - lo_p) + lo_p
        rpy = rpy + jax.random.uniform(k_rot, (n, 3), dtype=dtype) * (hi_r - lo_r) + lo_r

    quat = quat_ops.from_euler_xyz(rpy)
    phys = dynamics.PhysState(
        pos=pos,
        quat=quat,
        vel=track.init_vel,
        # omega is body-frame; init pqr (world) mapped through R^T
        omega=quat_ops.rotate_inv(quat, track.init_pqr),
    )

    mstate = mel.init_state((n,), dtype=dtype)
    # reference MellingerControl.reset:143-150 tells the controller its
    # initial kinematics so the first finite-difference step is clean
    mstate = mstate._replace(prev_rpy=rpy, prev_vel=track.init_vel)

    return RaceState(
        phys=phys,
        rpms=jnp.zeros((n, 4), dtype=dtype),
        prev_rpms=jnp.zeros((n, 4), dtype=dtype),
        mell=mstate,
        cmdr=cmdr_mod.init_state((n,), dtype=dtype),
        current_gate=jnp.zeros((n,), dtype=jnp.int32),
        eliminated=jnp.zeros((n,), dtype=bool),
        finished=jnp.zeros((n,), dtype=bool),
        gates_actual=gates,
        obstacles_actual=obstacles,
        drone=_randomized_drone_params(spec, k_inertia, dtype),
        step_counter=jnp.zeros((), dtype=jnp.int32),
        key=k_next,
    )


# ---------------------------------------------------------------------------
# collision / progress helpers


def _collisions(spec: RaceSpec, state: RaceState) -> jnp.ndarray:
    """(N,) bool: drone in contact with any collision object (reference
    _collision:552-562; objects = gates + obstacles + plane [+ drones in
    COMPETE, reference reset:151-159])."""
    pos = state.phys.pos
    radius = jnp.broadcast_to(state.drone.collision_r, pos.shape[:-1])
    half_h = state.drone.collision_h / 2.0

    gate_hit = jax.vmap(
        lambda gp: col.drone_gate_collision(pos, gp[:6], radius, half_h),
        out_axes=-1,
    )(state.gates_actual)  # (N, G)
    obst_hit = jax.vmap(
        lambda op: col.drone_obstacle_collision(pos, op, radius, half_h),
        out_axes=-1,
    )(state.obstacles_actual)  # (N, O)
    hit = (
        jnp.any(gate_hit, axis=-1)
        | jnp.any(obst_hit, axis=-1)
        | col.ground_collision(
            pos, state.drone.collision_h, state.drone.collision_z_offset
        )
    )
    if spec.racemode == RaceMode.COMPETE:
        dd = col.drone_drone_collision(pos, radius[..., None], half_h)
        hit = hit | jnp.any(dd, axis=-1)
    return hit


def _gate_progress(spec: RaceSpec, state: RaceState) -> RaceState:
    """Advance current_gate / finished (reference _gate_progress:471-506,
    including the one-step-late `finished` latch)."""
    pos = state.phys.pos
    gate_idx = jnp.clip(state.current_gate, 0, spec.num_gates - 1)
    gate_pose = state.gates_actual[gate_idx][..., :6]          # (N, 6)
    # gate *type* comes from the nominal config row (reference :477)
    gate_type = state.gates_actual[gate_idx][..., 6].astype(jnp.int32)
    radius = jnp.broadcast_to(state.drone.collision_r, pos.shape[:-1])
    passed = col.gate_pass_rays(pos, gate_pose, gate_type, radius)
    in_progress = state.current_gate < spec.num_gates
    finished = state.finished | (state.current_gate >= spec.num_gates)
    current = jnp.where(
        in_progress & passed, state.current_gate + 1, state.current_gate
    )
    return state._replace(current_gate=current, finished=finished)


# ---------------------------------------------------------------------------
# step


def race_step(spec: RaceSpec, track: RaceTrack, state: RaceState,
              cmd_ids, cmd_args):
    """One control step (reference step:171-270).

    cmd_ids: (N,) int32 Command ids; cmd_args: (N, ARGS_DIM) packed args
    (see control/commander.py). ndarray actions are converted to FULLSTATE
    commands by the caller (class layer / `actions_to_commands`).

    Returns (state, obs, reward, terminated, truncated, info_dict).
    """
    dtype = state.phys.pos.dtype
    n = spec.num_drones
    dt = jnp.asarray(1.0 / spec.pyb_freq, dtype=dtype)

    state = process_commands(spec, state, cmd_ids, cmd_args)

    def substep(carry, _):
        st, key = carry
        # 1. physics with the rpms computed on the previous tick
        #    (reference :215: _apply_physics(self.rpms, self.prev_rpms))
        key, k_wind, k_act = jax.random.split(key, 3)
        if spec.disturbances:
            lo = jnp.asarray(spec.dyn_dist_low, dtype=dtype)
            hi = jnp.asarray(spec.dyn_dist_high, dtype=dtype)
            wind = jax.random.uniform(k_wind, (n, 3), dtype=dtype) * (hi - lo) + lo
        else:
            wind = None
        phys = dynamics.pyb_substep(
            st.drone, st.phys, st.rpms, st.prev_rpms, dt,
            spec.drone_model, spec.physics, ext_force_world=wind,
        ) if spec.physics != Physics.DYN else dynamics.dyn_substep(
            st.drone, st.phys, st.rpms, dt, spec.drone_model
        )

        # 2. controller tick on the fresh kinematics (reference :218-254)
        if spec.disturbances:
            act_noise = (
                jax.random.normal(k_act, (n, 4), dtype=dtype)
                * spec.action_noise_std
            )
        else:
            act_noise = jnp.zeros((n, 4), dtype=dtype)

        tick_time = st.mell.tick.astype(dtype) / FIRMWARE_FREQ
        cmdr = cmdr_mod.update_setpoint(st.cmdr, tick_time)
        mell, rpm = mel.compute_control(
            st.mell, cmdr.setpoint, phys.pos, phys.rpy, phys.vel,
            act_noise, kf=st.drone.kf[..., None],
        )
        # eliminated drones: motors off (reference :233-234)
        rpm = jnp.where(st.eliminated[..., None], jnp.zeros_like(rpm), rpm)
        new_st = st._replace(
            phys=phys,
            prev_rpms=jnp.where(
                st.eliminated[..., None], jnp.zeros_like(rpm), st.rpms
            ),
            rpms=rpm,
            mell=mell,
            cmdr=cmdr,
            step_counter=st.step_counter + 1,
        )
        return (new_st, key), None

    key, k_scan = jax.random.split(state.key)
    (state, _), _ = jax.lax.scan(
        substep, (state._replace(key=key), k_scan), None,
        length=spec.steps_per_ctrl,
    )

    return finish_ctrl_step(spec, track, state)


def process_commands(spec: RaceSpec, state: RaceState, cmd_ids, cmd_args):
    """Per-ctrl-step command fan-out (reference step:189-207): eliminated
    drones are forced to STOP, then commands execute in-graph."""
    dtype = state.phys.pos.dtype
    n = spec.num_drones
    cmd_ids = jnp.where(
        state.eliminated, jnp.full_like(cmd_ids, int(Command.STOP)), cmd_ids
    )
    sim_time = state.step_counter.astype(dtype) / spec.pyb_freq
    cmdr = cmdr_mod.process_command(
        state.cmdr, cmd_ids, cmd_args,
        jnp.broadcast_to(sim_time, (n,)),
        state.phys.pos, state.phys.vel, state.phys.rpy[..., 2],
    )
    return state._replace(cmdr=cmdr)


def finish_ctrl_step(spec: RaceSpec, track: RaceTrack, state: RaceState):
    """Ctrl-rate tail: gate progress, obs, elimination/termination
    (reference step:257-270 + _computeTerminated/_computeTruncated)."""
    dtype = state.phys.pos.dtype
    state = _gate_progress(spec, state)
    obs = compute_obs(spec, track, state)

    pos = state.phys.pos
    out_of_bounds = jnp.any(jnp.abs(pos) > track.bounds[1], axis=-1)
    unstable = jnp.any(jnp.abs(state.phys.ang_vel_world) > 20.0, axis=-1)
    crashed = _collisions(spec, state)
    # done_on_collision (config/*.yaml: "terminate if collided with another
    # object"): with False, contact does not eliminate — only out-of-bounds
    # and instability do. The reference parsed this key but never wired it
    # (MultiRaceAviary.py:85); here it is honored, default True.
    if not spec.done_on_collision:
        crashed = jnp.zeros_like(crashed)
    eliminated = state.eliminated | out_of_bounds | unstable | crashed
    state = state._replace(eliminated=eliminated)
    # done_on_completion ("terminate if all gates passed"): with False a
    # finished drone no longer counts toward episode termination — the
    # episode runs to truncation unless every drone is eliminated.
    done_mask = eliminated | (
        state.finished if spec.done_on_completion
        else jnp.zeros_like(state.finished)
    )
    terminated = jnp.all(done_mask)
    truncated = (
        state.step_counter.astype(dtype) / spec.pyb_freq
        > spec.episode_len_sec
    )

    reward = jnp.zeros((), dtype=dtype)  # shaped by RewardWrapper
    info = {
        "answer": 42,
        "task_completed": jnp.all(state.finished),
        "current_gate": state.current_gate,
        "eliminated": eliminated,
        "finished": state.finished,
    }
    return state, obs, reward, terminated, truncated, info


def compute_obs(spec: RaceSpec, track: RaceTrack, state: RaceState):
    """(N, obs_size) observation (reference _computeObs:566-661)."""
    pos = state.phys.pos
    kin = jnp.concatenate(
        [pos, state.phys.rpy, state.phys.vel, state.phys.ang_vel_world],
        axis=-1,
    )  # (N, 12)

    gate_d = jax.vmap(
        lambda gp: col.drone_gate_distance(pos, gp[:6]), out_axes=-1
    )(state.gates_actual)  # (N, G)
    gate_in_range = gate_d < VISIBILITY_RANGE
    gate_actual_xyzyaw = state.gates_actual[:, [0, 1, 2, 5]]
    gate_nominal_xyzyaw = track.gates_nominal[:, [0, 1, 2, 5]]
    gate_poses = jnp.where(
        gate_in_range[..., None],
        gate_actual_xyzyaw[None],
        gate_nominal_xyzyaw[None],
    )  # (N, G, 4)

    obst_d = jax.vmap(
        lambda op: col.drone_obstacle_distance(pos, op), out_axes=-1
    )(state.obstacles_actual)  # (N, O)
    obst_in_range = obst_d < VISIBILITY_RANGE
    obst_poses = jnp.where(
        obst_in_range[..., None],
        state.obstacles_actual[None, :, :3],
        track.obstacles_nominal[None, :, :3],
    )  # (N, O, 3)

    n = spec.num_drones
    parts = [
        kin,
        gate_poses.reshape(n, -1),
        gate_in_range.astype(kin.dtype),
        obst_poses.reshape(n, -1),
        obst_in_range.astype(kin.dtype),
        state.current_gate.astype(kin.dtype)[..., None],
    ]
    if spec.racemode == RaceMode.COMPETE:
        # poses of all *other* drones, ordered by drone index skipping self
        # (reference :654-659)
        pose6 = jnp.concatenate([pos, state.phys.rpy], axis=-1)  # (N, 6)
        idx = jnp.arange(n)
        others = jnp.stack(
            [jnp.roll(idx, -i)[1:] for i in range(n)], axis=0
        )  # (N, N-1) — for row i: indices != i in ascending order rotated;
        # reorder to match reference ordering (ascending, skipping self)
        others = jnp.sort(others, axis=-1)
        parts.append(pose6[others].reshape(n, -1))
    return jnp.concatenate(parts, axis=-1)


def actions_to_commands(spec: RaceSpec, actions, step_counter):
    """ndarray (N, 4) [x, y, z, yaw] -> FULLSTATE command arrays (reference
    step:190-194)."""
    n = spec.num_drones
    cmd_ids = jnp.full((n,), int(Command.FULLSTATE), dtype=jnp.int32)
    args = jnp.zeros((n, cmdr_mod.ARGS_DIM), dtype=actions.dtype)
    args = args.at[:, 0:3].set(actions[:, 0:3])
    args = args.at[:, 9].set(actions[:, 3])
    args = args.at[:, 13].set(step_counter)
    return cmd_ids, args


# ---------------------------------------------------------------------------
# Gymnasium class layer


import gymnasium as _gym


class MultiRaceAviary(_gym.Env):
    """Gymnasium-API shell over the functional race env (reference
    envs/MultiRaceAviary.py). Command tuples are packed host-side; the whole
    step (commands -> 20 firmware ticks -> progress/termination) is one
    jitted XLA program.
    """

    def __init__(
        self,
        race_config,
        drone_model: DroneModel = DroneModel.CF2X,
        num_drones: int = 2,
        physics: Physics = Physics.PYB,
        pyb_freq: int = None,
        ctrl_freq: int = None,
        gui: bool = False,
        record: bool = False,
        racemode: RaceMode = RaceMode.COMPARE,
        obs=None,
        act=None,
        dtype=jnp.float32,
    ):
        if isinstance(race_config, str):
            from gym_pybullet_adrp_tpu.utils.config import load_config

            race_config = load_config(race_config)
        from gym_pybullet_adrp_tpu.utils.enums import ObservationType

        self.config = race_config
        self.observation_type = obs or ObservationType.KIN
        self.IMG_RES = np.array([64, 48])
        self.spec_ = RaceSpec.from_config(
            race_config, num_drones, racemode, physics
        )
        if pyb_freq is not None or ctrl_freq is not None:
            self.spec_ = RaceSpec(
                **{
                    **self.spec_.__dict__,
                    **({"pyb_freq": pyb_freq} if pyb_freq else {}),
                    **({"ctrl_freq": ctrl_freq} if ctrl_freq else {}),
                }
            )
        self.dtype = dtype
        self.track = track_from_config(race_config, num_drones, dtype=dtype)
        self.NUM_DRONES = num_drones
        self.CTRL_FREQ = self.spec_.ctrl_freq
        self.PYB_FREQ = self.spec_.pyb_freq
        self.PYB_STEPS_PER_CTRL = self.spec_.steps_per_ctrl
        self.CTRL_TIMESTEP = 1.0 / self.CTRL_FREQ
        self.racemode = racemode
        self.num_gates = self.spec_.num_gates
        self.EPISODE_LEN_SEC = self.spec_.episode_len_sec
        self._seed_counter = int(race_config.get("seed", 1337))
        self._reseed = bool(race_config.get("reseed_on_reset", True))
        self._state: Optional[RaceState] = None

        spec, trk = self.spec_, self.track

        @jax.jit
        def _reset(key):
            return race_reset(spec, trk, key, dtype=dtype)

        @jax.jit
        def _step(state, packed_in):
            # ONE upload and ONE packed download per interactive step: each
            # separate host<->device fetch costs a full round trip (~40 ms
            # through this container's remote-TPU tunnel)
            cmd_ids = packed_in[:, 0].astype(jnp.int32)
            cmd_args = packed_in[:, 1:]
            state, obs, reward, terminated, truncated, info = race_step(
                spec, trk, state, cmd_ids, cmd_args
            )
            # pack in the obs dtype: preserves full precision for
            # dtype=float64 parity runs (no float32 bottleneck)
            dt = obs.dtype
            packed = jnp.concatenate([
                obs.reshape(-1),
                jnp.stack([
                    reward.astype(dt),
                    terminated.astype(dt),
                    truncated.astype(dt),
                    info["task_completed"].astype(dt),
                ]),
            ])
            return state, packed

        self._jit_reset = _reset
        self._jit_step = _step
        self.action_space = self._actionSpace()
        self.observation_space = self._observationSpace()

    # -- spaces (reference :284-343) ----------------------------------------
    def _actionSpace(self):
        from gymnasium import spaces

        lim = np.ones((self.NUM_DRONES, 4))
        return spaces.Box(low=-lim, high=lim, dtype=float)

    def _observationSpace(self):
        from gymnasium import spaces

        from gym_pybullet_adrp_tpu.utils.enums import ObservationType

        if self.observation_type == ObservationType.RGB:
            # reference _observationSpace:300-304 (latent RGB branch)
            return spaces.Box(
                low=0, high=255, dtype=np.uint8,
                shape=(self.NUM_DRONES, int(self.IMG_RES[1]),
                       int(self.IMG_RES[0]), 4),
            )
        G, O = self.spec_.num_gates, self.spec_.num_obstacles
        lo = np.concatenate([
            [-5] * 3, [-np.pi] * 3, [-10] * 3, [-10] * 3,
            [-5, -5, -5, -np.pi] * G, [-1] * G,
            [-5] * 3 * O, [-1] * O, [-1],
        ])
        hi = np.concatenate([
            [5] * 3, [np.pi] * 3, [10] * 3, [10] * 3,
            [5, 5, 5, np.pi] * G, [1] * G,
            [5] * 3 * O, [1] * O, [G],
        ])
        if self.racemode == RaceMode.COMPETE:
            lo = np.concatenate([lo, ([-5] * 3 + [-np.pi] * 3) * (self.NUM_DRONES - 1)])
            hi = np.concatenate([hi, ([5] * 3 + [np.pi] * 3) * (self.NUM_DRONES - 1)])
        return spaces.Box(
            low=np.tile(lo, (self.NUM_DRONES, 1)),
            high=np.tile(hi, (self.NUM_DRONES, 1)),
            dtype=np.float64,
        )

    # -- API ----------------------------------------------------------------
    @property
    def current_gate(self):
        return np.asarray(self._state.current_gate)

    @property
    def drones_eliminated(self):
        return np.asarray(self._state.eliminated)

    @property
    def drones_finished(self):
        return np.asarray(self._state.finished)

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            key = jax.random.PRNGKey(seed)
        elif self._reseed:
            key = jax.random.PRNGKey(self._seed_counter)
        else:
            # reseed_on_reset: False -> episode-varying randomness (level3)
            self._seed_counter += 1
            key = jax.random.PRNGKey(self._seed_counter)
        self._state = self._jit_reset(key)
        self.step_counter = 0
        from gym_pybullet_adrp_tpu.utils.enums import ObservationType

        if self.observation_type == ObservationType.RGB:
            return self._rgbObs(), {"answer": 42}
        obs = np.asarray(
            compute_obs(self.spec_, self.track, self._state), dtype=np.float64
        )
        return obs, {"answer": 42}

    def step(self, action):
        """action: ndarray (N, 4) or a list of (Command, args) tuples per
        drone (the reference accepts both, step:189-207)."""
        # pack the upload in the env dtype so input precision matches the
        # packed download's (float64 parity runs keep f64 command targets
        # end-to-end; cmd ids are small ints, exact in any float dtype)
        up = np.dtype(self.dtype)
        if isinstance(action, np.ndarray) or (
            hasattr(action, "ndim") and not isinstance(action, (list, tuple))
        ):
            action = np.asarray(action, dtype=up)
            cmd_ids = np.full((self.NUM_DRONES,), int(Command.FULLSTATE), np.int32)
            args = np.zeros((self.NUM_DRONES, cmdr_mod.ARGS_DIM), up)
            args[:, 0:3] = action[:, 0:3]
            args[:, 9] = action[:, 3]
            args[:, 13] = self.step_counter
        else:
            cmd_ids = np.zeros((self.NUM_DRONES,), np.int32)
            args = np.zeros((self.NUM_DRONES, cmdr_mod.ARGS_DIM), up)
            for i, (cmd, a) in enumerate(action):
                cid, vec = cmdr_mod.pack_command(cmd, a)
                cmd_ids[i] = cid
                args[i] = vec

        packed_in = np.concatenate(
            [cmd_ids[:, None].astype(up), args], axis=1
        )
        self._state, packed = self._jit_step(
            self._state, jnp.asarray(packed_in)
        )
        packed = np.asarray(packed)
        n_obs = packed.size - 4  # KIN obs block + 4 scalar channels
        tail = packed[n_obs:]
        # the device counter advances exactly PYB_STEPS_PER_CTRL per step:
        # track it host-side (exact int, no extra device round trip)
        self.step_counter += self.PYB_STEPS_PER_CTRL
        info_out = {
            "answer": 42,
            "task_completed": bool(tail[3] > 0.5),
        }
        from gym_pybullet_adrp_tpu.utils.enums import ObservationType

        if self.observation_type == ObservationType.RGB:
            obs_out = self._rgbObs()
        else:
            obs_out = packed[:n_obs].reshape(
                self.NUM_DRONES, -1
            ).astype(np.float64)
        return (
            obs_out,
            float(tail[0]),
            bool(tail[1] > 0.5),
            bool(tail[2] > 0.5),
            info_out,
        )

    def _rgbObs(self):
        """(N, H, W, 4) drone-POV frames via the in-graph ray caster
        (reference _computeObs RGB branch, :574-588)."""
        from gym_pybullet_adrp_tpu.ops.render import (
            drone_camera, render, scene_from_race_state,
        )

        st = self._state
        scene = scene_from_race_state(
            st.gates_actual, st.obstacles_actual, st.phys.pos
        )
        frames = []
        for i in range(self.NUM_DRONES):
            eye, target = drone_camera(
                st.phys.pos[i], st.phys.quat[i],
                float(np.asarray(st.drone.arm)[i])
                if np.asarray(st.drone.arm).ndim else float(st.drone.arm),
            )
            rgba, _, _ = render(
                scene, eye, target,
                width=int(self.IMG_RES[0]), height=int(self.IMG_RES[1]),
            )
            frames.append(np.asarray(rgba))
        return np.stack(frames).astype(np.float32)

    def close(self):
        pass
