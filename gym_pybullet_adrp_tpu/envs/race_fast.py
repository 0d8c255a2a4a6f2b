"""Fast race step: the 20-tick firmware window via the Pallas race kernel.

Packs the RaceState pytree into the channel-major blocks of
``ops/pallas_race.py``, runs the fused window (physics + Mellinger +
commander), unpacks, and finishes the control step with the shared XLA tail
(gate progress / collisions / termination from envs/race.py). Supported
configuration: ``Physics.PYB``, CF2X, no stochastic disturbances; other
configurations use the XLA path (`race.race_step`).

Agents (num_drones per env) flatten onto the lane axis; for vmapped
batches use `batched_race_window`, which flattens (B, N) agents together so
one kernel launch serves the whole env batch.
"""


import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.control import mellinger as mel
from gym_pybullet_adrp_tpu.envs import race as race_mod
from gym_pybullet_adrp_tpu.envs.race import RaceSpec, RaceState, RaceTrack
from gym_pybullet_adrp_tpu.ops import pallas_race, quat as quat_ops
from gym_pybullet_adrp_tpu.utils.constants import RAD_TO_DEG
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics

LANE = pallas_race.LANE


def supports(spec: RaceSpec) -> bool:
    return (
        spec.physics == Physics.PYB
        and spec.drone_model == DroneModel.CF2X
        and not spec.disturbances
    )


def _pad(x, agents, total):
    """(A, ...) -> (total, ...) zero-padded on the agent axis."""
    pad = [(0, total - agents)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def pack_blocks(state: RaceState, agents: int):
    """RaceState (leaves (A, ...)) -> (S_block, W_block) channel-major.

    `agents` is the true agent count; lanes pad up to a multiple of 128.
    """
    total = -(-agents // LANE) * LANE
    T = total // LANE
    f32 = jnp.float32

    def rows(*cols):
        return [
            _pad(c.astype(f32), agents, total).reshape(T, LANE) for c in cols
        ]

    m = state.mell
    s_rows = (
        rows(*(state.phys.pos[:, i] for i in range(3)))
        + rows(*(state.phys.quat[:, i] for i in range(4)))
        + rows(*(state.phys.vel[:, i] for i in range(3)))
        + rows(*(state.phys.omega[:, i] for i in range(3)))
        + rows(*(state.rpms[:, i] for i in range(4)))
        + rows(*(state.prev_rpms[:, i] for i in range(4)))
        + rows(*(m.prev_rpy[:, i] for i in range(3)))
        + rows(*(m.prev_vel[:, i] for i in range(3)))
        + rows(*(m.acc_lpf.d1[:, i] for i in range(3)))
        + rows(*(m.acc_lpf.d2[:, i] for i in range(3)))
        + rows(*(m.gyro_lpf.d1[:, i] for i in range(3)))
        + rows(*(m.gyro_lpf.d2[:, i] for i in range(3)))
        + rows(*(m.i_error_pos[:, i] for i in range(3)))
        + rows(*(m.i_error_m[:, i] for i in range(3)))
        + rows(*(m.prev_omega_rp[:, i] for i in range(2)))
        + rows(*(m.prev_setpoint_omega_rp[:, i] for i in range(2)))
        + rows(*(m.control_rpyt[:, i] for i in range(4)))
        + rows(m.tick, m.last_pos_pid_call, m.last_att_pid_call,
               m.tumble_counter, m.error_flag)
    )
    S = jnp.stack(s_rows, axis=0)

    c = state.cmdr
    sp = c.setpoint
    planner = (~sp_override(c)) & c.planner_active
    # static desired yaw: quat chain (FULLSTATE) > att_rpy ABS > 0
    yaw_quat_deg = (
        quat_ops.to_euler_xyz(sp.att_quat)[..., 2] * RAD_TO_DEG
    )
    yaw_static = jnp.where(
        sp.mode_quat == mel.MODE_ABS,
        yaw_quat_deg,
        jnp.where(sp.mode_rpy[..., 2] == mel.MODE_ABS, sp.att_rpy[..., 2], 0.0),
    )
    pos_mode = planner | (sp.mode_xyz[..., 0] == mel.MODE_ABS)
    z_disable = (~planner) & (sp.mode_xyz[..., 2] == mel.MODE_DISABLE)

    w_rows = (
        rows(*(sp.pos[:, i] for i in range(3)))
        + rows(*(sp.vel[:, i] for i in range(3)))
        + rows(*(sp.acc[:, i] for i in range(3)))
        + rows(*(sp.att_rate[:, i] for i in range(3)))
        + rows(yaw_static, sp.thrust, pos_mode, z_disable, planner,
               c.t_begin, c.duration, state.eliminated)
        + rows(*(c.coeffs[:, ch, i] for ch in range(4) for i in range(8)))
        + rows(
            jnp.broadcast_to(state.drone.mass, (agents,)),
            *(jnp.broadcast_to(state.drone.J[..., i], (agents,))
              for i in range(3)),
        )
        + rows(jnp.zeros(agents, dtype=f32))  # reserved
    )
    W = jnp.stack(w_rows, axis=0)
    return S, W


def sp_override(cmdr):
    return cmdr.full_state_override


def unpack_blocks(S, state: RaceState, agents: int) -> RaceState:
    """Updated channel block -> RaceState (keeping cmdr/gate/track fields)."""
    dtype = state.phys.pos.dtype
    flat = S.reshape(pallas_race.S_CHANNELS, -1)[:, :agents].T  # (A, 58)
    flat = flat.astype(dtype)
    m = state.mell

    def v(lo, hi):
        return flat[:, lo:hi]

    phys = state.phys._replace(
        pos=v(0, 3), quat=v(3, 7), vel=v(7, 10), omega=v(10, 13)
    )
    mell = m._replace(
        prev_rpy=v(21, 24),
        prev_vel=v(24, 27),
        acc_lpf=m.acc_lpf._replace(d1=v(27, 30), d2=v(30, 33)),
        gyro_lpf=m.gyro_lpf._replace(d1=v(33, 36), d2=v(36, 39)),
        i_error_pos=v(39, 42),
        i_error_m=v(42, 45),
        prev_omega_rp=v(45, 47),
        prev_setpoint_omega_rp=v(47, 49),
        control_rpyt=v(49, 53),
        tick=flat[:, 53].astype(jnp.int32),
        last_pos_pid_call=flat[:, 54],
        last_att_pid_call=flat[:, 55],
        tumble_counter=flat[:, 56].astype(jnp.int32),
        error_flag=flat[:, 57] > 0.5,
    )
    return state._replace(
        phys=phys,
        rpms=v(13, 17),
        prev_rpms=v(17, 21),
        mell=mell,
        step_counter=state.step_counter
        + jnp.asarray(0, dtype=jnp.int32),  # counter advanced by caller
    )


def _model_scalars(spec: RaceSpec):
    """Non-randomized model constants from the registry (kf/km/arm and the
    collision rest height are never randomized by the race env)."""
    from gym_pybullet_adrp_tpu.models.drone import _REGISTRY

    raw = _REGISTRY[spec.drone_model]
    ground_z = raw["collision_h"] / 2.0 - raw["collision_z_offset"]
    return raw["kf"], raw["km"], raw["arm"], ground_z


def race_window_fast(spec: RaceSpec, state: RaceState,
                     interpret: bool = False) -> RaceState:
    """Run one control step's firmware window through the kernel."""
    agents = spec.num_drones
    S, W = pack_blocks(state, agents)
    kf, km, arm, ground_z = _model_scalars(spec)
    S = pallas_race.race_window(
        kf, km, arm, ground_z,
        S, W, n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
        interpret=interpret,
    )
    state = unpack_blocks(S, state, agents)
    return state._replace(
        step_counter=state.step_counter + spec.steps_per_ctrl
    )


def race_step_fast(spec: RaceSpec, track: RaceTrack, state: RaceState,
                   cmd_ids, cmd_args, interpret: bool = False):
    """Drop-in replacement for race.race_step on supported configs."""
    assert supports(spec), "unsupported config for the pallas race path"
    state = race_mod.process_commands(spec, state, cmd_ids, cmd_args)
    state = race_window_fast(spec, state, interpret=interpret)
    return race_mod.finish_ctrl_step(spec, track, state)


def batched_race_step_fast(spec: RaceSpec, track: RaceTrack, bstate,
                           cmd_ids, cmd_args, interpret: bool = False):
    """Vmapped-batch fast race step: (B, N)-leaved RaceState batch, one
    kernel launch for all B*N agents.

    cmd_ids: (B, N) int32; cmd_args: (B, N, ARGS_DIM).
    Returns the same tuple as `race.race_step`, batched on axis 0.
    """
    B = cmd_ids.shape[0]
    n = spec.num_drones

    bstate = jax.vmap(
        lambda s, i, a: race_mod.process_commands(spec, s, i, a)
    )(bstate, cmd_ids, cmd_args)

    # flatten the per-agent leaves (B, N, ...) -> (B*N, ...); track-level
    # leaves (gates, obstacles, counters) are untouched by the window
    def flat(x):
        return x.reshape((B * n,) + x.shape[2:])

    per_agent = bstate._replace(
        phys=jax.tree_util.tree_map(flat, bstate.phys),
        rpms=flat(bstate.rpms),
        prev_rpms=flat(bstate.prev_rpms),
        mell=jax.tree_util.tree_map(flat, bstate.mell),
        cmdr=jax.tree_util.tree_map(flat, bstate.cmdr),
        eliminated=flat(bstate.eliminated),
        drone=bstate.drone._replace(
            mass=flat(bstate.drone.mass), J=flat(bstate.drone.J)
        ),
    )
    agents = B * n
    S, W = pack_blocks(per_agent, agents)
    kf, km, arm, ground_z = _model_scalars(spec)
    S = pallas_race.race_window(
        kf, km, arm, ground_z,
        S, W, n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
        interpret=interpret,
    )
    per_agent = unpack_blocks(S, per_agent, agents)

    def unflat(x):
        return x.reshape((B, n) + x.shape[1:])

    bstate = bstate._replace(
        phys=jax.tree_util.tree_map(unflat, per_agent.phys),
        rpms=unflat(per_agent.rpms),
        prev_rpms=unflat(per_agent.prev_rpms),
        mell=jax.tree_util.tree_map(unflat, per_agent.mell),
        step_counter=bstate.step_counter + spec.steps_per_ctrl,
    )
    return jax.vmap(
        lambda s: race_mod.finish_ctrl_step(spec, track, s)
    )(bstate)
