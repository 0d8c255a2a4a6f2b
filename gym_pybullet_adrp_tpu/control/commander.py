"""High-level commander: in-graph command state machine + poly7 planner.

TPU-native replacement for the Crazyflie firmware's high-level commander
(`crtpCommanderHighLevel*` + planner.c + pptraj.c), which the reference
drives through SWIG from a subprocess (reference control/MellingerControl.py:
292-303, 545-699). Takeoff/Land/GoTo plan a single 7th-order polynomial
segment per axis (x, y, z, yaw) with zero jerk at both ends — the firmware's
``piecewise_plan_7th_order_no_jerk`` — and the command dispatch is a
``lax.switch`` over integer command ids, so the whole command protocol lives
inside the jitted env step.

Command encoding (``Command`` id + float args vector, see ``pack_*``):
FULLSTATE args: [pos(3), vel(3), acc(3), yaw, rpy_rates(3), timestep]
TAKEOFF/LAND: [height, duration]; +YAW variants: [height, duration, yaw]
+VEL variants: [height, speed, relative]; GOTO: [pos(3), yaw, duration, relative]
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.control.mellinger import (
    MODE_ABS, MODE_DISABLE, Setpoint, zero_setpoint,
)
from gym_pybullet_adrp_tpu.ops import quat as quat_ops
from gym_pybullet_adrp_tpu.utils.constants import RAD_TO_DEG
from gym_pybullet_adrp_tpu.utils.enums import Command

ARGS_DIM = 14

# ---------------------------------------------------------------------------
# poly7 "no jerk" segment: boundary conditions
# p(0)=x0 p'(0)=v0 p''(0)=a0 p'''(0)=0 ; p(T)=xf p'(T)=vf p''(T)=af p'''(T)=0
# solved in normalized time s = t/T with a precomputed 8x8 inverse.


def _basis_inverse() -> np.ndarray:
    A = np.zeros((8, 8))
    # s = 0 conditions
    A[0, 0] = 1.0                       # p(0)
    A[1, 1] = 1.0                       # p'(0)
    A[2, 2] = 2.0                       # p''(0)
    A[3, 3] = 6.0                       # p'''(0)
    # s = 1 conditions
    for i in range(8):
        A[4, i] = 1.0                   # p(1)
        A[5, i] = i                     # p'(1)
        A[6, i] = i * (i - 1)           # p''(1)
        A[7, i] = i * (i - 1) * (i - 2)  # p'''(1)
    return np.linalg.inv(A)


_BASIS_INV = _basis_inverse()


def plan_poly7(x0, v0, a0, xf, vf, af, T):
    """Coefficients (..., C, 8) in normalized time for C channels.

    All of x0..af are (..., C); T is (...,). T<=0 degenerates to the constant
    xf (firmware pptraj.c poly7_nojerk T<=0 branch).
    """
    dtype = x0.dtype
    T = T[..., None]
    safe_T = jnp.where(T > 0, T, 1.0)
    b = jnp.stack(
        [
            x0,
            v0 * safe_T,
            a0 * safe_T**2,
            jnp.zeros_like(x0),
            xf,
            vf * safe_T,
            af * safe_T**2,
            jnp.zeros_like(x0),
        ],
        axis=-1,
    )  # (..., C, 8)
    coeffs = b @ jnp.asarray(_BASIS_INV, dtype=dtype).T
    const = jnp.zeros_like(coeffs).at[..., 0].set(xf)
    return jnp.where(T[..., None] > 0, coeffs, const)


def eval_poly7(coeffs, t_rel, T):
    """Evaluate position/velocity/acceleration at t_rel (clamped to [0, T]).

    coeffs: (..., C, 8); t_rel, T: (...,). Returns (pos, vel, acc) each
    (..., C). Beyond T the end state holds (end velocity is 0 by
    construction, so this is the firmware's post-trajectory hover).
    """
    dtype = coeffs.dtype
    safe_T = jnp.where(T > 0, T, 1.0)
    s = jnp.clip(t_rel / safe_T, 0.0, 1.0)[..., None]
    i = jnp.arange(8, dtype=dtype)
    powers = s ** i                                  # (..., 8)
    dpow = i * s ** jnp.maximum(i - 1, 0)
    ddpow = i * (i - 1) * s ** jnp.maximum(i - 2, 0)
    pos = jnp.einsum("...ck,...k->...c", coeffs, powers)
    vel = jnp.einsum("...ck,...k->...c", coeffs, dpow) / safe_T[..., None]
    acc = jnp.einsum("...ck,...k->...c", coeffs, ddpow) / safe_T[..., None] ** 2
    return pos, vel, acc


# ---------------------------------------------------------------------------
# commander state


class CommanderState(NamedTuple):
    """Per-drone commander + planner state (pytree)."""

    setpoint: Setpoint
    full_state_override: jnp.ndarray  # (...,) bool (reference :137, 543)
    planner_active: jnp.ndarray       # (...,) bool: a trajectory is planned
    coeffs: jnp.ndarray               # (..., 4, 8) channels x,y,z,yaw
    t_begin: jnp.ndarray              # (...,) s
    duration: jnp.ndarray             # (...,) s


def init_state(shape=(), dtype=jnp.float32) -> CommanderState:
    return CommanderState(
        setpoint=zero_setpoint(shape, dtype=dtype),
        full_state_override=jnp.ones(shape, dtype=bool),  # reference :137
        planner_active=jnp.zeros(shape, dtype=bool),
        coeffs=jnp.zeros(shape + (4, 8), dtype=dtype),
        t_begin=jnp.zeros(shape, dtype=dtype),
        duration=jnp.zeros(shape, dtype=dtype),
    )


# ---------------------------------------------------------------------------
# command packing (host-side helpers, mirror Command.* arg lists of the
# reference user-controller protocol, MellingerControl.py:491-699)


def pack_command(cmd: Command, args=()) -> tuple:
    """-> (cmd_id, args_vec float32[ARGS_DIM]) for feeding the jitted step."""
    vec = np.zeros(ARGS_DIM, dtype=np.float32)
    if cmd == Command.FULLSTATE:
        pos, vel, acc, yaw, rpy_rate, timestep = args
        vec[0:3] = np.asarray(pos, dtype=np.float32)
        vec[3:6] = np.asarray(vel, dtype=np.float32)
        vec[6:9] = np.asarray(acc, dtype=np.float32)
        vec[9] = float(yaw)
        vec[10:13] = np.asarray(rpy_rate, dtype=np.float32)
        vec[13] = float(timestep)
    elif cmd in (Command.TAKEOFF, Command.LAND):
        vec[0], vec[1] = float(args[0]), float(args[1])
    elif cmd in (Command.TAKEOFFYAW, Command.LANDYAW):
        vec[0], vec[1], vec[2] = float(args[0]), float(args[1]), float(args[2])
    elif cmd in (Command.TAKEOFFVEL, Command.LANDVEL):
        vec[0], vec[1], vec[2] = (
            float(args[0]), float(args[1]), float(bool(args[2])),
        )
    elif cmd == Command.GOTO:
        pos, yaw, duration, relative = args
        vec[0:3] = np.asarray(pos, dtype=np.float32)
        vec[3] = float(yaw)
        vec[4] = float(duration)
        vec[5] = float(bool(relative))
    return int(cmd), vec


# ---------------------------------------------------------------------------
# command execution (in-graph)


def _plan(cur_pos, cur_vel, cur_acc, cur_yaw, target_pos, target_yaw,
          duration, t):
    """Plan a 7th-order segment from the current state to a hover point."""
    x0 = jnp.concatenate([cur_pos, cur_yaw[..., None]], axis=-1)
    v0 = jnp.concatenate([cur_vel, jnp.zeros_like(cur_yaw)[..., None]], axis=-1)
    a0 = jnp.concatenate([cur_acc, jnp.zeros_like(cur_yaw)[..., None]], axis=-1)
    xf = jnp.concatenate([target_pos, target_yaw[..., None]], axis=-1)
    zf = jnp.zeros_like(xf)
    return plan_poly7(x0, v0, a0, xf, zf, zf, duration)


def process_command(state: CommanderState, cmd_id, args, sim_time,
                    cur_pos, cur_vel, cur_yaw):
    """Execute one queued command (reference process_command_queue:292-303 +
    the per-command senders :491-699), branchless via masks.

    cmd_id: (...,) int32; args: (..., ARGS_DIM). Current kinematics feed the
    planner exactly as the wrapper's TellState plumbing does. Takeoff/land
    plan with zero start velocity (firmware plan_takeoff_or_landing); goto
    plans from the current motion state (firmware plan_go_to).
    """
    dtype = cur_pos.dtype
    sim_time = jnp.broadcast_to(jnp.asarray(sim_time, dtype=dtype), cmd_id.shape)
    zero3 = jnp.zeros_like(cur_pos)

    is_fullstate = cmd_id == Command.FULLSTATE
    is_takeoff = (
        (cmd_id == Command.TAKEOFF)
        | (cmd_id == Command.TAKEOFFYAW)
        | (cmd_id == Command.TAKEOFFVEL)
    )
    is_land = (
        (cmd_id == Command.LAND)
        | (cmd_id == Command.LANDYAW)
        | (cmd_id == Command.LANDVEL)
    )
    is_goto = cmd_id == Command.GOTO
    is_stop = cmd_id == Command.STOP
    is_notify = cmd_id == Command.NOTIFY
    plans = is_takeoff | is_land | is_goto
    any_cmd = plans | is_fullstate | is_stop | is_notify

    # --- FULLSTATE (reference _sendFullStateCmd:510-543) -------------------
    sp = state.setpoint
    fs_pos = args[..., 0:3]
    fs_vel = args[..., 3:6]
    fs_acc = args[..., 6:9]
    fs_yaw = args[..., 9]
    fs_rate_deg = args[..., 10:13] * RAD_TO_DEG
    fs_quat = quat_ops.from_euler_xyz(
        jnp.stack([jnp.zeros_like(fs_yaw), jnp.zeros_like(fs_yaw), fs_yaw], -1)
    )

    # --- planned trajectories ----------------------------------------------
    height = args[..., 0]
    duration_arg = args[..., 1]
    yaw_arg_tl = args[..., 2]       # TAKEOFFYAW / LANDYAW
    speed = args[..., 1]            # *VEL variants
    relative_tl = args[..., 2] > 0.5

    is_yawed = (cmd_id == Command.TAKEOFFYAW) | (cmd_id == Command.LANDYAW)
    is_vel_cmd = (cmd_id == Command.TAKEOFFVEL) | (cmd_id == Command.LANDVEL)

    tl_height = jnp.where(
        is_vel_cmd & relative_tl, cur_pos[..., 2] + height, height
    )
    tl_duration = jnp.where(
        is_vel_cmd,
        jnp.abs(tl_height - cur_pos[..., 2]) / jnp.maximum(jnp.abs(speed), 1e-6),
        duration_arg,
    )
    tl_target = jnp.concatenate(
        [cur_pos[..., :2], tl_height[..., None]], axis=-1
    )
    tl_yaw = jnp.where(is_yawed, yaw_arg_tl, cur_yaw)

    goto_rel = args[..., 5] > 0.5
    goto_target = jnp.where(
        goto_rel[..., None], cur_pos + args[..., 0:3], args[..., 0:3]
    )
    goto_yaw = jnp.where(goto_rel, cur_yaw + args[..., 3], args[..., 3])
    goto_duration = args[..., 4]

    target_pos = jnp.where(is_goto[..., None], goto_target, tl_target)
    target_yaw = jnp.where(is_goto, goto_yaw, tl_yaw)
    duration = jnp.where(is_goto, goto_duration, tl_duration)
    # takeoff/land start from rest (plan_takeoff_or_landing uses vzero());
    # goto starts from the current motion state (plan_go_to)
    v0 = jnp.where(is_goto[..., None], cur_vel, zero3)
    new_coeffs = _plan(
        cur_pos, v0, zero3, cur_yaw, target_pos, target_yaw, duration, sim_time
    )

    def mask(cond, new, old):
        c = jnp.reshape(cond, cond.shape + (1,) * (new.ndim - cond.ndim))
        return jnp.where(c, new, old)

    new_setpoint = Setpoint(
        pos=mask(is_fullstate, fs_pos, sp.pos),
        vel=mask(is_fullstate, fs_vel, sp.vel),
        acc=mask(is_fullstate, fs_acc, sp.acc),
        att_rpy=sp.att_rpy,
        att_rate=mask(is_fullstate, fs_rate_deg, sp.att_rate),
        att_quat=mask(is_fullstate, fs_quat, sp.att_quat),
        thrust=jnp.where(is_stop, jnp.zeros_like(sp.thrust), sp.thrust),
        mode_xyz=mask(
            is_fullstate,
            jnp.full_like(sp.mode_xyz, MODE_ABS),
            mask(is_stop, jnp.full_like(sp.mode_xyz, MODE_DISABLE), sp.mode_xyz),
        ),
        mode_rpy=mask(
            is_fullstate, jnp.full_like(sp.mode_rpy, MODE_DISABLE), sp.mode_rpy
        ),
        mode_quat=jnp.where(
            is_fullstate, jnp.full_like(sp.mode_quat, MODE_ABS),
            jnp.where(is_stop, jnp.full_like(sp.mode_quat, MODE_DISABLE),
                      sp.mode_quat),
        ),
    )

    return CommanderState(
        setpoint=new_setpoint,
        # any non-FULLSTATE command hands control to the high-level commander
        # (reference sets full_state_cmd_override=False in every _send*Cmd)
        full_state_override=jnp.where(
            is_fullstate, True,
            jnp.where(any_cmd & ~is_fullstate, False, state.full_state_override),
        ),
        # process_command_queue stops the planner before executing
        # (reference :298); STOP leaves it stopped
        planner_active=jnp.where(plans, True,
                                 jnp.where(any_cmd, False, state.planner_active)),
        coeffs=mask(plans, new_coeffs, state.coeffs),
        t_begin=jnp.where(plans, sim_time, state.t_begin),
        duration=jnp.where(plans, duration, state.duration),
    )


def update_setpoint(state: CommanderState, sim_time) -> CommanderState:
    """Per-tick setpoint refresh from the planner when the high-level
    commander is in control (reference _update_setpoint:369-374 +
    crtpCommanderHighLevelGetSetpoint).
    """
    sp = state.setpoint
    dtype = sp.pos.dtype
    t_rel = jnp.asarray(sim_time, dtype=dtype) - state.t_begin
    pos4, vel4, acc4 = eval_poly7(state.coeffs, t_rel, state.duration)
    use = ~state.full_state_override & state.planner_active

    def mask(new, old):
        c = jnp.reshape(use, use.shape + (1,) * (new.ndim - use.ndim))
        return jnp.where(c, new, old)

    yaw_deg = pos4[..., 3] * RAD_TO_DEG
    att_rpy = jnp.stack(
        [jnp.zeros_like(yaw_deg), jnp.zeros_like(yaw_deg), yaw_deg], axis=-1
    )
    rate_deg = jnp.stack(
        [
            jnp.zeros_like(yaw_deg),
            jnp.zeros_like(yaw_deg),
            vel4[..., 3] * RAD_TO_DEG,
        ],
        axis=-1,
    )
    new_setpoint = Setpoint(
        pos=mask(pos4[..., :3], sp.pos),
        vel=mask(vel4[..., :3], sp.vel),
        acc=mask(acc4[..., :3], sp.acc),
        att_rpy=mask(att_rpy, sp.att_rpy),
        att_rate=mask(rate_deg, sp.att_rate),
        att_quat=sp.att_quat,
        thrust=sp.thrust,
        mode_xyz=mask(jnp.full_like(sp.mode_xyz, MODE_ABS), sp.mode_xyz),
        # GetSetpoint: yaw modeAbs, roll/pitch modeDisable, quat modeDisable
        mode_rpy=mask(
            jnp.concatenate(
                [
                    jnp.full_like(sp.mode_rpy[..., :2], MODE_DISABLE),
                    jnp.full_like(sp.mode_rpy[..., 2:], MODE_ABS),
                ],
                axis=-1,
            ),
            sp.mode_rpy,
        ),
        mode_quat=jnp.where(
            use, jnp.full_like(sp.mode_quat, MODE_DISABLE), sp.mode_quat
        ),
    )
    return state._replace(setpoint=new_setpoint)
