"""DSL cascaded PID controller as a pure JAX function.

Numerics-faithful re-derivation of the reference's ``DSLPIDControl``
(reference control/DSLPIDControl.py:19-259): position PID -> target attitude
-> attitude PID -> mixer -> PWM -> RPM, with the controller's mutable members
(``integral_pos_e``, ``integral_rpy_e``, ``last_rpy``) lifted into an explicit
state pytree so the controller vmaps over drones and envs and lives inside
the jitted env step (the reference instantiates one stateful object per drone,
BaseRLAviary.py:73-78).
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import quat as quat_ops
from gym_pybullet_adrp_tpu.utils.enums import DroneModel
from gym_pybullet_adrp_tpu.models.drone import DroneParams

# gains and PWM constants, reference DSLPIDControl.py:37-46
P_FOR = np.array([0.4, 0.4, 1.25])
I_FOR = np.array([0.05, 0.05, 0.05])
D_FOR = np.array([0.2, 0.2, 0.5])
P_TOR = np.array([70000.0, 70000.0, 60000.0])
I_TOR = np.array([0.0, 0.0, 500.0])
D_TOR = np.array([20000.0, 20000.0, 12000.0])
PWM2RPM_SCALE = 0.2685
PWM2RPM_CONST = 4070.3
MIN_PWM = 20000.0
MAX_PWM = 65535.0

# Mixer matrices. NOTE(fixed reference defect): the reference ships the
# upstream gym-pybullet-drones mixer (DSLPIDControl.py:48-53), which matches
# the *original* cf2x.urdf propeller layout — but its CF2X model is
# cf2x_IROS.urdf whose props are rotated one slot (prop0 at (+x,+y) instead
# of (+x,-y)), silently inverting the roll/pitch/yaw channels; the PID-based
# envs were unstable in the reference. MIXER_X below is re-derived for the
# IROS layout (prop i at [(+,+), (-,+), (-,-), (+,-)]·L/√2, z-torque
# +t0-t1+t2-t3 per BaseAviary._physics:700-703), so positive requested
# torques produce positive physical torques. MIXER_X_LEGACY preserves the
# reference matrix for the original layout.
MIXER_X = np.array([
    [0.5, -0.5, 1.0],
    [0.5, 0.5, -1.0],
    [-0.5, 0.5, 1.0],
    [-0.5, -0.5, -1.0],
])
MIXER_X_LEGACY = np.array([
    [-0.5, -0.5, -1.0],
    [-0.5, 0.5, 1.0],
    [0.5, 0.5, -1.0],
    [0.5, -0.5, 1.0],
])
MIXER_P = np.array([
    [0.0, -1.0, -1.0],
    [1.0, 0.0, 1.0],
    [0.0, 1.0, -1.0],
    [-1.0, 0.0, 1.0],
])


class PIDState(NamedTuple):
    """Per-drone controller state (reference DSLPIDControl.reset:65-78)."""

    last_rpy: jnp.ndarray        # (..., 3)
    integral_pos_e: jnp.ndarray  # (..., 3)
    integral_rpy_e: jnp.ndarray  # (..., 3)


def init_state(shape=(), dtype=jnp.float32) -> PIDState:
    z = jnp.zeros(shape + (3,), dtype=dtype)
    return PIDState(last_rpy=z, integral_pos_e=z, integral_rpy_e=z)


def compute_control(
    params: DroneParams,
    ctl: PIDState,
    control_timestep,
    cur_pos,
    cur_quat,
    cur_vel,
    target_pos,
    target_rpy=None,
    target_vel=None,
    target_rpy_rates=None,
    model: DroneModel = DroneModel.CF2X,
):
    """One PID control step. Broadcasts over leading axes.

    Returns (rpm (...,4), new_state, pos_err (...,3), yaw_err (...)).
    Mirrors DSLPIDControl.computeControl:82-145.
    """
    dtype = cur_pos.dtype
    if target_rpy is None:
        target_rpy = jnp.zeros_like(cur_pos)
    if target_vel is None:
        target_vel = jnp.zeros_like(cur_pos)
    if target_rpy_rates is None:
        target_rpy_rates = jnp.zeros_like(cur_pos)

    # ---- position control (reference :149-208) ----------------------------
    cur_rotation = quat_ops.to_matrix(cur_quat)
    pos_e = target_pos - cur_pos
    vel_e = target_vel - cur_vel
    integral_pos_e = ctl.integral_pos_e + pos_e * control_timestep
    integral_pos_e = jnp.clip(integral_pos_e, -2.0, 2.0)
    integral_pos_e = integral_pos_e.at[..., 2].set(
        jnp.clip(integral_pos_e[..., 2], -0.15, 0.15)
    )
    g_vec = jnp.zeros_like(pos_e).at[..., 2].set(
        jnp.broadcast_to(params.gravity, pos_e[..., 2].shape)
    )
    target_thrust = (
        P_FOR.astype(dtype) * pos_e
        + I_FOR.astype(dtype) * integral_pos_e
        + D_FOR.astype(dtype) * vel_e
        + g_vec
    )
    scalar_thrust = jnp.maximum(
        0.0, jnp.sum(target_thrust * cur_rotation[..., :, 2], axis=-1)
    )
    thrust = (
        jnp.sqrt(scalar_thrust / (4.0 * params.kf)) - PWM2RPM_CONST
    ) / PWM2RPM_SCALE
    target_z_ax = target_thrust / jnp.linalg.norm(
        target_thrust, axis=-1, keepdims=True
    )
    yaw = target_rpy[..., 2]
    target_x_c = jnp.stack(
        [jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], axis=-1
    )
    y_cross = jnp.cross(target_z_ax, target_x_c)
    target_y_ax = y_cross / jnp.linalg.norm(y_cross, axis=-1, keepdims=True)
    target_x_ax = jnp.cross(target_y_ax, target_z_ax)
    # rows are the target axes; the rotation matrix is their transpose
    target_rotation = jnp.stack(
        [target_x_ax, target_y_ax, target_z_ax], axis=-1
    )  # == vstack(...).T
    target_euler = quat_ops.to_euler_intrinsic_xyz(
        quat_ops.from_matrix(target_rotation)
    )

    # ---- attitude control (reference :212-259) ----------------------------
    cur_rpy = quat_ops.to_euler_xyz(cur_quat)
    target_quat = quat_ops.from_euler_intrinsic_xyz(target_euler)
    # NOTE(reference quirk, DSLPIDControl.py:243-244): scipy returns xyzw but
    # the reference unpacks it as `w,x,y,z = target_quat` and rebuilds
    # Rotation.from_quat([w,x,y,z]); the two errors cancel and
    # target_rotation is recovered exactly — equivalent to using
    # target_rotation directly, which we do.
    w_rot = target_rotation
    rot_matrix_e = (
        jnp.swapaxes(w_rot, -1, -2) @ cur_rotation
        - jnp.swapaxes(cur_rotation, -1, -2) @ w_rot
    )
    rot_e = jnp.stack(
        [rot_matrix_e[..., 2, 1], rot_matrix_e[..., 0, 2], rot_matrix_e[..., 1, 0]],
        axis=-1,
    )
    rpy_rates_e = target_rpy_rates - (cur_rpy - ctl.last_rpy) / control_timestep
    integral_rpy_e = ctl.integral_rpy_e - rot_e * control_timestep
    integral_rpy_e = jnp.clip(integral_rpy_e, -1500.0, 1500.0)
    integral_rpy_e = integral_rpy_e.at[..., :2].set(
        jnp.clip(integral_rpy_e[..., :2], -1.0, 1.0)
    )
    target_torques = (
        -P_TOR.astype(dtype) * rot_e
        + D_TOR.astype(dtype) * rpy_rates_e
        + I_TOR.astype(dtype) * integral_rpy_e
    )
    target_torques = jnp.clip(target_torques, -3200.0, 3200.0)
    mixer = MIXER_P if model == DroneModel.CF2P else MIXER_X
    pwm = thrust[..., None] + target_torques @ mixer.astype(dtype).T
    pwm = jnp.clip(pwm, MIN_PWM, MAX_PWM)
    rpm = PWM2RPM_SCALE * pwm + PWM2RPM_CONST

    new_state = PIDState(
        last_rpy=cur_rpy,
        integral_pos_e=integral_pos_e,
        integral_rpy_e=integral_rpy_e,
    )
    yaw_err = target_euler[..., 2] - cur_rpy[..., 2]
    return rpm, new_state, pos_e, yaw_err


def one23d_interface(params: DroneParams, thrust):
    """1/2/4-D thrust -> per-motor PWM (reference _one23DInterface:263-287)."""
    thrust = jnp.atleast_1d(thrust)
    dim = thrust.shape[-1]
    pwm = jnp.clip(
        (jnp.sqrt(thrust / (params.kf * (4.0 / dim))) - PWM2RPM_CONST)
        / PWM2RPM_SCALE,
        MIN_PWM,
        MAX_PWM,
    )
    if dim == 1:
        return jnp.repeat(pwm, 4, axis=-1)
    if dim == 2:
        return jnp.concatenate([pwm, jnp.flip(pwm, axis=-1)], axis=-1)
    return pwm
