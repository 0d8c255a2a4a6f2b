"""Collective-thrust / body-rates control.

Two pieces, both pure JAX:

* ``position_to_ctbr`` — the reference's ``CTBRControl.computeControl``
  (reference control/CTBRControl.py:103-168): PD position loop -> desired
  force -> target attitude quaternion -> body-rate command.
* ``rate_loop_rpm`` — an in-graph body-rate P controller + X-mixer standing
  in for the Betaflight SITL rate loop the reference runs as external C
  processes over UDP (reference envs/BetaAviary.py:86-170; SURVEY §2.2 maps
  this to an in-graph CTBR pathway).
"""

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.models.drone import DroneParams
from gym_pybullet_adrp_tpu.ops import quat as quat_ops

# position loop gains (reference CTBRControl.py:149-152)
K_P = np.array([3.0, 3.0, 8.0])
K_D = np.array([2.5, 2.5, 5.0])
K_RATES = np.array([5.0, 5.0, 1.0])
G_VEC = np.array([0.0, 0.0, -9.8])


def position_to_ctbr(cur_pos, cur_quat, cur_vel, target_pos,
                     target_vel=None):
    """PD position loop -> (normalized thrust (...,), body rates (..., 3)).

    cur_quat is xyzw (the reference converts the state quat to wxyz before
    calling; this takes the framework-native xyzw directly).
    Mirrors CTBRControl.computeControl:149-168.
    """
    dtype = cur_pos.dtype
    if target_vel is None:
        target_vel = jnp.zeros_like(cur_pos)
    P = target_pos - cur_pos
    D = target_vel - cur_vel
    tar_acc = K_P.astype(dtype) * P + K_D.astype(dtype) * D - G_VEC.astype(dtype)
    z_body_world = quat_ops.rotate(
        cur_quat, jnp.zeros_like(cur_pos).at[..., 2].set(1.0)
    )
    norm_thrust = jnp.sum(tar_acc * z_body_world, axis=-1)

    # target attitude from the desired acceleration direction
    z_b = tar_acc / jnp.maximum(
        jnp.linalg.norm(tar_acc, axis=-1, keepdims=True), 1e-12
    )
    y_ref = jnp.zeros_like(cur_pos).at[..., 1].set(1.0)
    x_b = jnp.cross(y_ref, z_b)
    x_b = x_b / jnp.maximum(jnp.linalg.norm(x_b, axis=-1, keepdims=True), 1e-12)
    y_b = jnp.cross(z_b, x_b)
    y_b = y_b / jnp.maximum(jnp.linalg.norm(y_b, axis=-1, keepdims=True), 1e-12)
    tar_rot = jnp.stack([x_b, y_b, z_b], axis=-1)
    tar_att = quat_ops.from_matrix(tar_rot)

    # body rates from the attitude error quaternion (reference :163-166)
    q_err = quat_ops.multiply(quat_ops.conjugate(cur_quat), tar_att)
    body_rates = 2.0 * K_RATES.astype(dtype) * q_err[..., :3]
    body_rates = jnp.where(q_err[..., 3:4] < 0, -body_rates, body_rates)
    return norm_thrust, body_rates


def betaflight_motor_outputs(params: DroneParams, thrust_norm, rate_sp,
                             omega_body, time_constant=0.02):
    """In-graph Betaflight-SITL stand-in: rate loop -> NORMALIZED motor
    outputs ``u`` in [0, 1], packed in the SITL servo-packet motor order.

    The reference's external SITL processes answer each RC/FDM exchange
    with 4 float motor outputs in [0, 1] (reference BetaAviary.py:162-170)
    which ``_preprocessAction`` then remaps ``[2,1,3,0]`` and converts via
    ``rpm = sqrt(MAX_THRUST/4/KF * u)`` (:239-267). This emulation emits
    its per-motor thrust fractions pre-permuted with the INVERSE of that
    remap, so the faithful `_preprocessAction` chain recovers the IROS
    motor order end-to-end.
    """
    forces = _rate_loop_forces(params, thrust_norm, rate_sp, omega_body,
                               time_constant)
    u = jnp.clip(forces / (params.max_thrust[..., None] / 4.0), 0.0, 1.0)
    # inverse of the [2,1,3,0] remap: u_sitl = [f3, f1, f0, f2]
    return u[..., jnp.asarray([3, 1, 0, 2])]


def _rate_loop_forces(params: DroneParams, thrust_norm, rate_sp, omega_body,
                      time_constant=0.02):
    """Shared rate-law core: per-motor thrusts (IROS order), unclipped top."""
    dtype = thrust_norm.dtype
    total_thrust = jnp.clip(thrust_norm * params.mass, 0.0, params.max_thrust)
    tau = params.J * (rate_sp - omega_body) / jnp.asarray(time_constant, dtype=dtype)
    L = params.arm / jnp.sqrt(jnp.asarray(2.0, dtype=dtype))
    f = total_thrust / 4.0
    # invert the IROS X layout: tx = (f0+f1-f2-f3)L', ty = (-f0+f1+f2-f3)L',
    # tz = (t0-t1+t2-t3) with t = (km/kf)·f
    ktz = params.km / params.kf
    d_roll = tau[..., 0] / (4.0 * L)
    d_pitch = tau[..., 1] / (4.0 * L)
    d_yaw = tau[..., 2] / (4.0 * ktz)
    f0 = f + d_roll - d_pitch + d_yaw
    f1 = f + d_roll + d_pitch - d_yaw
    f2 = f - d_roll + d_pitch + d_yaw
    f3 = f - d_roll - d_pitch - d_yaw
    return jnp.clip(jnp.stack([f0, f1, f2, f3], axis=-1), 0.0, None)


def rate_loop_rpm(params: DroneParams, thrust_norm, rate_sp, omega_body,
                  time_constant=0.02):
    """Body-rate P loop + X mixer -> per-motor rpm.

    thrust_norm: (...,) desired specific thrust (m/s^2, along body z);
    rate_sp / omega_body: (..., 3) rad/s. Torque demand
    tau = J (sp - w) / tc (first-order rate tracking with the given time
    constant) is mixed with the IROS X geometry and converted per-motor
    thrust -> rpm via F = kf·rpm². Replaces the Betaflight rate PID running
    in external SITL processes.
    """
    forces = _rate_loop_forces(params, thrust_norm, rate_sp, omega_body,
                               time_constant)
    rpm = jnp.sqrt(forces / params.kf[..., None])
    return jnp.clip(rpm, 0.0, params.max_rpm[..., None])
