"""Crazyflie Mellinger firmware controller as pure JAX.

Re-implements the control law of ``controllerMellinger`` from the Bitcraze
crazyflie-firmware (the C code the reference drives through SWIG bindings in
a subprocess per drone — reference control/MellingerControl.py:17-61, 413;
CFAviary.py:410) together with the surrounding firmware-wrapper plumbing:

* 2-pole (biquad) low-pass sensor filters ``lpf2pInit/lpf2pApply``
  (reference MellingerControl.py:113-117, 359-360),
* the 500 Hz tick gating that slows the 1000 Hz firmware loop
  (reference ``_step_controller``, MellingerControl.py:378-419),
* tumble detection (acc.z < -0.5 for 30 ticks kills motors,
  reference :383-391),
* the PWM power-distribution + brushed-motor voltage curve
  (reference ``_compute_pwms``, :423-442),
* the IROS-URDF propeller reorder [3,2,1,0] and thrust-space disturbance
  injection of ``computeControl`` (reference :244-262).

All state lives in explicit pytrees (no C globals), so one drone's controller
vmaps to N drones and to thousands of envs — dissolving the
subprocess-per-drone architecture (reference MultiRaceAviary.py:107-115) and
its one-trainable-agent limitation (reference README.md:12).
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import quat as quat_ops
from gym_pybullet_adrp_tpu.utils.constants import (
    ACCEL_LPF_CUTOFF_FREQ, FIRMWARE_DT, FIRMWARE_FREQ, GYRO_LPF_CUTOFF_FREQ,
    MAX_PWM, MIN_PWM, PWM2RPM_CONST, PWM2RPM_SCALE, RAD_TO_DEG, DEG_TO_RAD,
    SENSOR_DELAY, SUPPLY_VOLTAGE,
)

# ---------------------------------------------------------------------------
# firmware gains (crazyflie-firmware controller_mellinger.c defaults)

GRAVITY_MAGNITUDE = 9.81  # firmware constant (differs from the sim's 9.8)
MASS = 0.032              # g_vehicleMass
MASS_THRUST = 132000.0

KP_XY = 0.4
KD_XY = 0.2
KI_XY = 0.05
I_RANGE_XY = 2.0

KP_Z = 1.25
KD_Z = 0.4
KI_Z = 0.05
I_RANGE_Z = 0.4

KR_XY = 70000.0
KW_XY = 20000.0
KI_M_XY = 0.0
I_RANGE_M_XY = 1.0

KR_Z = 60000.0
KW_Z = 12000.0
KI_M_Z = 500.0
I_RANGE_M_Z = 1500.0

KD_OMEGA_RP = 200.0

# setpoint mode flags (firmware stabilizer_types.h)
MODE_DISABLE = 0
MODE_ABS = 1
MODE_VELOCITY = 2


# ---------------------------------------------------------------------------
# biquad low-pass filter (firmware filter.c lpf2p)


class Lpf2pState(NamedTuple):
    """Delay elements of a 2-pole butterworth LPF, per channel (pytree)."""

    d1: jnp.ndarray
    d2: jnp.ndarray


def lpf2p_coeffs(sample_freq: float, cutoff_freq: float):
    """Static filter coefficients (firmware lpf2pInit/lpf2pSetCutoffFreq)."""
    fr = sample_freq / cutoff_freq
    ohm = np.tan(np.pi / fr)
    c = 1.0 + 2.0 * np.cos(np.pi / 4.0) * ohm + ohm * ohm
    b0 = ohm * ohm / c
    b1 = 2.0 * b0
    b2 = b0
    a1 = 2.0 * (ohm * ohm - 1.0) / c
    a2 = (1.0 - 2.0 * np.cos(np.pi / 4.0) * ohm + ohm * ohm) / c
    # plain Python floats: weakly typed under JAX promotion so the filter
    # never upcasts f32 state
    return float(b0), float(b1), float(b2), float(a1), float(a2)


def lpf2p_apply(coeffs, state: Lpf2pState, sample):
    """One filter step (firmware lpf2pApply). Broadcasts over channels."""
    b0, b1, b2, a1, a2 = coeffs
    d0 = sample - state.d1 * a1 - state.d2 * a2
    output = d0 * b0 + state.d1 * b1 + state.d2 * b2
    return Lpf2pState(d1=d0, d2=state.d1), output


# ---------------------------------------------------------------------------
# setpoint / firmware state structs as pytrees


class Setpoint(NamedTuple):
    """firmware setpoint_t subset used by the Mellinger controller."""

    pos: jnp.ndarray          # (..., 3)
    vel: jnp.ndarray          # (..., 3)
    acc: jnp.ndarray          # (..., 3)
    att_rpy: jnp.ndarray      # (..., 3) deg (attitude.roll/pitch/yaw)
    att_rate: jnp.ndarray     # (..., 3) deg/s
    att_quat: jnp.ndarray     # (..., 4) xyzw
    thrust: jnp.ndarray       # (...,)
    mode_xyz: jnp.ndarray     # (..., 3) int32 (MODE_*)
    mode_rpy: jnp.ndarray     # (..., 3) int32
    mode_quat: jnp.ndarray    # (...,) int32


def zero_setpoint(shape=(), dtype=jnp.float32) -> Setpoint:
    z3 = jnp.zeros(shape + (3,), dtype=dtype)
    return Setpoint(
        pos=z3, vel=z3, acc=z3, att_rpy=z3, att_rate=z3,
        att_quat=jnp.zeros(shape + (4,), dtype=dtype).at[..., 3].set(1.0),
        thrust=jnp.zeros(shape, dtype=dtype),
        mode_xyz=jnp.zeros(shape + (3,), dtype=jnp.int32),
        mode_rpy=jnp.zeros(shape + (3,), dtype=jnp.int32),
        mode_quat=jnp.zeros(shape, dtype=jnp.int32),
    )


class FirmwareState(NamedTuple):
    """firmware state_t subset: what `_update_state` fills
    (reference MellingerControl.py:446-471)."""

    pos: jnp.ndarray        # (..., 3) m
    vel: jnp.ndarray        # (..., 3) m/s
    acc: jnp.ndarray        # (..., 3) Gs, z without gravity
    rpy_deg: jnp.ndarray    # (..., 3) deg, legacy inverted pitch
    quat: jnp.ndarray       # (..., 4) xyzw


class MellingerState(NamedTuple):
    """Controller integrals + D-term memory (firmware statics) and wrapper
    bookkeeping, all explicit."""

    i_error_pos: jnp.ndarray      # (..., 3) position integral
    i_error_m: jnp.ndarray        # (..., 3) attitude moment integral
    prev_omega_rp: jnp.ndarray    # (..., 2) rad/s (roll, pitch rates)
    prev_setpoint_omega_rp: jnp.ndarray  # (..., 2)
    # last control outputs (held between gated ticks)
    control_rpyt: jnp.ndarray     # (..., 4) roll, pitch, yaw, thrust
    # wrapper state (reference MellingerControl.reset:99-150)
    tick: jnp.ndarray             # (...,) int32
    last_pos_pid_call: jnp.ndarray  # (...,) seconds
    last_att_pid_call: jnp.ndarray  # (...,)
    tumble_counter: jnp.ndarray   # (...,) int32
    error_flag: jnp.ndarray       # (...,) bool
    prev_rpy: jnp.ndarray         # (..., 3) rad (finite-diff rate estimation)
    prev_vel: jnp.ndarray         # (..., 3)
    acc_lpf: Lpf2pState           # (..., 3) channels
    gyro_lpf: Lpf2pState          # (..., 3)
    # hardware-latency emulation ring buffer (reference SENSOR_DELAY ring,
    # MellingerControl.py:109, 228-233): (..., SENSOR_DELAY, 6) of
    # [acc_body (3), gyro deg/s (3)], oldest first; length 0 when disabled
    sensor_history: jnp.ndarray


def init_state(shape=(), dtype=jnp.float32,
               sensor_delay: int = SENSOR_DELAY) -> MellingerState:
    z = lambda *d: jnp.zeros(shape + d, dtype=dtype)
    zi = jnp.zeros(shape, dtype=jnp.int32)
    return MellingerState(
        i_error_pos=z(3),
        i_error_m=z(3),
        prev_omega_rp=z(2),
        prev_setpoint_omega_rp=z(2),
        control_rpyt=z(4),
        tick=zi,
        last_pos_pid_call=jnp.zeros(shape, dtype=dtype),
        last_att_pid_call=jnp.zeros(shape, dtype=dtype),
        tumble_counter=zi,
        error_flag=jnp.zeros(shape, dtype=bool),
        prev_rpy=z(3),
        prev_vel=z(3),
        acc_lpf=Lpf2pState(d1=z(3), d2=z(3)),
        gyro_lpf=Lpf2pState(d1=z(3), d2=z(3)),
        sensor_history=z(sensor_delay, 6),
    )


# filter-assignment quirk preserved: the reference initializes the *accel*
# LPF with the GYRO cutoff and vice versa (MellingerControl.py:113-117)
_ACC_LPF_COEFFS = lpf2p_coeffs(FIRMWARE_FREQ, GYRO_LPF_CUTOFF_FREQ)
_GYRO_LPF_COEFFS = lpf2p_coeffs(FIRMWARE_FREQ, ACCEL_LPF_CUTOFF_FREQ)


# ---------------------------------------------------------------------------
# control law


def controller_mellinger(state: MellingerState, setpoint: Setpoint,
                         gyro_deg, fw_state: FirmwareState, run: jnp.ndarray):
    """One firmware control tick (controller_mellinger.c).

    ``gyro_deg``: LPF'd body rates in deg/s (sensorData.gyro). ``run`` is the
    tick gate — when False, outputs and integrals are held (the firmware's
    ``RATE_DO_EXECUTE`` early-return; the wrapper's _tick=1 case,
    reference MellingerControl.py:409-411).
    Returns (new_state, control_rpyt).
    """
    dt = jnp.asarray(1.0 / 500.0, dtype=fw_state.pos.dtype)  # ATTITUDE_RATE

    r_error = setpoint.pos - fw_state.pos
    v_error = setpoint.vel - fw_state.vel

    # position integral with per-axis clamps
    i_err = state.i_error_pos + r_error * dt
    i_err = jnp.stack(
        [
            jnp.clip(i_err[..., 0], -I_RANGE_XY, I_RANGE_XY),
            jnp.clip(i_err[..., 1], -I_RANGE_XY, I_RANGE_XY),
            jnp.clip(i_err[..., 2], -I_RANGE_Z, I_RANGE_Z),
        ],
        axis=-1,
    )

    pos_mode = setpoint.mode_xyz[..., 0] == MODE_ABS

    # desired force vector, position-control branch
    tf_x = (
        MASS * setpoint.acc[..., 0]
        + KP_XY * r_error[..., 0] + KD_XY * v_error[..., 0]
        + KI_XY * i_err[..., 0]
    )
    tf_y = (
        MASS * setpoint.acc[..., 1]
        + KP_XY * r_error[..., 1] + KD_XY * v_error[..., 1]
        + KI_XY * i_err[..., 1]
    )
    tf_z = (
        MASS * (setpoint.acc[..., 2] + GRAVITY_MAGNITUDE)
        + KP_Z * r_error[..., 2] + KD_Z * v_error[..., 2]
        + KI_Z * i_err[..., 2]
    )
    # attitude-only branch (setpoint attitude in deg). Firmware z: with
    # mode.z == modeAbs the altitude PID runs WITHOUT the acceleration
    # feedforward ("in case of a timeout ... ignore the last feedforward
    # term"); otherwise the desired-force z is the constant 1 (level
    # attitude direction), and the thrust output comes from
    # setpoint.thrust via the modeDisable branch below.
    alt_x = -jnp.sin(setpoint.att_rpy[..., 1] * DEG_TO_RAD)
    alt_y = -jnp.sin(setpoint.att_rpy[..., 0] * DEG_TO_RAD)
    alt_z = jnp.where(
        setpoint.mode_xyz[..., 2] == MODE_ABS,
        MASS * GRAVITY_MAGNITUDE
        + KP_Z * r_error[..., 2] + KD_Z * v_error[..., 2]
        + KI_Z * i_err[..., 2],
        jnp.ones_like(tf_z),
    )
    target_thrust = jnp.stack(
        [
            jnp.where(pos_mode, tf_x, alt_x),
            jnp.where(pos_mode, tf_y, alt_y),
            jnp.where(pos_mode, tf_z, alt_z),
        ],
        axis=-1,
    )

    # desired yaw (deg): modeVelocity -> integrate rate; modeAbs -> attitude;
    # else from the setpoint quaternion (FULLSTATE path)
    yaw_state = fw_state.rpy_deg[..., 2]
    yaw_vel = yaw_state + setpoint.att_rate[..., 2] * dt
    yaw_abs = setpoint.att_rpy[..., 2]
    yaw_quat = quat_ops.to_euler_xyz(setpoint.att_quat)[..., 2] * RAD_TO_DEG
    desired_yaw = jnp.where(
        setpoint.mode_rpy[..., 2] == MODE_VELOCITY,
        yaw_vel,
        jnp.where(
            setpoint.mode_rpy[..., 2] == MODE_ABS,
            yaw_abs,
            jnp.where(setpoint.mode_quat == MODE_ABS, yaw_quat, 0.0),
        ),
    )

    # body z axis from the state quaternion
    R = quat_ops.to_matrix(fw_state.quat)
    z_axis = R[..., :, 2]

    # yaw correction when not in position mode (rotate force into yaw frame)
    yaw_rad = fw_state.rpy_deg[..., 2] * DEG_TO_RAD
    cos_y, sin_y = jnp.cos(yaw_rad), jnp.sin(yaw_rad)
    x_corr = target_thrust[..., 0] * cos_y - target_thrust[..., 1] * sin_y
    y_corr = target_thrust[..., 0] * sin_y + target_thrust[..., 1] * cos_y
    target_thrust = jnp.stack(
        [
            jnp.where(pos_mode, target_thrust[..., 0], x_corr),
            jnp.where(pos_mode, target_thrust[..., 1], y_corr),
            target_thrust[..., 2],
        ],
        axis=-1,
    )

    current_thrust = jnp.sum(target_thrust * z_axis, axis=-1)

    def _safe_normalize(v):
        # double-where: the zero-vector case (STOP command -> zero thrust)
        # must not see sqrt(0)/0-division in the BACKWARD pass — the sim is
        # differentiable end-to-end (tests/test_diff.py, examples/race_grad).
        # Forward-identical to v / max(norm(v), 1e-12) for every input:
        # sub-threshold norms divide by the same 1e-12 constant.
        n2 = jnp.sum(v * v, axis=-1, keepdims=True)
        small = n2 < 1e-24
        n = jnp.sqrt(jnp.where(small, 1.0, n2))
        return v / jnp.where(small, 1e-12, jnp.maximum(n, 1e-12))

    z_axis_desired = _safe_normalize(target_thrust)
    x_c_des = jnp.stack(
        [
            jnp.cos(desired_yaw * DEG_TO_RAD),
            jnp.sin(desired_yaw * DEG_TO_RAD),
            jnp.zeros_like(desired_yaw),
        ],
        axis=-1,
    )
    y_axis_desired = _safe_normalize(jnp.cross(z_axis_desired, x_c_des))
    x_axis_desired = jnp.cross(y_axis_desired, z_axis_desired)

    # attitude error eR from [Rdes^T R - R^T Rdes]
    Rdes = jnp.stack([x_axis_desired, y_axis_desired, z_axis_desired], axis=-1)
    eRM = (
        jnp.swapaxes(Rdes, -1, -2) @ R - jnp.swapaxes(R, -1, -2) @ Rdes
    )
    eR_x = eRM[..., 2, 1]
    eR_y = -eRM[..., 0, 2]
    eR_z = eRM[..., 1, 0]

    # angular velocity error ew (firmware sign quirks on pitch preserved)
    omega_roll = gyro_deg[..., 0] * DEG_TO_RAD
    omega_pitch = -gyro_deg[..., 1] * DEG_TO_RAD
    omega_yaw = gyro_deg[..., 2] * DEG_TO_RAD
    sp_omega_roll = setpoint.att_rate[..., 0] * DEG_TO_RAD
    sp_omega_pitch = setpoint.att_rate[..., 1] * DEG_TO_RAD
    ew_x = sp_omega_roll - omega_roll
    ew_y = -sp_omega_pitch - omega_pitch
    ew_z = setpoint.att_rate[..., 2] * DEG_TO_RAD - omega_yaw

    # D term on omega error
    err_d_roll = (
        (sp_omega_roll - state.prev_setpoint_omega_rp[..., 0])
        - (omega_roll - state.prev_omega_rp[..., 0])
    ) / dt
    err_d_pitch = (
        (-sp_omega_pitch - state.prev_setpoint_omega_rp[..., 1])
        - (omega_pitch - state.prev_omega_rp[..., 1])
    ) / dt

    # moment integral
    i_m = state.i_error_m + dt * jnp.stack([-eR_x, -eR_y, -eR_z], axis=-1)
    i_m = jnp.stack(
        [
            jnp.clip(i_m[..., 0], -I_RANGE_M_XY, I_RANGE_M_XY),
            jnp.clip(i_m[..., 1], -I_RANGE_M_XY, I_RANGE_M_XY),
            jnp.clip(i_m[..., 2], -I_RANGE_M_Z, I_RANGE_M_Z),
        ],
        axis=-1,
    )

    M_x = -KR_XY * eR_x + KW_XY * ew_x + KI_M_XY * i_m[..., 0] + KD_OMEGA_RP * err_d_roll
    M_y = -KR_XY * eR_y + KW_XY * ew_y + KI_M_XY * i_m[..., 1] + KD_OMEGA_RP * err_d_pitch
    M_z = -KR_Z * eR_z + KW_Z * ew_z + KI_M_Z * i_m[..., 2]

    thrust_out = jnp.where(
        setpoint.mode_xyz[..., 2] == MODE_DISABLE,
        setpoint.thrust,
        MASS_THRUST * current_thrust,
    )
    pos_thrust = thrust_out > 0
    roll_out = jnp.where(pos_thrust, jnp.clip(M_x, -32000.0, 32000.0), 0.0)
    pitch_out = jnp.where(pos_thrust, jnp.clip(M_y, -32000.0, 32000.0), 0.0)
    yaw_out = jnp.where(pos_thrust, jnp.clip(-M_z, -32000.0, 32000.0), 0.0)

    # on thrust <= 0 the firmware resets the controller (controllerMellingerReset)
    reset_mask = ~pos_thrust
    z2 = jnp.zeros_like(i_err)
    i_err = jnp.where(reset_mask[..., None], z2, i_err)
    i_m = jnp.where(reset_mask[..., None], z2, i_m)

    new_control = jnp.stack([roll_out, pitch_out, yaw_out, thrust_out], axis=-1)
    new_prev_omega = jnp.stack([omega_roll, omega_pitch], axis=-1)
    new_prev_sp_omega = jnp.stack([sp_omega_roll, -sp_omega_pitch], axis=-1)

    # gate: hold everything when run == False
    def sel(new, old):
        mask = jnp.reshape(run, run.shape + (1,) * (new.ndim - run.ndim))
        return jnp.where(mask, new, old)

    new_state = state._replace(
        i_error_pos=sel(i_err, state.i_error_pos),
        i_error_m=sel(i_m, state.i_error_m),
        prev_omega_rp=sel(new_prev_omega, state.prev_omega_rp),
        prev_setpoint_omega_rp=sel(new_prev_sp_omega, state.prev_setpoint_omega_rp),
        control_rpyt=sel(new_control, state.control_rpyt),
    )
    return new_state, new_state.control_rpyt


# ---------------------------------------------------------------------------
# power distribution + motor conversions (reference _compute_pwms:423-442)


def compute_pwms(control_rpyt):
    """control (roll,pitch,yaw,thrust) -> 4 motor pwms via X-formation mixer +
    brushed-motor voltage curve."""
    r = control_rpyt[..., 0] / 2.0
    p = control_rpyt[..., 1] / 2.0
    y = control_rpyt[..., 2]
    t = control_rpyt[..., 3]
    thrust = jnp.stack(
        [t - r + p + y, t - r - p - y, t + r - p + y, t + r + p - y], axis=-1
    )
    thrust = jnp.clip(thrust, 0.0, MAX_PWM) / MAX_PWM * 60.0
    volts = -0.0006239 * thrust**2 + 0.088 * thrust
    percentage = jnp.minimum(1.0, volts / SUPPLY_VOLTAGE)
    return percentage * MAX_PWM


def pwms_to_rpm_with_disturbance(pwms, kf, disturbance):
    """Reference MellingerControl.computeControl:246-262: clip pwm -> rpm ->
    per-motor thrust, reorder [3,2,1,0] for the IROS URDF, add thrust-space
    disturbance, convert back through pwm to rpm."""
    clipped = jnp.clip(pwms, MIN_PWM, MAX_PWM)
    thrust = kf * (PWM2RPM_SCALE * clipped + PWM2RPM_CONST) ** 2
    thrust = thrust[..., ::-1]  # [3, 2, 1, 0]
    thrust = thrust + disturbance
    thrust = jnp.clip(thrust, 0.0, None)
    motor_pwm = (jnp.sqrt(thrust / kf) - PWM2RPM_CONST) / PWM2RPM_SCALE
    motor_pwm = jnp.clip(motor_pwm, MIN_PWM, MAX_PWM)
    return PWM2RPM_SCALE * motor_pwm + PWM2RPM_CONST


# ---------------------------------------------------------------------------
# full wrapper step (reference computeControl:154-262 + _step_controller)


def update_sensor_and_state(state: MellingerState, cur_pos, cur_rpy, cur_vel):
    """Finite-difference rates/accel + LPF, filling the firmware structs
    (reference computeControl:205-238, _update_state:446-471).

    Returns (new_state, FirmwareState, gyro_deg filtered).
    """
    dtype = cur_pos.dtype
    fdt = jnp.asarray(FIRMWARE_DT, dtype=dtype)
    up = jnp.zeros_like(cur_vel).at[..., 2].set(1.0)

    cur_rotation_rates = (cur_rpy - state.prev_rpy) / fdt  # rad/s
    cur_acc = (cur_vel - state.prev_vel) / fdt / 9.8 + up  # Gs

    # body_rot = inv(R(rpy)); firmware feeds body-frame acc to the LPF
    q = quat_ops.from_euler_intrinsic_xyz(cur_rpy)
    acc_body = quat_ops.rotate_inv(q, cur_acc)
    gyro_deg_raw = cur_rotation_rates * RAD_TO_DEG

    # SENSOR_DELAY ring: feed the oldest sample to the filters, append the
    # freshest (reference computeControl:228-233); statically elided at 0
    n_hist = state.sensor_history.shape[-2]
    if n_hist > 0:
        delayed = state.sensor_history[..., 0, :]
        newest = jnp.concatenate([acc_body, gyro_deg_raw], axis=-1)
        sensor_history = jnp.concatenate(
            [state.sensor_history[..., 1:, :], newest[..., None, :]], axis=-2
        )
        acc_body = delayed[..., 0:3]
        gyro_deg_raw = delayed[..., 3:6]
    else:
        sensor_history = state.sensor_history

    acc_lpf, acc_f = lpf2p_apply(_ACC_LPF_COEFFS, state.acc_lpf, acc_body)
    gyro_lpf, gyro_f = lpf2p_apply(
        _GYRO_LPF_COEFFS, state.gyro_lpf, gyro_deg_raw
    )

    rpy_deg = cur_rpy * RAD_TO_DEG
    rpy_deg_legacy = rpy_deg * jnp.asarray([1.0, -1.0, 1.0], dtype=dtype)
    fw = FirmwareState(
        pos=cur_pos,
        vel=cur_vel,
        acc=cur_acc,
        rpy_deg=rpy_deg_legacy,
        quat=quat_ops.from_euler_xyz(cur_rpy),
    )
    new_state = state._replace(
        prev_rpy=cur_rpy,
        prev_vel=cur_vel,
        acc_lpf=acc_lpf,
        gyro_lpf=gyro_lpf,
        sensor_history=sensor_history,
    )
    return new_state, fw, gyro_f, acc_f


def step_controller(state: MellingerState, setpoint: Setpoint,
                    fw: FirmwareState, gyro_deg, acc_gs):
    """Tick-gated controller step (reference _step_controller:378-419).

    Returns (new_state, pwms (..., 4)).
    """
    dtype = fw.pos.dtype

    # tumble check on the *state* acc (z in Gs, gravity-free)
    tumbling = fw.acc[..., 2] < -0.5
    tumble_counter = jnp.where(tumbling, state.tumble_counter + 1, 0)
    tumbled = tumble_counter >= 30

    cur_time = state.tick.astype(dtype) / FIRMWARE_FREQ
    att_due = cur_time - state.last_att_pid_call > 0.002
    pos_due = att_due & (cur_time - state.last_pos_pid_call > 0.01)
    run = att_due  # Mellinger runs fully whenever the attitude loop fires
    # (the wrapper's _tick in {0,2} are both even -> RATE_DO_EXECUTE passes;
    #  _tick=1 skips. Position/attitude split only matters for the PID
    #  controller; for Mellinger both wrapper branches execute the full law.)

    new_state, control = controller_mellinger(
        state, setpoint, gyro_deg, fw, run & ~tumbled
    )

    # the reference's tumble path early-returns BEFORE the tick-gating
    # bookkeeping (_step_controller:383-391), so the last-call stamps are
    # held while tumbling
    new_state = new_state._replace(
        tick=state.tick + 1,
        tumble_counter=tumble_counter,
        error_flag=state.error_flag | tumbled,
        last_att_pid_call=jnp.where(
            att_due & ~tumbled, cur_time, state.last_att_pid_call
        ),
        last_pos_pid_call=jnp.where(
            pos_due & ~tumbled, cur_time, state.last_pos_pid_call
        ),
    )
    pwms = compute_pwms(control)
    # reference zeroes motors only while the tumble counter is saturated
    # (_step_controller:387-391); _error is bookkeeping, not a latch
    pwms = jnp.where(tumbled[..., None], jnp.zeros_like(pwms), pwms)
    return new_state, pwms


def compute_control(state: MellingerState, setpoint: Setpoint,
                    cur_pos, cur_rpy, cur_vel, disturbance, kf=3.16e-10):
    """Full per-tick pipeline: sensors -> controller -> pwm -> rpm.

    Equivalent of MellingerControl.computeControl (reference :154-262) minus
    the setpoint update, which the commander handles (control/commander.py).
    Returns (new_state, rpm (..., 4)).
    """
    state, fw, gyro_deg, acc_gs = update_sensor_and_state(
        state, cur_pos, cur_rpy, cur_vel
    )
    state, pwms = step_controller(state, setpoint, fw, gyro_deg, acc_gs)
    rpm = pwms_to_rpm_with_disturbance(pwms, kf, disturbance)
    return state, rpm
