"""CFAviary (Mellinger + firmware PID) and BetaAviary (CTBR) env tests.

Coverage model (VERDICT r1 item 9): per-command coverage of the high-level
commander surface (takeoff/goto/notify/land sequencing and the
one-command-per-step queue semantics, reference CFAviary.py:428-433), the
'pid' controller mode, and golden transcriptions of the Betaflight unit
conversions (reference BetaAviary.py:176-188, :239-267).
"""

import numpy as np
import pytest


def test_cf_mellinger_takeoff_goto_land():
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    obs, info = env.reset()
    env.sendTakeoffCmd(0.3, 1.5)
    for i in range(100):
        obs, *_ = env.step(i)
    assert 0.2 < obs[0][2] < 0.5
    env.sendGotoCmd([0.5, 0.5, 0.5], 0.0, 2.0, False)
    for i in range(100, 200):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][:3], [0.5, 0.5, 0.5], atol=0.08)
    env.sendLandCmd(0.05, 2.0)
    for i in range(200, 275):
        obs, *_ = env.step(i)
    assert obs[0][2] < 0.15


def test_cf_firmware_pid_tracks():
    from gym_pybullet_adrp_tpu.envs.cf import CFPIDAviary

    env = CFPIDAviary(pyb_freq=1000)
    assert env.firmware_freq == 1000  # reference CFAviary.py:80
    env.reset()
    env.sendTakeoffCmd(0.3, 1.5)
    for i in range(100):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][2], 0.3, atol=0.05)
    env.sendGotoCmd([0.4, 0.2, 0.5], 0.0, 2.0, False)
    for i in range(100, 250):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][:3], [0.4, 0.2, 0.5], atol=0.02)


def test_cf_fullstate_override():
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    env.reset()
    env.sendTakeoffCmd(0.3, 1.0)
    for i in range(50):
        obs, *_ = env.step(i)
    env.sendFullStateCmd(
        [0.3, -0.3, 0.6], np.zeros(3), np.zeros(3), 0.0, np.zeros(3), 2.0
    )
    for i in range(50, 150):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][:3], [0.3, -0.3, 0.6], atol=0.1)


def test_cf_rejects_multi_drone():
    from gym_pybullet_adrp_tpu.envs import CFAviary

    with pytest.raises(NotImplementedError):
        CFAviary(num_drones=2)


def test_cf_command_queue_pops_one_per_step():
    """Queue semantics: exactly ONE queued command executes per control
    step (reference _process_command_queue:428-433 pops a single entry)."""
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    env.reset()
    env.sendTakeoffCmd(0.3, 1.5)
    env.sendGotoCmd([0.2, 0.2, 0.4], 0.0, 2.0, False)
    env.sendLandCmd(0.05, 2.0)
    assert len(env.command_queue) == 3
    env.step(0)
    assert len(env.command_queue) == 2
    env.step(1)
    assert len(env.command_queue) == 1
    env.step(2)
    assert len(env.command_queue) == 0


def test_cf_takeoff_goto_notify_land_full_sequence():
    """The reference examples/cf.py pattern: TAKEOFF -> stream FULLSTATE ->
    NOTIFY (hand back to the high-level commander) -> LAND."""
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    obs, _ = env.reset()
    i = 0
    env.sendTakeoffCmd(0.4, 1.5)
    for _ in range(60):
        obs, *_ = env.step(i)
        i += 1
    assert 0.3 < obs[0][2] < 0.5
    # stream FULLSTATE setpoints (overrides the high-level commander)
    for k in range(50):
        env.sendFullStateCmd(
            [0.3 * k / 50, 0.0, 0.4], np.zeros(3), np.zeros(3), 0.0,
            np.zeros(3), i / env.ctrl_freq,
        )
        obs, *_ = env.step(i)
        i += 1
    assert obs[0][0] > 0.15  # moved along +x under fullstate control
    # NOTIFY returns control to the high-level planner, then LAND
    env.notifySetpointStop()
    obs, *_ = env.step(i)
    i += 1
    env.sendLandCmd(0.03, 2.0)
    for _ in range(75):
        obs, *_ = env.step(i)
        i += 1
    assert obs[0][2] < 0.15


def test_cf_takeoff_yaw_and_vel_variants():
    """TAKEOFFYAW reaches height AND yaw; TAKEOFFVEL reaches height
    (reference sendTakeoffYawCmd/sendTakeoffVelCmd surface)."""
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    env.reset()
    env.sendTakeoffYawCmd(0.5, 2.0, 0.8)
    obs = None
    for i in range(80):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][2], 0.5, atol=0.07)
    np.testing.assert_allclose(obs[0][9], 0.8, atol=0.15)  # yaw (rpy block)

    env2 = CFAviary()
    env2.reset()
    env2.sendTakeoffVelCmd(0.4, 0.4, False)  # absolute height, 0.4 m/s
    for i in range(60):
        obs, *_ = env2.step(i)
    np.testing.assert_allclose(obs[0][2], 0.4, atol=0.08)


def test_cf_goto_relative_and_land_vel():
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    env.reset()
    env.sendTakeoffCmd(0.4, 1.5)
    obs = None
    for i in range(60):
        obs, *_ = env.step(i)
    # relative goto: +0.3 x from wherever it hovers
    x0 = float(obs[0][0])
    env.sendGotoCmd([0.3, 0.0, 0.0], 0.0, 2.0, True)
    for i in range(60, 140):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][0], x0 + 0.3, atol=0.08)
    env.sendLandVelCmd(0.05, 0.3, False)
    for i in range(140, 220):
        obs, *_ = env.step(i)
    assert obs[0][2] < 0.15


def test_cf_stop_cuts_motors():
    """STOP disables setpoint modes -> thrust 0 -> the drone drops
    (reference sendStopCmd surface)."""
    from gym_pybullet_adrp_tpu.envs import CFAviary

    env = CFAviary()
    env.reset()
    env.sendTakeoffCmd(0.5, 1.5)
    obs = None
    for i in range(70):
        obs, *_ = env.step(i)
    z_hover = float(obs[0][2])
    assert z_hover > 0.4
    env.sendStopCmd()
    for i in range(70, 100):
        obs, *_ = env.step(i)
    assert float(obs[0][2]) < z_hover - 0.2  # free fall after motor cut
    # motors at the MIN_PWM idle clip (reference CFAviary clips pwm to
    # [MIN_PWM, MAX_PWM] before the rpm map: 0.2685*20000+4070.3 = 9440.3,
    # far below hover thrust)
    from gym_pybullet_adrp_tpu.utils.constants import (
        MIN_PWM, PWM2RPM_CONST, PWM2RPM_SCALE,
    )

    idle = PWM2RPM_SCALE * MIN_PWM + PWM2RPM_CONST
    np.testing.assert_allclose(np.asarray(obs[0][16:20]), idle, atol=0.1)


def test_cf_pid_mode_land_and_queue():
    """'pid' mode (1 kHz controllerPid) flies the same command surface."""
    from gym_pybullet_adrp_tpu.envs.cf import CFPIDAviary

    env = CFPIDAviary(pyb_freq=1000)
    env.reset()
    env.sendTakeoffCmd(0.4, 1.5)
    obs = None
    for i in range(80):
        obs, *_ = env.step(i)
    np.testing.assert_allclose(obs[0][2], 0.4, atol=0.05)
    env.sendLandCmd(0.05, 2.0)
    for i in range(80, 160):
        obs, *_ = env.step(i)
    assert obs[0][2] < 0.12


# ---------------------------------------------------------------------------
# Betaflight unit conversions (reference BetaAviary.py:176-188, :239-267)


def _ctbr2beta_reference(thrust, roll, pitch, yaw):
    """Float64 numpy transcription of reference ctbr2beta:176-188 plus the
    RC packet's round() (step:150-157)."""
    MIN_CHANNEL, MAX_CHANNEL = 1000, 2000
    MAX_RATE, MAX_THRUST = 360, 40.9
    mid = (MAX_CHANNEL + MIN_CHANNEL) / 2
    d = (MAX_CHANNEL - MIN_CHANNEL) / 2
    thrust = thrust / MAX_THRUST * d * 2 + MIN_CHANNEL
    rates = np.array([roll, pitch, -yaw])
    rates = rates / np.pi * 180 / MAX_RATE * d + mid
    thrust = np.clip(thrust, MIN_CHANNEL, MAX_CHANNEL)
    rates = np.clip(rates, MIN_CHANNEL, MAX_CHANNEL)
    return round(thrust), np.array([round(r) for r in rates])


def test_ctbr2beta_matches_reference_transcription():
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.envs import beta as beta_mod

    rng = np.random.default_rng(3)
    for _ in range(200):
        t = float(rng.uniform(-5.0, 50.0))      # incl. out-of-range clips
        r, p, y = rng.uniform(-2 * np.pi, 2 * np.pi, 3)
        thro_ref, rates_ref = _ctbr2beta_reference(t, r, p, y)
        thro, rates = beta_mod.ctbr2beta(
            jnp.float64(t), jnp.float64(r), jnp.float64(p), jnp.float64(y)
        )
        np.testing.assert_allclose(float(thro), thro_ref, atol=0)
        np.testing.assert_allclose(np.asarray(rates), rates_ref, atol=0)


def test_beta2ctbr_inverts_up_to_quantization():
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.envs import beta as beta_mod

    rng = np.random.default_rng(4)
    for _ in range(100):
        t = float(rng.uniform(0.0, 40.9))
        rates = rng.uniform(-np.pi, np.pi, 3)
        thro, ch = beta_mod.ctbr2beta(
            jnp.float64(t), *(jnp.float64(v) for v in rates)
        )
        t2, rates2 = beta_mod.beta2ctbr(thro, ch)
        # one RC count = MAX_THRUST/1000 thrust, MAX_RATE/500 deg/s rate
        assert abs(float(t2) - t) <= 40.9 / 1000 / 2 + 1e-9
        np.testing.assert_allclose(
            np.asarray(rates2), rates, atol=(360 / 500 / 2) * np.pi / 180 + 1e-9
        )


def test_beta_motor_remap_and_rpm_map():
    """_preprocessAction transcription: remap [2,1,3,0] then
    rpm = sqrt(MAX_THRUST/4/KF * u) (reference :239-267); and the in-graph
    SITL's pre-permuted outputs recover the IROS motor order end-to-end."""
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.control import ctbr
    from gym_pybullet_adrp_tpu.envs import beta as beta_mod
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.utils.enums import DroneModel

    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    kf = float(params.kf)
    max_thrust = float(params.max_thrust)

    rng = np.random.default_rng(5)
    u = rng.uniform(0.0, 1.0, 4)
    # reference transcription
    remapped = np.array([u[2], u[1], u[3], u[0]])
    rpm_ref = np.sqrt(max_thrust / 4 / kf * remapped)
    rpm = beta_mod.beta_motors_to_rpm(
        jnp.asarray(u), params.max_thrust, params.kf
    )
    np.testing.assert_allclose(np.asarray(rpm), rpm_ref, rtol=1e-12)

    # chain property: SITL outputs -> faithful remap == direct rate loop
    # (when no motor saturates)
    thrust = jnp.float64(9.8)
    rate_sp = jnp.asarray([0.5, -0.3, 0.2], jnp.float64)
    omega = jnp.asarray([0.1, 0.0, -0.1], jnp.float64)
    u_sitl = ctbr.betaflight_motor_outputs(params, thrust, rate_sp, omega)
    rpm_chain = beta_mod.beta_motors_to_rpm(u_sitl, params.max_thrust, params.kf)
    rpm_direct = ctbr.rate_loop_rpm(params, thrust, rate_sp, omega)
    np.testing.assert_allclose(
        np.asarray(rpm_chain), np.asarray(rpm_direct), rtol=1e-9
    )


def test_beta_rc_gating_before_traj_time():
    """Until TRAJ_TIME the RC packet is neutral (thro at MIN_CHANNEL) and
    the motors stay off (reference step:139-150)."""
    from gym_pybullet_adrp_tpu.envs import BetaAviary

    env = BetaAviary(num_drones=1)
    env.reset()
    act = np.array([[9.8, 0.0, 0.0, 0.0]])  # hover-ish command, ignored
    steps_dead = int(beta_traj_time_steps(env))
    obs = None
    for i in range(steps_dead):
        obs, *_ = env.step(act, i)
    # motors off the whole time -> on the ground
    assert np.all(obs[0][16:20] == 0.0)
    assert obs[0][2] < 0.12
    # first live step spins the motors
    obs, *_ = env.step(act, steps_dead + 1)
    assert np.any(obs[0][16:20] > 0.0)


def beta_traj_time_steps(env):
    from gym_pybullet_adrp_tpu.envs.beta import TRAJ_TIME

    return TRAJ_TIME * env.CTRL_FREQ


@pytest.mark.slow
def test_beta_traj_csv_flight():
    """The shipped configs/beta_traj.csv flies through the FAITHFUL
    conversion chain (VERDICT r1 item 6 'done' criterion)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.beta import run

    # 14 s covers TRAJ_TIME (1.5 s RC-gated) + the full 12 s trajectory
    logger = run(
        plot=False, duration_sec=14, traj_csv="configs/beta_traj.csv",
        output_folder="/tmp/beta_test",
    )
    raw = np.loadtxt("configs/beta_traj.csv", delimiter=",", skiprows=1)
    # final position near the trajectory's end point
    final_target = raw[-1, 1:4]
    states = logger.states[0]  # (16, T): x,y,z first
    final_pos = states[:3, -1]
    np.testing.assert_allclose(final_pos, final_target, atol=0.2)


def test_beta_ctbr_hover():
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.control import CTBRControl
    from gym_pybullet_adrp_tpu.envs import BetaAviary

    env = BetaAviary(num_drones=2)
    obs, info = env.reset()
    ctrl = CTBRControl(env.DRONE_MODEL)
    target = np.array([[0.0, 0.0, 1.0], [0.3, 0.0, 1.0]])
    act = np.zeros((2, 4))
    for i in range(100):
        obs, *_ = env.step(act, i)
        for j in range(2):
            t, p, q, r = ctrl.computeControlFromState(
                1 / 25, obs[j], target[j]
            )
            act[j] = [t, p, q, r]
    np.testing.assert_allclose(obs[0][:3], target[0], atol=0.05)
    np.testing.assert_allclose(obs[1][:3], target[1], atol=0.05)
