"""Controller tests: DSL PID closed-loop behavior, Mellinger firmware
numerics (LPF, power distribution, motor pipeline), commander planner.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.control import commander as cmdr
from gym_pybullet_adrp_tpu.control import dslpid, mellinger as mel
from gym_pybullet_adrp_tpu.envs import core
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.utils.enums import Command, DroneModel, Physics


def test_dslpid_tracks_position_step():
    """PID closes a 0.3 m altitude step within 2 s (behavioral anchor of
    examples/pid.py trajectories)."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    cfg = AviaryConfig(ctrl_freq=48, pyb_freq=240)
    state = core.core_reset(
        cfg, np.array([[0.0, 0.0, 0.5]]), np.zeros((1, 3)), dtype=jnp.float64
    )
    ctl = dslpid.init_state((1,), dtype=jnp.float64)
    target = jnp.asarray([[0.2, -0.1, 0.8]], dtype=jnp.float64)

    @jax.jit
    def run(state, ctl):
        def body(carry, _):
            st, c = carry
            sv = core.state_vector(st)
            rpm, c, _, _ = dslpid.compute_control(
                params, c, cfg.ctrl_timestep, sv[:, 0:3], sv[:, 3:7],
                sv[:, 10:13], target,
            )
            st = core.core_step(cfg, params, st, rpm)
            return (st, c), None

        (state, ctl), _ = jax.lax.scan(body, (state, ctl), None, length=96)
        return state

    out = run(state, ctl)
    np.testing.assert_allclose(
        np.asarray(out.phys.pos[0]), [0.2, -0.1, 0.8], atol=0.03
    )


def test_lpf2p_dc_gain_and_attenuation():
    """Biquad LPF: unit DC gain, strong attenuation above cutoff
    (firmware filter.c lpf2p semantics)."""
    coeffs = mel.lpf2p_coeffs(500.0, 30.0)
    state = mel.Lpf2pState(d1=jnp.zeros(()), d2=jnp.zeros(()))
    # DC input converges to 1
    for _ in range(500):
        state, out = mel.lpf2p_apply(coeffs, state, jnp.asarray(1.0))
    assert abs(float(out) - 1.0) < 1e-6
    # 200 Hz sine heavily attenuated
    state = mel.Lpf2pState(d1=jnp.zeros(()), d2=jnp.zeros(()))
    amps = []
    for i in range(500):
        x = np.sin(2 * np.pi * 200 * i / 500)
        state, out = mel.lpf2p_apply(coeffs, state, jnp.asarray(x))
        if i > 250:
            amps.append(abs(float(out)))
    assert max(amps) < 0.05


def test_compute_pwms_formula():
    """Power distribution closed form (reference _compute_pwms:423-442)."""
    control = jnp.asarray([1000.0, -2000.0, 500.0, 40000.0])
    pwms = np.asarray(mel.compute_pwms(control))
    r, p, y, t = 500.0, -1000.0, 500.0, 40000.0
    thrust = np.array([t - r + p + y, t - r - p - y, t + r - p + y, t + r + p - y])
    thrust = np.clip(thrust, 0, 65535.0) / 65535.0 * 60
    volts = -0.0006239 * thrust**2 + 0.088 * thrust
    expected = np.minimum(1, volts / 3.0) * 65535.0
    np.testing.assert_allclose(pwms, expected, rtol=1e-6)


def test_pwm_rpm_roundtrip_with_prop_reorder():
    """Zero disturbance: rpm pipeline = reorder of clipped input pwms
    (reference computeControl:246-262)."""
    pwms = jnp.asarray([30000.0, 40000.0, 50000.0, 60000.0])
    rpm = np.asarray(
        mel.pwms_to_rpm_with_disturbance(pwms, 3.16e-10, jnp.zeros(4))
    )
    expected_pwm = np.array([60000.0, 50000.0, 40000.0, 30000.0])
    expected = 0.2685 * expected_pwm + 4070.3
    np.testing.assert_allclose(rpm, expected, rtol=1e-5)


def test_mellinger_hover_converges():
    """Closed loop: Mellinger + FULLSTATE setpoint holds a hover target."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    cfg = AviaryConfig(ctrl_freq=500, pyb_freq=500)
    pos0 = np.array([[0.0, 0.0, 0.5]])
    state = core.core_reset(cfg, pos0, np.zeros((1, 3)), dtype=jnp.float64)
    mstate = mel.init_state((1,), dtype=jnp.float64)
    sp = mel.zero_setpoint((1,), dtype=jnp.float64)
    sp = sp._replace(
        pos=jnp.asarray([[0.0, 0.0, 0.7]], dtype=jnp.float64),
        mode_xyz=jnp.full((1, 3), mel.MODE_ABS, dtype=jnp.int32),
        mode_quat=jnp.full((1,), mel.MODE_ABS, dtype=jnp.int32),
    )

    @jax.jit
    def run(state, mstate):
        def body(carry, _):
            st, ms = carry
            ms, rpm = mel.compute_control(
                ms, sp, st.phys.pos, st.phys.rpy, st.phys.vel,
                jnp.zeros((1, 4), dtype=jnp.float64),
            )
            st = core.core_step(cfg, params, st, rpm)
            return (st, ms), st.phys.pos[0, 2]

        (state, mstate), zs = jax.lax.scan(
            body, (state, mstate), None, length=2500
        )
        return state, zs

    out, zs = run(state, mstate)
    # converge to within 12 cm of target after 5 s (firmware mass mismatch
    # 0.032 vs 0.03454 leaves a small steady-state offset, as on hardware)
    assert abs(float(out.phys.pos[0, 2]) - 0.7) < 0.12
    assert abs(float(out.phys.vel[0, 2])) < 0.05


def test_poly7_boundary_conditions():
    """Planner polynomial satisfies all 8 boundary conditions."""
    x0 = jnp.asarray([[0.1, -0.2, 0.3, 0.0]], dtype=jnp.float64)
    v0 = jnp.asarray([[0.5, 0.0, -0.1, 0.2]], dtype=jnp.float64)
    a0 = jnp.asarray([[0.0, 0.1, 0.0, 0.0]], dtype=jnp.float64)
    xf = jnp.asarray([[1.0, 1.0, 1.0, 0.5]], dtype=jnp.float64)
    vf = jnp.zeros_like(x0)
    af = jnp.zeros_like(x0)
    T = jnp.asarray([2.0], dtype=jnp.float64)
    coeffs = cmdr.plan_poly7(x0, v0, a0, xf, vf, af, T)

    p0, pv0, pa0 = cmdr.eval_poly7(coeffs, jnp.asarray([0.0]), T)
    pT, pvT, paT = cmdr.eval_poly7(coeffs, T, T)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(x0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pv0), np.asarray(v0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(pa0), np.asarray(a0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(pT), np.asarray(xf), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pvT), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(paT), 0.0, atol=1e-9)
    # holds the endpoint beyond T
    pH, pvH, _ = cmdr.eval_poly7(coeffs, T + 5.0, T)
    np.testing.assert_allclose(np.asarray(pH), np.asarray(xf), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pvH), 0.0, atol=1e-9)


def test_commander_takeoff_then_fullstate_override():
    """TAKEOFF plans a trajectory; FULLSTATE overrides it
    (reference _sendFullStateCmd:543 + _sendTakeoffCmd:561)."""
    cs = cmdr.init_state((1,), dtype=jnp.float64)
    pos = jnp.asarray([[0.0, 0.0, 0.05]], dtype=jnp.float64)
    vel = jnp.zeros((1, 3), dtype=jnp.float64)
    yaw = jnp.zeros((1,), dtype=jnp.float64)

    cid, vec = cmdr.pack_command(Command.TAKEOFF, [0.4, 2.0])
    cs = cmdr.process_command(
        cs, jnp.asarray([cid]), jnp.asarray(vec, dtype=jnp.float64)[None],
        jnp.asarray([0.0], dtype=jnp.float64), pos, vel, yaw,
    )
    assert not bool(cs.full_state_override[0])
    assert bool(cs.planner_active[0])

    # mid-takeoff setpoint: z between start and target, z target reached at T
    cs1 = cmdr.update_setpoint(cs, jnp.asarray([1.0], dtype=jnp.float64))
    z_mid = float(cs1.setpoint.pos[0, 2])
    assert 0.05 < z_mid < 0.4
    cs2 = cmdr.update_setpoint(cs, jnp.asarray([2.0], dtype=jnp.float64))
    np.testing.assert_allclose(float(cs2.setpoint.pos[0, 2]), 0.4, atol=1e-8)

    # FULLSTATE overrides the planner
    cid, vec = cmdr.pack_command(
        Command.FULLSTATE,
        ([1.0, 2.0, 3.0], [0.1, 0.2, 0.3], [0, 0, 0], 0.5, [0, 0, 0], 2.5),
    )
    cs3 = cmdr.process_command(
        cs2, jnp.asarray([cid]), jnp.asarray(vec, dtype=jnp.float64)[None],
        jnp.asarray([2.5], dtype=jnp.float64), pos, vel, yaw,
    )
    assert bool(cs3.full_state_override[0])
    np.testing.assert_allclose(
        np.asarray(cs3.setpoint.pos[0]), [1.0, 2.0, 3.0], atol=1e-7
    )
    # update_setpoint must NOT touch the overridden setpoint
    cs4 = cmdr.update_setpoint(cs3, jnp.asarray([3.0], dtype=jnp.float64))
    np.testing.assert_allclose(
        np.asarray(cs4.setpoint.pos[0]), [1.0, 2.0, 3.0], atol=1e-7
    )


def test_commander_stop_zeroes_thrust_mode():
    cs = cmdr.init_state((1,), dtype=jnp.float64)
    pos = jnp.zeros((1, 3), dtype=jnp.float64)
    cid, vec = cmdr.pack_command(Command.STOP, [])
    cs = cmdr.process_command(
        cs, jnp.asarray([cid]), jnp.asarray(vec, dtype=jnp.float64)[None],
        jnp.asarray([0.0], dtype=jnp.float64), pos, pos,
        jnp.zeros((1,), dtype=jnp.float64),
    )
    assert int(cs.setpoint.mode_xyz[0, 2]) == mel.MODE_DISABLE
    assert float(cs.setpoint.thrust[0]) == 0.0


def test_oo_mellinger_wrapper_flies():
    """Object-style MellingerControl (control/api.py) closed loop with
    CtrlAviary at 500 Hz: queued TAKEOFF command -> climbs to height."""
    from gym_pybullet_adrp_tpu.control import MellingerControl
    from gym_pybullet_adrp_tpu.envs import CtrlAviary

    env = CtrlAviary(
        num_drones=1, pyb_freq=500, ctrl_freq=500,
        initial_xyzs=np.array([[0, 0, 0.1]]),
    )
    obs, _ = env.reset()
    ctrl = MellingerControl(0, DroneModel.CF2X)
    init_obs = np.hstack(
        [obs[0][:3], obs[0][7:10], obs[0][10:13], obs[0][13:16]]
    )[None]
    ctrl.reset(init_obs)
    ctrl.sendTakeoffCmd(0.5, 2.0)
    ctrl.process_command_queue(0.0)
    action = np.zeros((1, 4))
    for _ in range(1500):
        obs, *_ = env.step(action)
        action[0] = ctrl.computeControl(
            1 / 500, obs[0][:3], obs[0][7:10], obs[0][10:13],
            obs[0][13:16], np.zeros(4),
        )
    assert 0.35 < obs[0][2] < 0.7
