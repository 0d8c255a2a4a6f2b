"""CFAviary (Mellinger + firmware PID) and BetaAviary (CTBR) env tests."""

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
