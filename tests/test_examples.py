"""Integration-by-example (reference tests/test_examples.py:1-15): run the
example mains headless with short budgets."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_pid(tmp_path):
    from examples import pid

    logger = pid.run(
        gui=False, plot=False, output_folder=str(tmp_path), duration_sec=4
    )
    # drones hold their initial altitudes on the circle
    z = logger.states[:, 2, -1]
    assert np.all(z > 0.05), z


def test_pid_velocity(tmp_path):
    from examples import pid_velocity

    logger = pid_velocity.run(
        gui=False, plot=False, output_folder=str(tmp_path), duration_sec=4
    )
    # phase 1 commands +z velocity: all drones climbed from z=0.1 (they
    # descend again in the final phase, so check the peak)
    assert np.all(logger.states[:, 2, :].max(axis=-1) > 0.3)


def test_downwash(tmp_path):
    from examples import downwash

    logger = downwash.run(
        gui=False, plot=False, output_folder=str(tmp_path), duration_sec=4
    )
    assert np.all(logger.states[:, 2, -1] > 0.2)


def test_learn_smoke(tmp_path):
    from examples import learn

    # local=False shrinks training for CI (reference learn.py:92)
    learn.run(
        multiagent=False, output_folder=str(tmp_path), gui=False, plot=False,
        local=False, n_envs=16,
    )


def test_cf(tmp_path):
    from examples import cf

    logger = cf.run(gui=False, plot=False, output_folder=str(tmp_path))
    # the square trajectory reaches z ~= 1
    assert logger.states[0, 2, :].max() > 0.8


def test_beta(tmp_path):
    from examples import beta

    logger = beta.run(
        gui=False, plot=False, output_folder=str(tmp_path)
    )
    assert logger.states[0, 2, :].max() > 0.8


def test_debug():
    from examples import debug

    state = debug.run(duration_sec=1)
    assert float(state.phys.pos[0, 2]) > 1.0  # slight climb at 1.001x hover
