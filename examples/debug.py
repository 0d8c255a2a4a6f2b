"""Raw physics-core debugging demo (reference examples/debug.py drives raw
PyBullet; here it drives the functional core directly).

    python examples/debug.py
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import core
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics


def run(duration_sec: int = 2, physics: Physics = Physics.PYB):
    cfg = AviaryConfig(
        drone_model=DroneModel.CF2X, num_drones=1, physics=physics,
        pyb_freq=240, ctrl_freq=240,
    )
    params = drone_params(cfg.drone_model)
    state = core.core_reset(cfg, np.array([[0.0, 0.0, 1.0]]), np.zeros((1, 3)))
    rpm = jnp.full((1, 4), params.hover_rpm * 1.001)
    for i in range(duration_sec * cfg.ctrl_freq):
        state = core.core_step(cfg, params, state, rpm)
        if i % cfg.ctrl_freq == 0:
            sv = np.asarray(core.state_vector(state))[0]
            print(
                f"t={i / cfg.ctrl_freq:5.2f}s pos=({sv[0]:+.3f} {sv[1]:+.3f} "
                f"{sv[2]:+.3f}) rpy=({sv[7]:+.3f} {sv[8]:+.3f} {sv[9]:+.3f}) "
                f"vel_z={sv[12]:+.3f}"
            )
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Physics core debug demo")
    parser.add_argument("--duration_sec", default=2, type=int)
    ARGS = parser.parse_args()
    run(duration_sec=ARGS.duration_sec)
