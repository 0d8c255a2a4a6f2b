"""Firmware-in-the-loop square trajectory (reference examples/cf.py).

A CFAviary drone takes off, flies a square via FULLSTATE commands at the
firmware rate, and the trajectory is logged.

    python examples/cf.py --plot False
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from gym_pybullet_adrp_tpu.envs import CFAviary
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics
from gym_pybullet_adrp_tpu.utils.logger import Logger
from gym_pybullet_adrp_tpu.utils.utils import str2bool, sync

DEFAULT_GUI = False
DEFAULT_PLOT = True
DEFAULT_OUTPUT_FOLDER = "results"
DEFAULT_CONTROL_FREQ_HZ = 25
NUM_DRONES = 1
INIT_XYZ = np.array([[0.0, 0.0, 0.1]])


def run(
    drone=DroneModel.CF2X,
    gui=DEFAULT_GUI,
    plot=DEFAULT_PLOT,
    record_video=False,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    colab=False,
):
    env = CFAviary(
        drone_model=drone,
        num_drones=NUM_DRONES,
        initial_xyzs=INIT_XYZ,
        physics=Physics.PYB,
        pyb_freq=500,
        ctrl_freq=control_freq_hz,
        gui=gui,
        record=record_video,
    )
    logger = Logger(
        logging_freq_hz=control_freq_hz,
        num_drones=NUM_DRONES,
        output_folder=output_folder,
        colab=colab,
    )
    obs, info = env.reset()

    # square trajectory at the control rate (reference cf.py:74-99)
    delta = 75  # 3 s legs @ 25 Hz
    trajectory = (
        [[0, 0, 0] for _ in range(delta)]
        + [[0, 0, i / delta] for i in range(delta)]
        + [[i / delta, 0, 1] for i in range(delta)]
        + [[1, i / delta, 1] for i in range(delta)]
        + [[1 - i / delta, 1, 1] for i in range(delta)]
        + [[0, 1 - i / delta, 1] for i in range(delta)]
        + [[0, 0, 1 - i / delta] for i in range(delta)]
    )

    START = time.time()
    env.sendTakeoffCmd(0.1, 1.0)
    for i in range(len(trajectory)):
        t = i / env.ctrl_freq
        obs, reward, terminated, truncated, info = env.step(i)
        target = trajectory[i]
        pos = np.array(target) + np.array([INIT_XYZ[0][0], INIT_XYZ[0][1], 0])
        env.sendFullStateCmd(
            pos, np.zeros(3), np.zeros(3), 0.0, np.zeros(3), t
        )
        logger.log(drone=0, timestamp=i / env.ctrl_freq, state=obs[0])
        if i % env.ctrl_freq == 0:
            env.render()
        if gui:
            sync(i, START, 1 / env.ctrl_freq)

    env.close()
    logger.save_as_csv("cf")
    if plot:
        logger.plot()
    return logger


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="CF firmware example")
    parser.add_argument("--gui", default=DEFAULT_GUI, type=str2bool)
    parser.add_argument("--plot", default=DEFAULT_PLOT, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    ARGS = parser.parse_args()
    run(gui=ARGS.gui, plot=ARGS.plot, output_folder=ARGS.output_folder)
