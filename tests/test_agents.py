"""Every shipped user-controller constructs and yields a usable first
action against its intended track (reference user_controller/* surface)."""

import numpy as np
import pytest

from gym_pybullet_adrp_tpu.envs.race import MultiRaceAviary
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import Command, RaceMode
from gym_pybullet_adrp_tpu.utils.utils import load_controller

CASES = [
    ("agents/hardcoded.py", "configs/getting_started.yaml"),
    ("agents/hardcoded_twogates.py", "configs/twogates.yaml"),
    ("agents/hover.py", "configs/getting_started.yaml"),
    ("agents/rl_agent.py", "configs/getting_started.yaml"),
    ("agents/rl_twogates.py", "configs/twogates.yaml"),
]


@pytest.mark.parametrize("path,config", CASES)
def test_agent_first_actions(path, config):
    cfg = load_config(config)
    env = MultiRaceAviary(cfg, num_drones=1, racemode=RaceMode.COMPARE)
    obs, info = env.reset()
    info = dict(info)
    info["delay"] = 0
    agent = load_controller(path)(0, obs[0], info)
    for i in range(3):
        a = agent.predict(obs[0], ep_time=i / env.CTRL_FREQ)
        if isinstance(a, np.ndarray):
            assert a.shape[-1] == 4 and np.isfinite(a).all()
            obs, *_ = env.step(np.asarray([a]))
        else:
            cmd, args = a
            assert isinstance(cmd, Command)
            obs, *_ = env.step([a])
    assert np.isfinite(obs).all()


def test_shipped_race_policy_passes_twogates():
    """The shipped RL artifact clears both twogates gates (the reference
    twogates.zip behavioral anchor; trained to end after gate 2, so
    post-gate behavior is unconstrained)."""
    cfg = load_config("configs/twogates.yaml")
    env = MultiRaceAviary(cfg, num_drones=1, racemode=RaceMode.COMPARE)
    obs, info = env.reset()
    agent = load_controller("agents/rl_twogates.py")(0, obs[0], dict(info))
    for i in range(250):
        a = agent.predict(obs[0], ep_time=i / env.CTRL_FREQ)
        action = np.asarray([a]) if isinstance(a, np.ndarray) else [a]
        obs, reward, te, tr, _ = env.step(action)
        if int(env.current_gate[0]) >= 2 or te or tr:
            break
    assert int(env.current_gate[0]) >= 2
