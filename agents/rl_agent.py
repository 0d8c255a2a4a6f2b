"""Learned racer: wraps a trained actor-critic policy checkpoint.

Capability parity with reference user_controller/RLController.py:14-81,
which loads an SB3 PPO zip; here the policy is a flax ``ActorCritic``
restored from an orbax/msgpack checkpoint saved by examples/learn.py or
scripts/train_race.py. The action transform mirrors the reference:
[-1, 1]^4 scaled and offset by the current pose into a FULLSTATE command.
"""

from pathlib import Path

import numpy as np

from agents.base import BaseController
from gym_pybullet_adrp_tpu.utils.enums import Command

ACTION_SCALE = np.array([1.0, 1.0, 1.0, np.pi])


class RLController(BaseController):
    """Policy-driven controller (reference RLController:14-81)."""

    def __init__(self, drone_id, initial_obs, initial_info,
                 buffer_size: int = 100, verbose: bool = False,
                 model_path: str = None):
        super().__init__(drone_id, initial_obs, initial_info, buffer_size, verbose)
        import jax
        import jax.numpy as jnp
        from flax import serialization

        from gym_pybullet_adrp_tpu.models.policy import ActorCritic

        path = Path(
            model_path or Path(__file__).parent / "example_race_policy.msgpack"
        )
        if not path.exists():
            raise FileNotFoundError(
                f"no trained model at {path}; train one with examples/learn.py"
            )
        self.network = ActorCritic(act_dim=4)
        obs_dim = int(np.asarray(initial_obs).size)
        params0 = self.network.init(
            jax.random.PRNGKey(0), jnp.zeros((1, obs_dim))
        )
        with open(path, "rb") as f:
            self.params = serialization.from_bytes(params0, f.read())
        self._jnp = jnp
        self._apply = jax.jit(self.network.apply)

    def predict(self, obs, reward=None, done=None, info=None, ep_time=None):
        """Deterministic policy action -> FULLSTATE command
        (reference predict:39-73: yaw action zeroed, scaled offset added to
        the current [x, y, z, yaw] pose)."""
        from gym_pybullet_adrp_tpu.utils.utils import map2pi

        mean, _, _ = self._apply(self.params, self._jnp.asarray(obs)[None])
        action = np.clip(np.asarray(mean)[0], -1.0, 1.0)
        action[3] = 0.0
        pose = np.asarray([obs[0], obs[1], obs[2], obs[5]])
        target = pose + action * ACTION_SCALE
        target[3] = map2pi(target[3])
        return Command.FULLSTATE, [
            target[:3], np.zeros(3), np.zeros(3), float(target[3]),
            np.zeros(3), ep_time,
        ]


Controller = RLController
