"""Environment suite: functional cores + Gymnasium-API classes."""

from gym_pybullet_adrp_tpu.envs.aviary import (
    BaseRLAviary, CtrlAviary, HoverAviary, MultiHoverAviary, VelocityAviary,
)
from gym_pybullet_adrp_tpu.envs.beta import BetaAviary
from gym_pybullet_adrp_tpu.envs.cf import CFAviary
from gym_pybullet_adrp_tpu.envs.race import MultiRaceAviary
from gym_pybullet_adrp_tpu.envs.race_vector import JaxRaceVectorEnv
from gym_pybullet_adrp_tpu.envs.vector import JaxVectorEnv

__all__ = [
    "BaseRLAviary", "BetaAviary", "CFAviary", "CtrlAviary", "HoverAviary",
    "JaxRaceVectorEnv", "JaxVectorEnv", "MultiHoverAviary",
    "MultiRaceAviary", "VelocityAviary",
]
