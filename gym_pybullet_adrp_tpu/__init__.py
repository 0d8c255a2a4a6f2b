"""gym-pybullet-adrp_tpu: TPU-native autonomous-drone-racing platform.

A from-scratch JAX/XLA re-design of the capabilities of
``FelixWaiblinger/gym-pybullet-adrp``: pure-functional quadrotor physics,
in-graph flight controllers (DSL PID, Crazyflie Mellinger firmware numerics,
CTBR), racing environments with gates/obstacles/randomization, and a sharded
PPO learner — everything jit/vmap/shard_map-friendly so thousands of envs
step in lockstep per chip.

Environment ids mirror the reference registry
(reference gym_pybullet_adrp/__init__.py:5-28).
"""

__version__ = "0.1.0"

from gymnasium.envs.registration import register


def _register():
    register(
        id="ctrl-aviary-v0",
        entry_point="gym_pybullet_adrp_tpu.envs.aviary:CtrlAviary",
    )
    register(
        id="velocity-aviary-v0",
        entry_point="gym_pybullet_adrp_tpu.envs.aviary:VelocityAviary",
    )
    register(
        id="hover-aviary-v0",
        entry_point="gym_pybullet_adrp_tpu.envs.aviary:HoverAviary",
    )
    register(
        id="multihover-aviary-v0",
        entry_point="gym_pybullet_adrp_tpu.envs.aviary:MultiHoverAviary",
    )
    register(
        id="multi-race-aviary-v0",
        entry_point="gym_pybullet_adrp_tpu.envs.race:MultiRaceAviary",
    )


try:
    _register()
except Exception:  # pragma: no cover - double registration in reloads
    pass
