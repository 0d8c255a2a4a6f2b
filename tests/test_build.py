"""Package import smoke test (reference tests/test_build.py:1-6)."""


def test_import_packages():
    import gym_pybullet_adrp_tpu
    import gym_pybullet_adrp_tpu.control
    import gym_pybullet_adrp_tpu.envs
    import gym_pybullet_adrp_tpu.models
    import gym_pybullet_adrp_tpu.ops
    import gym_pybullet_adrp_tpu.parallel
    import gym_pybullet_adrp_tpu.rl
    import gym_pybullet_adrp_tpu.utils


def test_gym_registry():
    import gymnasium as gym

    import gym_pybullet_adrp_tpu  # noqa: F401  (registers ids)

    for env_id in [
        "ctrl-aviary-v0", "velocity-aviary-v0", "hover-aviary-v0",
        "multihover-aviary-v0", "multi-race-aviary-v0",
    ]:
        assert env_id in gym.registry
