"""Checkpoint round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import rl as rlenv
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.rl import checkpoint as ckpt
from gym_pybullet_adrp_tpu.rl.ppo import PPOConfig, make_ppo
from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel


def test_train_state_roundtrip(tmp_path):
    rl_cfg = rlenv.RLConfig(
        aviary=AviaryConfig(ctrl_freq=30), act_type=ActionType.ONE_D_RPM
    )
    params = drone_params(DroneModel.CF2X)
    init_xyzs = np.array([[0.0, 0.0, 0.1125]])
    cfg = PPOConfig(n_envs=8, n_steps=8, n_epochs=1, n_minibatches=2)
    init_fn, train_step, _ = make_ppo(
        cfg, rl_cfg, params, init_xyzs, np.zeros((1, 3))
    )
    ts = init_fn(jax.random.PRNGKey(3))
    ts, _ = jax.jit(train_step)(ts)

    ckpt.save_checkpoint(tmp_path / "ck", ts, step=1)
    template = init_fn(jax.random.PRNGKey(0))
    restored, step = ckpt.restore_checkpoint(tmp_path / "ck", template)
    assert step == 1

    # bit-exact resume: another train step from saved vs restored state
    ts_a, m_a = jax.jit(train_step)(ts)
    ts_b, m_b = jax.jit(train_step)(restored)
    np.testing.assert_array_equal(
        np.asarray(m_a["loss"]), np.asarray(m_b["loss"])
    )
    leaves_a = jax.tree_util.tree_leaves(ts_a.params)
    leaves_b = jax.tree_util.tree_leaves(ts_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_policy_export_roundtrip(tmp_path):
    from gym_pybullet_adrp_tpu.models.policy import ActorCritic

    net = ActorCritic(act_dim=4)
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 72)))
    path = ckpt.save_policy(tmp_path / "m.msgpack", p)
    p2 = ckpt.load_policy(path, net.init(jax.random.PRNGKey(1), jnp.zeros((1, 72))))
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
