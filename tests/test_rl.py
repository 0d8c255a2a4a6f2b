"""RL stack tests: env semantics, PPO learner mechanics, distributed step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import rl as rlenv
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.rl.ppo import PPOConfig, make_ppo
from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel

PARAMS = drone_params(DroneModel.CF2X)
INIT_XYZS = np.array([[0.0, 0.0, 0.1125]])
INIT_RPYS = np.zeros((1, 3))


def _cfg(act=ActionType.RPM, task="hover", n=1):
    return rlenv.RLConfig(
        aviary=AviaryConfig(ctrl_freq=30, num_drones=n), act_type=act, task=task
    )


def test_obs_contains_action_history():
    cfg = _cfg()
    state = rlenv.rl_reset(cfg, INIT_XYZS, INIT_RPYS)
    action = jnp.full((1, 4), 0.25)
    state, obs, *_ = rlenv.rl_step(cfg, PARAMS, state, action)
    # newest action is the last block of the obs vector
    np.testing.assert_allclose(np.asarray(obs[0, -4:]), 0.25, atol=1e-6)
    # older slots still zero
    np.testing.assert_allclose(np.asarray(obs[0, 12:16]), 0.0, atol=1e-6)


def test_hover_reward_formula():
    cfg = _cfg()
    state = rlenv.rl_reset(cfg, INIT_XYZS, INIT_RPYS)
    r = float(rlenv.compute_reward(cfg, state))
    err = np.linalg.norm([0, 0, 1 - 0.1125])
    assert abs(r - max(0, 2 - err**4)) < 1e-5


def test_truncation_on_tilt_and_bounds():
    cfg = _cfg()
    state = rlenv.rl_reset(cfg, np.array([[1.6, 0.0, 0.5]]), INIT_RPYS)
    assert bool(rlenv.compute_truncated(cfg, state))
    state = rlenv.rl_reset(cfg, INIT_XYZS, np.array([[0.5, 0.0, 0.0]]))
    assert bool(rlenv.compute_truncated(cfg, state))
    state = rlenv.rl_reset(cfg, INIT_XYZS, INIT_RPYS)
    assert not bool(rlenv.compute_truncated(cfg, state))


def test_multihover_reward_sums_drones():
    init = np.array([[0.0, 0.0, 0.1125], [0.3, 0.3, 0.1125]])
    cfg = _cfg(task="multihover", n=2)
    state = rlenv.rl_reset(cfg, init, np.zeros((2, 3)))
    r = float(rlenv.compute_reward(cfg, state))
    # two drones, targets z + 1/(i+1)
    e0 = np.linalg.norm([0, 0, 1.0])
    e1 = np.linalg.norm([0, 0, 0.5])
    expected = max(0, 2 - e0**4) + max(0, 2 - e1**4)
    assert abs(r - expected) < 1e-5


def test_autoreset_restores_initial_state():
    cfg = _cfg()
    reset_state = rlenv.rl_reset(cfg, INIT_XYZS, INIT_RPYS)
    # start far out of bounds -> truncates immediately on step
    bad = rlenv.rl_reset(cfg, np.array([[5.0, 0.0, 0.5]]), INIT_RPYS)
    new_state, obs, reward, term, trunc = rlenv.autoreset_step(
        cfg, PARAMS, reset_state, bad, jnp.zeros((1, 4))
    )
    assert bool(trunc)
    # state jumped back to the reset template's pose (+ obs reflects it)
    np.testing.assert_allclose(
        np.asarray(new_state.core.phys.pos), INIT_XYZS, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(obs[0, :3]), INIT_XYZS[0], atol=1e-6)


def test_one_d_rpm_symmetry():
    """ONE_D_RPM must keep the drone perfectly level (all motors equal)."""
    cfg = _cfg(act=ActionType.ONE_D_RPM)
    state = rlenv.rl_reset(cfg, INIT_XYZS, INIT_RPYS)
    for _ in range(20):
        state, obs, *_ = rlenv.rl_step(
            cfg, PARAMS, state, jnp.full((1, 1), 0.1)
        )
    rpy = np.asarray(state.core.phys.rpy[0])
    np.testing.assert_allclose(rpy, 0.0, atol=1e-5)  # f32 torque cancellation
    # a=0.1 -> thrust 1.01x weight -> ~0.098 m/s^2 net: ~2 cm climb in 0.67 s
    assert float(state.core.phys.pos[0, 2]) > 0.125  # climbed


def test_ppo_improves_hover_reward():
    """A few PPO iterations must increase mean reward on ONE_D_RPM hover."""
    rl_cfg = _cfg(act=ActionType.ONE_D_RPM)
    cfg = PPOConfig(n_envs=64, n_steps=32, n_minibatches=4, n_epochs=4)
    init_fn, train_step, _ = make_ppo(cfg, rl_cfg, PARAMS, INIT_XYZS, INIT_RPYS)
    ts = init_fn(jax.random.PRNGKey(0))
    train = jax.jit(train_step)
    ts, m0 = train(ts)
    first = float(m0["mean_reward"])
    for _ in range(15):
        ts, m = train(ts)
    last = float(m["mean_reward"])
    assert last > first + 0.05, (first, last)


def test_distributed_matches_multi_device():
    """Sharded PPO train step runs on the 8-device CPU mesh and the params
    stay replicated across devices."""
    from gym_pybullet_adrp_tpu.parallel.distributed import (
        make_distributed_ppo, make_mesh,
    )

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    rl_cfg = _cfg()
    cfg = PPOConfig(n_envs=4, n_steps=8, n_epochs=1, n_minibatches=2)
    global_init, train_step = make_distributed_ppo(
        mesh, cfg, rl_cfg, PARAMS, INIT_XYZS, INIT_RPYS
    )
    ts = global_init(jax.random.PRNGKey(0))
    ts, metrics = train_step(ts)
    ts, metrics = train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    # env batch is globally sharded: 8 devices x 4 envs
    assert ts.last_obs.shape[0] == 32


def _micro_batches(key, g, mb, obs_dim=6, act_dim=2):
    from gym_pybullet_adrp_tpu.rl.ppo import Transition

    ks = jax.random.split(key, 5)
    batch = Transition(
        obs=jax.random.normal(ks[0], (g, mb, obs_dim), jnp.float32),
        action=jax.random.normal(ks[1], (g, mb, act_dim), jnp.float32),
        logp=0.1 * jax.random.normal(ks[2], (g, mb), jnp.float32),
        value=None, reward=None, done=None,
    )
    adv = jax.random.normal(ks[3], (g, mb), jnp.float32)
    ret = jax.random.normal(ks[4], (g, mb), jnp.float32)
    return batch, adv, ret


def test_grad_accum_equals_mean_of_micrograds():
    """grouped_update with grad_accum=g applies exactly the MEAN of the g
    per-micro-batch gradients (VERDICT r4 item 5). tx=sgd(1.0) makes the
    param delta equal minus the applied gradient, exposing it bitwise."""
    from functools import partial

    import optax

    from gym_pybullet_adrp_tpu.models.policy import ActorCritic
    from gym_pybullet_adrp_tpu.rl.ppo import (
        Transition, grouped_update, ppo_loss,
    )

    g, mb = 4, 16
    net = ActorCritic(act_dim=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 6), jnp.float32))
    batch, adv, ret = _micro_batches(jax.random.PRNGKey(1), g, mb)
    loss_fn = partial(ppo_loss, net, 0.2, 0.5, 0.0)
    tx = optax.sgd(1.0)

    (new_params, _), losses = jax.jit(
        partial(grouped_update, loss_fn, tx, None, g)
    )(params, tx.init(params), (batch, adv, ret))
    assert losses.shape == (g,)

    acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(g):
        micro = Transition(
            obs=batch.obs[i], action=batch.action[i], logp=batch.logp[i],
            value=None, reward=None, done=None,
        )
        _, grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, micro, adv[i], ret[i]
        )
        acc = jax.tree_util.tree_map(jnp.add, acc, grads)
    mean_grads = jax.tree_util.tree_map(lambda t: t / g, acc)

    applied = jax.tree_util.tree_map(
        lambda old, new: old - new, params, new_params
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        applied, mean_grads,
    )


def test_grad_accum_divisibility_assert():
    """grad_accum must divide n_minibatches — the guard fires at trace."""
    rl_cfg = _cfg(act=ActionType.ONE_D_RPM)
    cfg = PPOConfig(n_envs=8, n_steps=4, n_epochs=1, n_minibatches=4,
                    grad_accum=3)
    init_fn, train_step, _ = make_ppo(cfg, rl_cfg, PARAMS, INIT_XYZS,
                                      INIT_RPYS)
    ts = init_fn(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="grad_accum"):
        train_step(ts)


def test_grad_accum_one_pmean_per_group_on_mesh():
    """Under a mesh axis, grouped_update fires ONE pmean per update group,
    AFTER the g-micro accumulation: per-device deltas must all equal the
    global mean over every (device, micro) gradient."""
    from functools import partial

    import optax
    from jax.sharding import PartitionSpec as P

    from gym_pybullet_adrp_tpu.models.policy import ActorCritic
    from gym_pybullet_adrp_tpu.parallel.distributed import (
        make_mesh, shard_map,
    )
    from gym_pybullet_adrp_tpu.rl.ppo import (
        Transition, grouped_update, ppo_loss,
    )

    n_dev, g, mb = 8, 2, 8
    mesh = make_mesh(n_dev)
    net = ActorCritic(act_dim=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 6), jnp.float32))
    # (n_dev * g, mb, ...) micro-batches, sharded over dp: each device
    # accumulates its own g micros, then one pmean averages over devices
    batch, adv, ret = _micro_batches(jax.random.PRNGKey(1), n_dev * g, mb)
    loss_fn = partial(ppo_loss, net, 0.2, 0.5, 0.0)
    tx = optax.sgd(1.0)
    opt0 = tx.init(params)

    def local(params, opt_state, xs):
        xs = jax.tree_util.tree_map(
            lambda x: None if x is None else x.reshape((g,) + x.shape[1:]),
            xs, is_leaf=lambda v: v is None,
        )
        (p, o), losses = grouped_update(
            loss_fn, tx, "dp", g, params, opt_state, xs
        )
        return p, losses

    rep = jax.tree_util.tree_map(lambda _: P(), params)
    rep_opt = jax.tree_util.tree_map(lambda _: P(), opt0)
    dp = jax.tree_util.tree_map(
        lambda x: None if x is None else P("dp"), (batch, adv, ret),
        is_leaf=lambda v: v is None,
    )
    new_params, losses = jax.jit(shard_map(
        local, mesh, in_specs=(rep, rep_opt, dp),
        out_specs=(rep, P("dp")), check_rep=False,
    ))(params, opt0, (batch, adv, ret))
    assert losses.shape == (n_dev * g,)

    # reference: global mean over all n_dev*g micro-batch gradients
    acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(n_dev * g):
        micro = Transition(
            obs=batch.obs[i], action=batch.action[i], logp=batch.logp[i],
            value=None, reward=None, done=None,
        )
        _, grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, micro, adv[i], ret[i]
        )
        acc = jax.tree_util.tree_map(jnp.add, acc, grads)
    mean_grads = jax.tree_util.tree_map(lambda t: t / (n_dev * g), acc)

    # every device replica must hold the SAME post-pmean result
    for leaf, ref in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(jnp.subtract, params, mean_grads)
        ),
    ):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
        np.testing.assert_allclose(
            shards[0], np.asarray(ref), rtol=1e-5, atol=1e-6
        )


def test_grad_accum_distributed_replicas_stay_synced():
    """End-to-end: make_distributed_ppo with grad_accum=2 on the 8-device
    mesh — params must stay bit-identical across replicas after updates
    (each device sees DIFFERENT shard data, so any missing/misplaced
    pmean diverges the replicas)."""
    from gym_pybullet_adrp_tpu.parallel.distributed import (
        make_distributed_ppo, make_mesh,
    )

    mesh = make_mesh(8)
    rl_cfg = _cfg()
    cfg = PPOConfig(n_envs=4, n_steps=8, n_epochs=2, n_minibatches=4,
                    grad_accum=2)
    global_init, train_step = make_distributed_ppo(
        mesh, cfg, rl_cfg, PARAMS, INIT_XYZS, INIT_RPYS
    )
    ts = global_init(jax.random.PRNGKey(0))
    ts, metrics = train_step(ts)
    ts, metrics = train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(ts.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == 8
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


def test_pjit_tp_matches_single_device():
    """DP x TP pjit train step (4x2 mesh, Megatron-sharded ActorCritic)
    computes the same update as the unsharded single-device step."""
    from gym_pybullet_adrp_tpu.parallel.distributed import (
        make_mesh_2d, make_pjit_ppo,
    )

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh_2d(4, 2)
    rl_cfg = _cfg()
    cfg = PPOConfig(n_envs=8, n_steps=8, n_epochs=2, n_minibatches=2)
    init, step = make_pjit_ppo(
        mesh, cfg, rl_cfg, PARAMS, INIT_XYZS, INIT_RPYS
    )
    ref_init, ref_step, _ = make_ppo(cfg, rl_cfg, PARAMS, INIT_XYZS, INIT_RPYS)

    ts = init(jax.random.PRNGKey(3))
    ref_ts = jax.jit(ref_init)(jax.random.PRNGKey(3))
    for _ in range(2):
        ts, metrics = step(ts)
        ref_ts, ref_metrics = jax.jit(ref_step)(ref_ts)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        ts.params, ref_ts.params,
    )
    # the hidden dims really are sharded over 'tp'
    k0 = ts.params["params"]["Dense_0"]["kernel"]
    assert "tp" in str(k0.sharding.spec)


def test_rgb_obs_renders_scene():
    """In-graph drone-POV pixel obs: flat [0,1], sky above / ground below."""
    cfg = _cfg()
    state = rlenv.rl_reset(cfg, INIT_XYZS, INIT_RPYS)
    w, h = 16, 12
    flat = rlenv.compute_rgb_obs(cfg, PARAMS, state, width=w, height=h)
    assert flat.shape == (h * w * 3,)
    img = np.asarray(flat).reshape(h, w, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # hovering level at z=0.1125 looking forward: sky in the top rows,
    # ground checkerboard in the bottom rows
    sky = np.array([0.7, 0.85, 1.0])
    assert np.allclose(img[0, w // 2], sky, atol=0.02)
    assert not np.allclose(img[-1, w // 2], sky, atol=0.2)


def test_cnn_ppo_trains_on_pixels():
    """PPO with CnnActorCritic over the RGB hover adapter: one iteration
    runs and the loss is finite (pixels-to-actions end-to-end)."""
    from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic
    from gym_pybullet_adrp_tpu.rl.ppo import make_ppo_core, rgb_hover_adapter

    rl_cfg = _cfg()
    cfg = PPOConfig(n_envs=4, n_steps=8, n_epochs=1, n_minibatches=2)
    w, h = 16, 12
    adapter = rgb_hover_adapter(
        cfg, rl_cfg, PARAMS, INIT_XYZS, INIT_RPYS, width=w, height=h
    )
    network = CnnActorCritic(act_dim=adapter.act_dim, img_h=h, img_w=w)
    init_fn, train_step, _ = make_ppo_core(cfg, adapter, network=network)
    ts = jax.jit(init_fn)(jax.random.PRNGKey(0))
    assert ts.last_obs.shape == (4, h * w * 3)
    ts, metrics = jax.jit(train_step)(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_jax_vector_env_matches_single_env():
    """JaxVectorEnv: batched spaces, SB3-style autoreset, lane 0 equals the
    single HoverAviary instance stepped with the same actions."""
    from gym_pybullet_adrp_tpu.envs import HoverAviary, JaxVectorEnv

    B = 4
    venv = JaxVectorEnv(B)
    assert venv.action_space.shape == (B, 1, 4)
    obs, _ = venv.reset()
    assert obs.shape == (B,) + venv.single_observation_space.shape

    env = HoverAviary()
    sobs, _ = env.reset()
    np.testing.assert_allclose(obs[0], sobs, atol=1e-6)

    act = np.full((B, 1, 4), 0.2, dtype=np.float32)
    for _ in range(3):
        obs, rew, term, trunc, _ = venv.step(act)
        sobs, srew, sterm, strunc, _ = env.step(act[0])
    assert rew.shape == (B,) and term.shape == (B,)
    np.testing.assert_allclose(obs[0], sobs, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(rew[0], srew, rtol=1e-5, atol=1e-5)


def test_jax_vector_env_final_observation():
    """On episode end the SB3/gymnasium 'final_observation' info carries the
    terminal obs while the returned obs is the fresh episode's first obs."""
    from gym_pybullet_adrp_tpu.envs import JaxVectorEnv

    B = 2
    venv = JaxVectorEnv(B, ctrl_freq=30)
    obs0, _ = venv.reset()
    # slam full throttle: the tilt/bounds truncation fires within the episode
    act = np.full((B, 1, 4), 1.0, dtype=np.float32)
    infos = {}
    for _ in range(30 * 9):
        obs, rew, term, trunc, infos = venv.step(act)
        if "final_observation" in infos:
            break
    assert "final_observation" in infos
    mask = infos["_final_observation"]
    assert mask.any()
    i = int(np.flatnonzero(mask)[0])
    final = infos["final_observation"][i]
    assert final is not None and final.shape == obs[i].shape
    # returned obs is the reset obs, not the terminal one
    np.testing.assert_allclose(obs[i], obs0[i], atol=1e-6)
    assert not np.allclose(final, obs0[i], atol=1e-6)
    # gymnasium >= 1.0 spellings carry the same data, and the declared
    # autoreset mode is SAME_STEP (ADVICE r1: 1.x consumers default to
    # next-step autoreset and would otherwise misbootstrap V(s_T))
    import gymnasium

    np.testing.assert_array_equal(infos["_final_obs"], mask)
    np.testing.assert_allclose(infos["final_obs"][i], final)
    assert infos["final_info"][i] == {}
    assert (
        venv.metadata["autoreset_mode"]
        == gymnasium.vector.AutoresetMode.SAME_STEP
    )


def test_jax_vector_env_step_before_reset_raises():
    from gym_pybullet_adrp_tpu.envs import JaxVectorEnv

    venv = JaxVectorEnv(2)
    with pytest.raises(RuntimeError, match="reset"):
        venv.step(np.zeros((2, 1, 4), dtype=np.float32))


def test_jax_vector_env_single_transfer_contract():
    """VALIDATION §5c: one explicit upload + one explicit download per
    step. jax.transfer_guard('disallow') blocks any IMPLICIT transfer, so
    a regression that fetches outputs piecemeal (e.g. np.asarray(reward))
    or forgets the device_put fails loudly here."""
    import jax

    from gym_pybullet_adrp_tpu.envs import JaxVectorEnv

    B = 2
    venv = JaxVectorEnv(B, ctrl_freq=30)
    act = np.full((B, 1, 4), 0.1, dtype=np.float32)
    # warm up compilation outside the guard (compilation may transfer)
    venv.reset()
    venv.step(act)
    with jax.transfer_guard("disallow"):
        venv.reset()
        obs, rew, term, trunc, _ = venv.step(act)
    assert obs.shape[0] == B and rew.shape == (B,)


def test_jax_vector_env_seeded_reset():
    """reset(seed) keys the start-pose jitter AND the autoreset chain
    (VERDICT r2 item 7): identical seeds -> bitwise-equal batches and
    trajectories, different seeds -> different initial batches, and the
    batch has per-env initial-state diversity."""
    from gym_pybullet_adrp_tpu.envs import JaxVectorEnv

    B = 4
    venv = JaxVectorEnv(B, ctrl_freq=30, init_pos_jitter=0.1,
                        init_rpy_jitter=0.05)
    o1, _ = venv.reset(seed=1)
    o1b, _ = venv.reset(seed=1)
    np.testing.assert_array_equal(o1, o1b)
    o2, _ = venv.reset(seed=2)
    assert not np.allclose(o1, o2)
    # per-env diversity within one batch (no shared template broadcast)
    assert not np.allclose(o1[0], o1[1])
    # keyed autoreset chain: same seed -> bitwise-equal trajectories
    act = np.full((B, 1, 4), 0.3, dtype=np.float32)
    venv.reset(seed=3)
    tr1 = np.stack([venv.step(act)[0] for _ in range(3)])
    venv.reset(seed=3)
    tr2 = np.stack([venv.step(act)[0] for _ in range(3)])
    np.testing.assert_array_equal(tr1, tr2)
    # default (jitter 0) keeps the reference-parity deterministic reset
    venv0 = JaxVectorEnv(B, ctrl_freq=30)
    a, _ = venv0.reset(seed=1)
    b, _ = venv0.reset(seed=2)
    np.testing.assert_array_equal(a, b)
