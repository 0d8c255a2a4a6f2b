"""Shaped race-RL pathway tests (RewardWrapper semantics in-graph)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import race as race_mod
from gym_pybullet_adrp_tpu.envs import race_rl
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode


def _setup(config="twogates"):
    cfg = load_config(config)
    spec = race_mod.RaceSpec.from_config(
        cfg, num_drones=1, racemode=RaceMode.COMPARE, physics=Physics.PYB
    )
    track = race_mod.track_from_config(cfg, num_drones=1)
    return spec, track


def test_reset_initializes_shaping_state():
    spec, track = _setup()
    st = race_rl.rl_race_reset(spec, track, jax.random.PRNGKey(0))
    assert int(st.current_gate_id) == 0
    # tracked target = gate 0 pose from the obs layout
    np.testing.assert_allclose(
        np.asarray(st.current_target[:3]),
        np.asarray(track.gates_nominal[0, :3]), atol=0.3,  # randomized start
    )


def test_progress_reward_sign():
    """Flying toward the tracked gate earns positive cumulative dense
    reward; the same approach flown backwards earns negative."""
    spec, track = _setup()
    step = jax.jit(lambda s, a: race_rl.rl_race_step(spec, track, s, a))

    def fly(sign):
        st = race_rl.rl_race_reset(spec, track, jax.random.PRNGKey(0))
        gate0 = np.asarray(track.gates_nominal[0, :3])
        total = 0.0
        for k in range(100):
            pos = np.asarray(st.race.phys.pos[0])
            tgt = gate0 if sign > 0 else pos + (pos - gate0)
            d = np.clip(tgt - pos, -0.5, 0.5)
            if k < 25:  # lift off first
                d = np.array([0.0, 0.0, 0.4])
            action = jnp.asarray(
                np.concatenate([d, [0.0]]), dtype=jnp.float32
            )[None]
            st, obs, r, te, tr = step(st, action)
            total += float(r)
            if bool(te) or bool(tr):
                break
        return total

    toward = fly(+1)
    away = fly(-1)
    assert toward > away, (toward, away)
    assert toward > 0.1, toward


def test_gate_pass_bonus_and_early_termination():
    """Flying through gate 0 yields the +5 bonus; with end_after_gate=1 the
    episode terminates (DroneObservationWrapper semantics)."""
    spec, track = _setup()
    st = race_rl.rl_race_reset(spec, track, jax.random.PRNGKey(1))
    gate0 = np.asarray(track.gates_nominal[0])
    step = jax.jit(
        lambda s, a: race_rl.rl_race_step(
            spec, track, s, a, end_after_gate=1
        )
    )
    rewards = []
    terminated = False
    for k in range(250):
        pos = np.asarray(st.race.phys.pos[0])
        target = gate0[:3] + np.array([0.0, 0.0, 0.0])
        d = np.clip(target - pos, -0.6, 0.6)
        action = jnp.asarray(
            np.concatenate([d, [0.0]]), dtype=jnp.float32
        )[None]
        st, obs, r, te, tr = step(st, action)
        rewards.append(float(r))
        if bool(te) or bool(tr):
            terminated = True
            break
    assert int(st.race.current_gate[0]) >= 1 or max(rewards) >= 4.0
    assert terminated


def test_race_rgb_obs_shows_scene():
    """Camera-based racing obs: flat [0,1] pixels; the forward view from
    the start pose contains both sky and non-sky content."""
    spec, track = _setup("getting_started")
    st = race_rl.rl_race_reset(spec, track, jax.random.PRNGKey(0))
    w, h = 16, 12
    flat = race_rl.compute_rgb_obs(spec, st, width=w, height=h)
    assert flat.shape == (h * w * 3,)
    img = np.asarray(flat).reshape(h, w, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    sky = np.array([0.7, 0.85, 1.0])
    sky_frac = (np.abs(img - sky).max(axis=-1) < 0.02).mean()
    assert 0.05 < sky_frac < 0.95  # something besides sky is visible


def test_race_pixels_ppo_step():
    """train_race --obs rgb composition: CnnActorCritic PPO over the
    general race path with rendered observations."""
    from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic
    from gym_pybullet_adrp_tpu.rl.ppo import EnvAdapter, PPOConfig, make_ppo_core

    spec, track = _setup("twogates")
    B = 2
    cfg = PPOConfig(n_envs=B, n_steps=4, n_epochs=1, n_minibatches=2)
    w, h = 16, 12
    rgb = jax.vmap(
        lambda s: race_rl.compute_rgb_obs(spec, s, width=w, height=h)
    )

    def batched_reset(key):
        states = jax.vmap(
            lambda k: race_rl.rl_race_reset(spec, track, k)
        )(jax.random.split(key, B))
        return states, rgb(states)

    def step(env_state, action, key):
        keys = jax.random.split(key, B)
        act = action.reshape(B, 1, 4)
        env_state, _, reward, term, trunc = race_rl.batched_rl_race_step(
            spec, track, env_state, act, keys
        )
        return env_state, rgb(env_state), reward, term | trunc

    adapter = EnvAdapter(
        batched_reset=batched_reset, step=step,
        obs_dim=h * w * 3, act_dim=4,
    )
    net = CnnActorCritic(act_dim=4, img_h=h, img_w=w)
    init_fn, train_step, _ = make_ppo_core(cfg, adapter, network=net)
    ts = jax.jit(init_fn)(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(train_step)(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_race_rgb_harness():
    """The pixels evaluator (scripts/eval_race_rgb.py): telemetry-based
    gate accounting over the general path with in-graph frames, both
    deterministic and stochastic modes, gimbal + body cameras."""
    import importlib.util as ilu
    from pathlib import Path

    import flax.serialization as fser
    import jax
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic

    repo = Path(__file__).resolve().parent.parent
    spec = ilu.spec_from_file_location(
        "err", repo / "scripts/eval_race_rgb.py"
    )
    err = ilu.module_from_spec(spec)
    spec.loader.exec_module(err)

    # random tiny policy at 16x12 (fast frames)
    net = CnnActorCritic(act_dim=4, img_h=12, img_w=16)
    params = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 12 * 16 * 3), jnp.float32)
    )
    path = repo / "results" / "_rgb_eval_test.msgpack"
    path.write_bytes(fser.to_bytes(params))
    try:
        for cam, stoch in (("velocity", False), ("body", True)):
            out = err.evaluate(
                str(path), "twogates", n_envs=8, img="16x12", fov=90.0,
                camera=cam, max_steps=3, stochastic=stoch,
            )
            assert set(out) >= {
                "gates_hist", "completion_rate", "mean_gates",
                "mean_lap_time", "camera",
            }
            assert sum(out["gates_hist"].values()) == 8
            assert out["camera"] == cam
    finally:
        path.unlink()
