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


def test_shipped_pixels_policy_races_from_raw_frames():
    """The shipped CAMERA policy (conv actor-critic over 32x24 drone-POV
    frames ray-cast in-graph) still races: over a few fixed starts the
    greedy rollout earns large shaped return, incl. a full two-gate run."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from gym_pybullet_adrp_tpu.envs import race as race_mod
    from gym_pybullet_adrp_tpu.envs import race_rl
    from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic
    from gym_pybullet_adrp_tpu.utils.enums import Physics

    cfg = load_config("configs/twogates.yaml")
    spec = race_mod.RaceSpec.from_config(
        cfg, 1, RaceMode.COMPARE, Physics.PYB
    )
    track = race_mod.track_from_config(cfg, 1)
    w, h = 32, 24
    net = CnnActorCritic(act_dim=4, img_h=h, img_w=w)
    params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, h * w * 3)))
    with open("agents/example_pixels_policy.msgpack", "rb") as f:
        params = serialization.from_bytes(params0, f.read())

    B = 4
    st = jax.vmap(lambda k: race_rl.rl_race_reset(spec, track, k))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    rgb = jax.jit(jax.vmap(
        lambda s: race_rl.compute_rgb_obs(spec, s, width=w, height=h)
    ))
    step = jax.jit(lambda st, a, keys: race_rl.batched_rl_race_step(
        spec, track, st, a, keys, end_after_gate=2
    ))
    apply = jax.jit(net.apply)

    obs = rgb(st)
    ret = np.zeros(B)
    done_seen = np.zeros(B, bool)
    for i in range(160):
        mean, _, _ = apply(params, obs)
        a = jnp.clip(mean, -1, 1).reshape(B, 1, 4)
        st, _, r, te, tr = step(
            st, a, jax.random.split(jax.random.PRNGKey(100 + i), B)
        )
        ret += np.where(done_seen, 0.0, np.asarray(r, dtype=np.float64))
        done_seen |= np.asarray(te | tr)
        obs = rgb(st)
        if done_seen.all():
            break
    # at least one start completes both gates (return ~12); average shows
    # consistent progress toward/through gate 1
    assert ret.max() > 10.0, ret
    assert ret.mean() > 4.0, ret
