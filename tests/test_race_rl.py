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
