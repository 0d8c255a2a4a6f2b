"""Race environment tests: geometry, progress, elimination, modes,
randomization, determinism, and the full hardcoded-controller race.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs.race import (
    MultiRaceAviary, RaceSpec, race_reset, race_step, track_from_config,
)
from gym_pybullet_adrp_tpu.ops import collision as col
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import Command, RaceMode


def test_gate_pass_rays_geometry():
    gate = jnp.asarray([1.0, -1.0, 1.0, 0.0, 0.0, 0.0])
    r = jnp.asarray(0.06)
    # drone centered in the tall opening (height 1.0) -> pass
    assert bool(col.gate_pass_rays(jnp.asarray([1.0, -1.0, 1.0]), gate, 0, r))
    # 30 cm to the side of the ray fan -> no pass
    assert not bool(
        col.gate_pass_rays(jnp.asarray([1.0, -0.7, 1.0]), gate, 0, r)
    )
    # above the ray span (height + 0.1875 + radius) -> no pass
    assert not bool(
        col.gate_pass_rays(jnp.asarray([1.0, -1.0, 1.3]), gate, 0, r)
    )
    # low gate type uses z = 0.525 regardless of pose z (reference :477-482)
    assert bool(
        col.gate_pass_rays(jnp.asarray([1.0, -1.0, 0.525]), gate, 1, r)
    )


def test_gate_collision_geometry():
    gate = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    r = jnp.asarray(0.06)
    # through the center of the opening: no hit
    assert not bool(
        col.drone_gate_collision(jnp.asarray([0.0, 0.0, 1.0]), gate, r)
    )
    # touching the top beam (z = 1.225)
    assert bool(
        col.drone_gate_collision(jnp.asarray([0.0, 0.0, 1.225]), gate, r)
    )
    # touching a vertical beam (x = 0.225)
    assert bool(
        col.drone_gate_collision(jnp.asarray([0.225, 0.0, 1.0]), gate, r)
    )
    # hitting the support column below the gate
    assert bool(
        col.drone_gate_collision(jnp.asarray([0.0, 0.0, 0.5]), gate, r)
    )
    # flying 10 cm above the support top (z=0.8): must NOT hit
    assert not bool(
        col.drone_gate_collision(jnp.asarray([0.0, 0.03, 0.9]), gate, r)
    )


def _make_env(config="getting_started", **kw):
    return MultiRaceAviary(config, num_drones=2, **kw)


def test_obs_layout_and_spaces():
    env = _make_env()
    obs, info = env.reset()
    assert obs.shape == (2, 49)
    assert env.observation_space.shape == (2, 49)
    assert env.action_space.shape == (2, 4)
    # current gate id is the last slot
    assert np.all(obs[:, 48] == 0)
    # kin block starts at configured positions
    np.testing.assert_allclose(obs[0, :3], [0.9, 0.9, 0.05], atol=1e-6)

    env_c = _make_env(racemode=RaceMode.COMPETE)
    obs, _ = env_c.reset()
    assert obs.shape == (2, 55)
    # opponent pose block mirrors the other drone's kin obs
    np.testing.assert_allclose(obs[0, 49:52], obs[1, 0:3], atol=1e-6)
    np.testing.assert_allclose(obs[1, 49:52], obs[0, 0:3], atol=1e-6)


def test_stop_command_grounds_drone():
    env = _make_env()
    env.reset()
    for _ in range(10):
        obs, *_ = env.step([(Command.STOP, []), (Command.STOP, [])])
    # motors off -> stays on the ground
    assert np.all(obs[:, 2] < 0.1)


def test_determinism_fixed_seed():
    env = _make_env("level2")
    obs1, _ = env.reset(seed=7)
    traj1 = []
    for _ in range(12):
        o, *_ = env.step(np.tile([0.9, 0.9, 0.4, 0.0], (2, 1)))
        traj1.append(o)
    obs2, _ = env.reset(seed=7)
    np.testing.assert_array_equal(obs1, obs2)
    for i in range(12):
        o, *_ = env.step(np.tile([0.9, 0.9, 0.4, 0.0], (2, 1)))
        np.testing.assert_array_equal(traj1[i], o)


def test_level2_randomization_varies_with_seed():
    env = _make_env("level2")
    o1, _ = env.reset(seed=1)
    o2, _ = env.reset(seed=2)
    # randomized start poses and gate positions must differ
    assert not np.allclose(o1[:, :3], o2[:, :3])
    s1 = np.asarray(env._jit_reset(jax.random.PRNGKey(1)).gates_actual)
    s2 = np.asarray(env._jit_reset(jax.random.PRNGKey(2)).gates_actual)
    assert not np.allclose(s1[:, :2], s2[:, :2])
    # type column untouched by randomization
    np.testing.assert_array_equal(s1[:, 6], s2[:, 6])


def test_level3_reseed_off_varies_between_episodes():
    env = _make_env("level3")
    o1, _ = env.reset()
    o2, _ = env.reset()
    assert not np.allclose(o1[:, :3], o2[:, :3])


def test_getting_started_reset_is_reproducible():
    env = _make_env("getting_started")
    o1, _ = env.reset()
    o2, _ = env.reset()
    np.testing.assert_array_equal(o1, o2)


def test_truncation_at_episode_end():
    env = _make_env()
    env.reset()
    spec = env.spec_
    # stop commands keep drones grounded; run past episode_len_sec
    steps = int(spec.episode_len_sec * spec.ctrl_freq) + 2
    truncated = False
    for _ in range(steps):
        _, _, terminated, truncated, _ = env.step(
            [(Command.STOP, []), (Command.STOP, [])]
        )
        if truncated:
            break
    assert truncated


def test_done_on_collision_and_completion_flags():
    """done_on_collision / done_on_completion are honored (the reference
    parsed done_on_completion at MultiRaceAviary.py:85 but never used it;
    here both config keys are wired into finish_ctrl_step)."""
    import dataclasses

    from gym_pybullet_adrp_tpu.envs.race import finish_ctrl_step

    config = load_config("getting_started")
    track = track_from_config(config, 2)
    spec_on = RaceSpec.from_config(config, 2, RaceMode.COMPARE)
    assert spec_on.done_on_collision and spec_on.done_on_completion
    spec_off = dataclasses.replace(
        spec_on, done_on_collision=False, done_on_completion=False
    )

    state = race_reset(spec_on, track, jax.random.PRNGKey(0))
    # drone 0 touching gate 0's top beam (opening center z + 0.225)
    g0 = np.asarray(track.gates_nominal)[0]
    pos = state.phys.pos.at[0].set(
        jnp.asarray([g0[0], g0[1], g0[2] + 0.225], dtype=state.phys.pos.dtype)
    )
    crash_state = state._replace(phys=state.phys._replace(pos=pos))
    st_on, *_ = finish_ctrl_step(spec_on, track, crash_state)
    assert bool(st_on.eliminated[0])
    st_off, *_ = finish_ctrl_step(spec_off, track, crash_state)
    assert not bool(st_off.eliminated[0])

    # all drones finished: terminates only under done_on_completion
    fin_state = state._replace(finished=jnp.ones((2,), dtype=bool))
    _, _, _, term_on, _, info_on = finish_ctrl_step(spec_on, track, fin_state)
    assert bool(term_on) and bool(info_on["task_completed"])
    _, _, _, term_off, _, info_off = finish_ctrl_step(
        spec_off, track, fin_state
    )
    assert not bool(term_off)
    # task_completed still reports completion even when it doesn't terminate
    assert bool(info_off["task_completed"])


@pytest.mark.slow
def test_full_race_hardcoded_controller():
    """End-to-end: the scripted racer passes all 4 gates (flagship parity
    anchor for scripts/sim.py)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from gym_pybullet_adrp_tpu.utils.utils import load_controller

    env = _make_env()
    obs, info = env.reset()
    agents = []
    for d in range(2):
        i2 = dict(info)
        i2["delay"] = d
        agents.append(
            load_controller("agents/hardcoded.py")(d, obs[d], i2)
        )
    terminated = truncated = False
    step = 0
    while not (terminated or truncated):
        t = step / env.CTRL_FREQ
        actions = [a.predict(obs[i], ep_time=t) for i, a in enumerate(agents)]
        obs, _, terminated, truncated, info = env.step(actions)
        step += 1
    assert np.all(env.drones_finished), (
        env.current_gate, env.drones_eliminated
    )
    assert info["task_completed"]
