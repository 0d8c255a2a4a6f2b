"""Row-major race RL path vs the general shaped path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import race as race_mod, race_rl, race_rl_rowfast
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode


def test_rowfast_matches_general_path():
    """Deterministic scenario (getting_started: no reset randomization):
    identical initial state, identical actions — obs/reward/done must track
    the general shaped path within closed-loop f32 tolerance with no
    discrete (flag/gate/done) disagreements."""
    cfg = load_config("getting_started")
    spec = race_mod.RaceSpec.from_config(cfg, 1, RaceMode.COMPARE, Physics.PYB)
    track = race_mod.track_from_config(cfg, 1)
    B = 128
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, end_after_gate=0, interpret=True
    )
    st_row = reset(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    bstate = jax.vmap(lambda k: race_rl.rl_race_reset(spec, track, k))(keys)

    act = jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.4, 0.0]], dtype=jnp.float32), (B, 1)
    )
    for i in range(8):
        k = jax.random.PRNGKey(100 + i)
        st_row, obs_r, rew_r, done_r = step(st_row, act, k)
        bstate, obs_g, rew_g, te, tr = race_rl.batched_rl_race_step(
            spec, track, bstate, act[:, None, :],
            jax.random.split(k, B), fast=False,
        )
    obs_g = obs_g.reshape(B, -1)
    # continuous channels drift only within closed-loop tolerance
    assert float(jnp.abs(obs_r - obs_g).max()) < 0.5
    # discrete channels identical: flags + gate id
    for sl in (slice(28, 32), slice(44, 48), slice(48, 49)):
        np.testing.assert_array_equal(
            np.asarray(obs_r[:, sl]), np.asarray(obs_g[:, sl])
        )
    np.testing.assert_array_equal(
        np.asarray(done_r), np.asarray(te | tr)
    )
    np.testing.assert_allclose(
        np.asarray(rew_r), np.asarray(rew_g), atol=0.02
    )


def test_rowfast_support_predicate():
    cfg = load_config("level2")
    spec2 = race_mod.RaceSpec.from_config(cfg, 1, RaceMode.COMPARE, Physics.PYB)
    assert not race_rl_rowfast.supports(spec2)  # gate randomization
    cfg0 = load_config("twogates")
    spec0 = race_mod.RaceSpec.from_config(cfg0, 1, RaceMode.COMPARE, Physics.PYB)
    assert race_rl_rowfast.supports(spec0)
    specC = race_mod.RaceSpec.from_config(cfg0, 1, RaceMode.COMPETE, Physics.PYB)
    assert not race_rl_rowfast.supports(specC)
