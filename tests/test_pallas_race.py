"""Pallas race-window kernel vs the XLA race path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.control import commander as cmdr_mod
from gym_pybullet_adrp_tpu.envs import race as race_mod, race_fast
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import Command, Physics, RaceMode


def _setup():
    cfg = load_config("getting_started")
    spec = race_mod.RaceSpec.from_config(cfg, 2, RaceMode.COMPARE, Physics.PYB)
    track = race_mod.track_from_config(cfg, 2)
    return spec, track


def _cmds(n, cmd, args):
    ids = np.zeros(n, np.int32)
    vec = np.zeros((n, cmdr_mod.ARGS_DIM), np.float32)
    for i in range(n):
        cid, v = cmdr_mod.pack_command(cmd, args)
        ids[i] = cid
        vec[i] = v
    return jnp.asarray(ids), jnp.asarray(vec)


def test_fast_race_window_matches_xla_closed_loop():
    """Takeoff + FULLSTATE sequence: the kernel path tracks the XLA path
    within closed-loop float32 tolerance and reaches the same altitude."""
    spec, track = _setup()
    key = jax.random.PRNGKey(0)
    s_ref = race_mod.race_reset(spec, track, key)
    s_fast = race_mod.race_reset(spec, track, key)

    seq = (
        [(Command.TAKEOFF, [0.3, 1.0])]
        + [(Command.NONE, [])] * 12
        + [(
            Command.FULLSTATE,
            ([0.5, 0.5, 0.5], [0, 0, 0], [0, 0, 0], 0.1, [0, 0, 0], 0.6),
        )] * 5
    )
    for cmd, args in seq:
        ids, vec = _cmds(2, cmd, args)
        s_ref, *_ = race_mod.race_step(spec, track, s_ref, ids, vec)
        s_fast, *_ = race_fast.race_step_fast(
            spec, track, s_fast, ids, vec, interpret=True
        )
    dpos = float(jnp.abs(s_ref.phys.pos - s_fast.phys.pos).max())
    assert dpos < 0.05, dpos  # chaotic f32 divergence stays closed-loop small
    # same discrete outcomes
    np.testing.assert_array_equal(
        np.asarray(s_ref.eliminated), np.asarray(s_fast.eliminated)
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.current_gate), np.asarray(s_fast.current_gate)
    )
    # both reached takeoff altitude range
    assert 0.12 < float(s_fast.phys.pos[0, 2]) < 0.8


def test_fast_stop_grounds():
    spec, track = _setup()
    s = race_mod.race_reset(spec, track, jax.random.PRNGKey(1))
    ids, vec = _cmds(2, Command.STOP, [])
    for _ in range(3):
        s, *_ = race_fast.race_step_fast(spec, track, s, ids, vec, interpret=True)
    assert np.all(np.asarray(s.phys.pos[:, 2]) < 0.1)


def test_batched_matches_single():
    """The batched kernel path equals the per-env fast path bitwise."""
    spec, track = _setup()
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    bstate = jax.vmap(lambda k: race_mod.race_reset(spec, track, k))(keys)
    singles = [race_mod.race_reset(spec, track, k) for k in keys]
    ids, vec = _cmds(2, Command.TAKEOFF, [0.3, 2.0])
    bids = jnp.tile(ids[None], (B, 1))
    bvec = jnp.tile(vec[None], (B, 1, 1))
    bstate, *_ = race_fast.batched_race_step_fast(
        spec, track, bstate, bids, bvec, interpret=True
    )
    for i, s in enumerate(singles):
        s, *_ = race_fast.race_step_fast(spec, track, s, ids, vec, interpret=True)
        np.testing.assert_allclose(
            np.asarray(bstate.phys.pos[i]), np.asarray(s.phys.pos), atol=1e-6
        )


def test_fast_supports_level2_randomization():
    """level2 (randomized state/inertia/gates, no stochastic in-window
    disturbances... level2 has disturbances=True so it is NOT supported;
    level0 is). Verify the support predicate and a level0 COMPETE window."""
    cfg0 = load_config("level0")
    spec0 = race_mod.RaceSpec.from_config(cfg0, 2, RaceMode.COMPETE, Physics.PYB)
    assert race_fast.supports(spec0)
    cfg2 = load_config("level2")
    spec2 = race_mod.RaceSpec.from_config(cfg2, 2, RaceMode.COMPETE, Physics.PYB)
    assert not race_fast.supports(spec2)  # in-window wind/action noise

    track = race_mod.track_from_config(cfg0, 2)
    s = race_mod.race_reset(spec0, track, jax.random.PRNGKey(5))
    ids, vec = _cmds(2, Command.TAKEOFF, [0.3, 2.0])
    s_ref = s_fast = s
    for _ in range(3):
        s_ref, *_ = race_mod.race_step(spec0, track, s_ref, ids, vec)
        s_fast, *_ = race_fast.race_step_fast(
            spec0, track, s_fast, ids, vec, interpret=True
        )
        ids, vec = _cmds(2, Command.NONE, [])
    dpos = float(jnp.abs(s_ref.phys.pos - s_fast.phys.pos).max())
    assert dpos < 1e-3, dpos
