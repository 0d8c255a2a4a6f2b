"""JaxRaceVectorEnv: the public batched race surface on the fused kernel.

VERDICT r2 item 2: external users used to get only the general XLA race
path; this pins the gymnasium-facing batch API being backed by
ops/pallas_race_step.race_step_fused (interpret mode on CPU), its seeded
determinism, its kernel-telemetry infos, and its closed-loop equivalence
with the general vmapped path on the deterministic getting_started track.
"""

import numpy as np
import jax
import pytest

from gym_pybullet_adrp_tpu.envs import JaxRaceVectorEnv
from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode


def test_api_and_seeded_determinism():
    B = 128
    venv = JaxRaceVectorEnv(B, config="twogates")
    assert venv.fused_backend
    assert venv.single_action_space.shape == (4,)
    obs, _ = venv.reset(seed=5)
    assert obs.shape == (B,) + venv.single_observation_space.shape

    rng = np.random.default_rng(0)
    acts = rng.uniform(-1, 1, (3, B, 4)).astype(np.float32)
    tr1 = []
    for a in acts:
        o, r, te, tr_, info = venv.step(a)
        tr1.append((o, r, te, tr_))
        for k in ("current_gate", "eliminated", "finished", "ep_steps",
                  "task_completed"):
            assert k in info and np.asarray(info[k]).shape[0] == B
    # identical seed -> bitwise-identical trajectory (keyed autoreset +
    # disturbance chain)
    venv.reset(seed=5)
    for i, a in enumerate(acts):
        o, r, te, tr_, _ = venv.step(a)
        np.testing.assert_array_equal(o, tr1[i][0], err_msg=f"step {i}")
        np.testing.assert_array_equal(r, tr1[i][1])
    # ep_steps telemetry counts ctrl steps within the episode, pre-reset
    ep = np.asarray(_last_info(venv, acts)[0]["ep_steps"])
    assert ep.max() == len(acts) and ep.min() >= 1


def _last_info(venv, acts):
    venv.reset(seed=9)
    infos = []
    for a in acts:
        *_, info = venv.step(a)
        infos.append(info)
    return infos[-1:]


def test_seed_randomization_ladder():
    """On a randomized scenario (level2 geometry/inertia/start draws),
    different seeds -> different initial batches; same seed -> equal."""
    B = 128
    venv = JaxRaceVectorEnv(B, config="level2")
    o1, _ = venv.reset(seed=1)
    o1b, _ = venv.reset(seed=1)
    o2, _ = venv.reset(seed=2)
    np.testing.assert_array_equal(o1, o1b)
    assert not np.allclose(o1, o2)
    # per-env diversity from the ladder's randomization
    assert not np.allclose(o1[0], o1[1])


def test_fused_backend_matches_general_path():
    """Closed-loop equivalence of the two backends on getting_started
    (deterministic: no randomization/disturbances, so the different key
    plumbing cannot diverge the physics): same actions -> same
    trajectories within f32 closed-loop tolerance, identical discrete
    outcomes."""
    B = 128
    vf = JaxRaceVectorEnv(B, config="getting_started", backend="fused")
    vg = JaxRaceVectorEnv(B, config="getting_started", backend="general")
    assert vf.fused_backend and not vg.fused_backend
    of, _ = vf.reset(seed=3)
    og, _ = vg.reset(seed=3)
    np.testing.assert_allclose(of, og, atol=1e-5)
    rng = np.random.default_rng(1)
    for i in range(3):
        a = rng.uniform(-1, 1, (B, 4)).astype(np.float32)
        of, rf, tef, trf, inf_f = vf.step(a)
        og, rg, teg, trg, inf_g = vg.step(a)
        np.testing.assert_allclose(of, og, atol=5e-3, err_msg=f"obs {i}")
        np.testing.assert_allclose(rf, rg, atol=5e-3, err_msg=f"rew {i}")
        np.testing.assert_array_equal(tef, teg)
        np.testing.assert_array_equal(trf, trg)
        np.testing.assert_array_equal(
            inf_f["current_gate"], inf_g["current_gate"], err_msg=f"cg {i}"
        )


def test_done_step_telemetry_matches_across_backends():
    """Regression (round-4 advisor finding / VERDICT r4 item 6): on a DONE
    step the general backend's infos must show PRE-autoreset telemetry,
    identical to the fused backend's — the general path once tapped the
    telemetry after the on-done reset wiped it (envs/race_rl.py:233-240).
    A truncation-length episode (episode_len_sec shrunk to 4 ctrl steps)
    drives every env to an actual done step cheaply."""
    from gym_pybullet_adrp_tpu.utils.config import load_config

    B = 128
    cfg = load_config("getting_started")
    cfg.episode_len_sec = 4.0 / cfg.ctrl_freq            # truncate @ step 4
    vf = JaxRaceVectorEnv(B, config=cfg, backend="fused")
    vg = JaxRaceVectorEnv(B, config=cfg, backend="general")
    vf.reset(seed=3)
    vg.reset(seed=3)
    rng = np.random.default_rng(1)
    saw_done = False
    for i in range(4):
        a = rng.uniform(-1, 1, (B, 4)).astype(np.float32)
        of, rf, tef, trf, inf_f = vf.step(a)
        og, rg, teg, trg, inf_g = vg.step(a)
        done_f = tef | trf
        np.testing.assert_array_equal(done_f, teg | trg)
        for k in ("current_gate", "eliminated", "finished", "ep_steps"):
            np.testing.assert_array_equal(
                np.asarray(inf_f[k]), np.asarray(inf_g[k]),
                err_msg=f"step {i} info[{k!r}]",
            )
        if done_f.any():
            saw_done = True
            # pre-reset semantics: the done step reports the episode's own
            # counter (i+1 ctrl steps), not the fresh episode's zero
            ep = np.asarray(inf_g["ep_steps"])[done_f]
            np.testing.assert_array_equal(ep, i + 1)
    assert saw_done, "episode never truncated — test drove no done step"
    # the step AFTER the autoreset counts from the fresh episode (for the
    # envs that were done on the last loop step; a rare early-eliminated
    # env resets mid-loop and reads higher)
    a = rng.uniform(-1, 1, (B, 4)).astype(np.float32)
    *_, inf_g = vg.step(a)
    *_, inf_f = vf.step(a)
    np.testing.assert_array_equal(np.asarray(inf_g["ep_steps"])[done_f], 1)
    np.testing.assert_array_equal(np.asarray(inf_f["ep_steps"])[done_f], 1)


def test_multi_drone_compete_and_guards():
    B = 128
    venv = JaxRaceVectorEnv(B, config="twogates", num_drones=2)
    assert venv.spec_.racemode == RaceMode.COMPETE
    assert venv.single_action_space.shape == (2, 4)
    obs, _ = venv.reset(seed=0)
    assert obs.shape == (B, 2, venv.spec_.obs_size)
    o, r, te, tr, info = venv.step(np.zeros((B, 2, 4), np.float32))
    assert r.shape == (B, 2)            # per-drone self-play shaping
    assert info["current_gate"].shape == (B, 2)
    assert info["task_completed"].shape == (B,)

    with pytest.raises(RuntimeError, match="reset"):
        JaxRaceVectorEnv(128, config="twogates").step(
            np.zeros((128, 4), np.float32)
        )
    with pytest.raises(ValueError, match="fused"):
        JaxRaceVectorEnv(64, config="twogates", backend="fused")
    with pytest.raises(ValueError, match="per_drone_reward"):
        JaxRaceVectorEnv(64, config="twogates", per_drone_reward=True)
    # off-lane batch silently falls back to the general path
    v64 = JaxRaceVectorEnv(64, config="twogates")
    assert not v64.fused_backend
    o, _ = v64.reset(seed=0)
    assert o.shape == (64, v64.spec_.obs_size)
    v64.step(np.zeros((64, 4), np.float32))


def test_single_transfer_contract():
    """One explicit upload + one packed download per step, same contract
    as JaxVectorEnv (pinned with jax.transfer_guard)."""
    B = 128
    venv = JaxRaceVectorEnv(B, config="getting_started")
    act = np.zeros((B, 4), np.float32)
    venv.reset(seed=0)
    venv.step(act)          # warm up compilation outside the guard
    with jax.transfer_guard("disallow"):
        venv.reset(seed=0)
        obs, rew, te, tr, info = venv.step(act)
    assert obs.shape[0] == B and rew.shape == (B,)
