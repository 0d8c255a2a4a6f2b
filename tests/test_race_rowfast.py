"""Row-major race RL path vs the general shaped path (interpret mode)."""

import dataclasses

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


def test_fused_matches_unfused():
    """The single-launch fused kernel (ops/pallas_race_step.py) tracks the
    window-kernel + XLA-row-tail twin: identical keys (the reset draws use
    the same jax.random splits by construction), discrete outputs equal,
    continuous outputs within closed-loop f32 tolerance. Covers level2
    (randomized geometry/inertia/start) AND 2-drone COMPETE self-play."""
    scenarios = [
        ("getting_started", 1, RaceMode.COMPARE, False),
        ("level2", 1, RaceMode.COMPARE, False),
        ("twogates", 2, RaceMode.COMPETE, True),
    ]
    for cfg_name, n_drones, mode, per_drone in scenarios:
        cfg = load_config(cfg_name)
        spec = race_mod.RaceSpec.from_config(cfg, n_drones, mode, Physics.PYB)
        track = race_mod.track_from_config(cfg, n_drones)
        B = 128
        reset, step_f = race_rl_rowfast.make_row_env(
            spec, track, B, interpret=True, fused=True,
            per_drone_reward=per_drone, telemetry=True,
        )
        _, step_u = race_rl_rowfast.make_row_env(
            spec, track, B, interpret=True, fused=False,
            per_drone_reward=per_drone, telemetry=True,
        )
        key = jax.random.PRNGKey(7)
        st_f = reset(key)
        st_u = reset(key)
        for i in range(4):
            key, ka, ks = jax.random.split(key, 3)
            shape = (B, n_drones, 4) if n_drones > 1 else (B, 4)
            a = jax.random.uniform(ka, shape, minval=-1.0, maxval=1.0)
            st_f, obs_f, rew_f, done_f, info_f = step_f(st_f, a, ks)
            st_u, obs_u, rew_u, done_u, info_u = step_u(st_u, a, ks)
            # discrete state identical (integer-valued rows)
            for name in ("current_gate", "eliminated", "finished",
                         "shape_gate_id"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(st_f, name)),
                    np.asarray(getattr(st_u, name)),
                    err_msg=f"{cfg_name} step {i} {name}",
                )
            # pre-autoreset telemetry identical between the two kernels
            for name in ("current_gate", "eliminated", "finished",
                         "ep_steps", "terminated"):
                np.testing.assert_array_equal(
                    np.asarray(info_f[name]), np.asarray(info_u[name]),
                    err_msg=f"{cfg_name} step {i} telemetry {name}",
                )
            # telemetry is PRE-reset: on done envs it keeps the terminal
            # values the post-reset state has already wiped
            done_np = np.asarray(done_f)
            if done_np.any() and n_drones == 1:
                post = np.asarray(st_f.current_gate).reshape(-1)[done_np]
                assert (post == 0).all()
            np.testing.assert_array_equal(
                np.asarray(done_f), np.asarray(done_u),
                err_msg=f"{cfg_name} step {i} done",
            )
            # geometry/inertia rows: same draws -> bitwise
            np.testing.assert_array_equal(
                np.asarray(st_f.gates_xyyaw), np.asarray(st_u.gates_xyyaw)
            )
            np.testing.assert_array_equal(
                np.asarray(st_f.mass), np.asarray(st_u.mass)
            )
            # continuous rows within closed-loop f32 drift (the two paths
            # compile the same math in different fusion contexts, so FMA
            # contraction differs by ~ulps, amplified by the dynamics)
            np.testing.assert_allclose(
                np.asarray(obs_f), np.asarray(obs_u), atol=5e-3,
                err_msg=f"{cfg_name} step {i} obs",
            )
            np.testing.assert_allclose(
                np.asarray(rew_f), np.asarray(rew_u), atol=5e-3,
                err_msg=f"{cfg_name} step {i} reward",
            )


def test_rollout_kernel_matches_step_sequence():
    """The K-step rollout kernel (grid over steps, state VMEM-resident —
    ops/pallas_race_step.race_rollout) must reproduce K sequential
    single-launch fused steps EXACTLY: same key splits drive the reset
    draws, the step body is the literal shared ``_step_core``, so state,
    rewards and dones are bitwise-equal. Covers deterministic
    getting_started (1-drone and 2-drone COMPETE) and randomized level2."""
    scenarios = [
        ("getting_started", 1, RaceMode.COMPARE),
        ("getting_started", 2, RaceMode.COMPETE),
        ("level2", 1, RaceMode.COMPARE),
    ]
    K = 3
    for cfg_name, n_drones, mode in scenarios:
        cfg = load_config(cfg_name)
        spec = race_mod.RaceSpec.from_config(cfg, n_drones, mode,
                                             Physics.PYB)
        track = race_mod.track_from_config(cfg, n_drones)
        B = 128
        reset, step = race_rl_rowfast.make_row_env(
            spec, track, B, interpret=True, fused=True
        )
        key = jax.random.PRNGKey(11)
        st_seq = reset(key)
        st_roll = reset(key)
        shape = (B, n_drones, 4) if n_drones > 1 else (B, 4)
        k_act, k_env = jax.random.split(jax.random.PRNGKey(12))
        actions = jax.random.uniform(
            k_act, (K,) + shape, minval=-1.0, maxval=1.0
        )
        keys = jax.random.split(k_env, K)
        rews, dones = [], []
        for i in range(K):
            st_seq, _, rew, done = step(st_seq, actions[i], keys[i])
            rews.append(rew)
            dones.append(done)
        st_roll, REW, DONE = step.rollout_steps(st_roll, actions, keys)
        for name in ("S", "R", "GG", "OO", "EP"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_roll, name)),
                np.asarray(getattr(st_seq, name)),
                err_msg=f"{cfg_name} N={n_drones} state {name}",
            )
        # REW is (K, T, 128) drone-major rows; step() returns the
        # host layout — compare through the same row view
        for i in range(K):
            got = np.asarray(DONE[i].reshape(B) > 0.5)
            np.testing.assert_array_equal(got, np.asarray(dones[i]))


def test_rollout_policy_matches_step_policy():
    """K-step policy-in-kernel rollout == K sequential step_policy calls
    (state, obs carry, and every trajectory row bitwise)."""
    from gym_pybullet_adrp_tpu.models.policy import ActorCritic

    cfg = load_config("getting_started")
    spec = race_mod.RaceSpec.from_config(cfg, 1, RaceMode.COMPARE,
                                         Physics.PYB)
    track = race_mod.track_from_config(cfg, 1)
    B = 128
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=True, fused=True
    )
    net = ActorCritic(act_dim=4)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, spec.obs_size), dtype=jnp.float32))
    pp = race_rl_rowfast.pack_policy_params(params)
    K = 3
    st = reset(jax.random.PRNGKey(5))
    obs_rows = reset.initial_obs_rows(st)
    actn = jax.random.normal(jax.random.PRNGKey(6),
                             (K, 4, obs_rows.shape[1], 128),
                             dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    st_s, obs_s = st, obs_rows
    seq = []
    for i in range(K):
        st_s, obs_s, tr = step.policy_step(st_s, obs_s, pp, actn[i],
                                           keys[i])
        seq.append((obs_s, tr))
    st_r, obs_r, trr = step.rollout_policy(st, obs_rows, pp, actn, keys)
    np.testing.assert_array_equal(np.asarray(st_r.S), np.asarray(st_s.S))
    np.testing.assert_array_equal(np.asarray(obs_r), np.asarray(obs_s))
    for i in range(K):
        obs_i, tr_i = seq[i]
        np.testing.assert_array_equal(
            np.asarray(trr["obs"][i]), np.asarray(obs_i),
            err_msg=f"obs step {i}",
        )
        for f in ("action", "logp", "value", "reward", "done"):
            np.testing.assert_array_equal(
                np.asarray(trr[f][i]), np.asarray(tr_i[f]),
                err_msg=f"{f} step {i}",
            )


def test_rowfast_support_predicate():
    cfg = load_config("level2")
    spec2 = race_mod.RaceSpec.from_config(cfg, 1, RaceMode.COMPARE, Physics.PYB)
    assert race_rl_rowfast.supports(spec2)  # randomized gates/inertia: rows
    cfg0 = load_config("twogates")
    spec0 = race_mod.RaceSpec.from_config(cfg0, 1, RaceMode.COMPARE, Physics.PYB)
    assert race_rl_rowfast.supports(spec0)
    specC = race_mod.RaceSpec.from_config(cfg0, 2, RaceMode.COMPETE, Physics.PYB)
    assert race_rl_rowfast.supports(specC)  # multi-drone COMPETE row path
    cfg1 = load_config("level1")
    spec1 = race_mod.RaceSpec.from_config(cfg1, 1, RaceMode.COMPARE, Physics.PYB)
    assert race_rl_rowfast.supports(spec1)  # in-kernel PRNG disturbances
    spec_dyn = race_mod.RaceSpec.from_config(
        cfg1, 1, RaceMode.COMPARE, Physics.DYN
    )
    assert not race_rl_rowfast.supports(spec_dyn)  # kernel is PYB-only


def test_rowfast_disturbances():
    """level1 disturbances on the row path: same key -> bitwise identical,
    different keys -> different trajectories, and the noise magnitude is
    commensurate with the configured wind bounds (not blowing up)."""
    cfg = load_config("level1")
    spec = race_mod.RaceSpec.from_config(cfg, 1, RaceMode.COMPARE, Physics.PYB)
    track = race_mod.track_from_config(cfg, 1)
    assert spec.disturbances
    B = 128
    reset, step = race_rl_rowfast.make_row_env(spec, track, B, interpret=True)
    st0 = reset(jax.random.PRNGKey(0))
    act = jnp.tile(jnp.asarray([[0.0, 0.0, 0.5, 0.0]], dtype=jnp.float32),
                   (B, 1))
    stA, obsA, _, _ = step(st0, act, jax.random.PRNGKey(1))
    stA2, obsA2, _, _ = step(st0, act, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(stA.S), np.asarray(stA2.S))
    stB, obsB, _, _ = step(st0, act, jax.random.PRNGKey(2))
    dpos = np.abs(np.asarray(obsA[:, 0:3]) - np.asarray(obsB[:, 0:3]))
    assert dpos.max() > 0.0  # noise actually entered the dynamics
    assert dpos.max() < 0.1  # one 40 ms window of bounded wind stays small

    # noise-free spec from the same track: trajectories must differ
    spec_nf = dataclasses.replace(spec, disturbances=False)
    reset_nf, step_nf = race_rl_rowfast.make_row_env(
        spec_nf, track, B, interpret=True
    )
    st0_nf = reset_nf(jax.random.PRNGKey(0))
    stC, obsC, _, _ = step_nf(st0_nf, act, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(obsA[:, 0:3]) - np.asarray(obsC[:, 0:3])).max() > 0.0


def test_rowfast_level2_randomization():
    """level2 (randomized gates/obstacles/inertia/start) on the row path:
    geometry rows stay within the config's offset bounds, obs switch from
    nominal to actual pose as the drone approaches the tracked gate, and
    episodes vary across autoresets while staying seed-deterministic."""
    cfg = load_config("level2")
    spec = race_mod.RaceSpec.from_config(cfg, 1, RaceMode.COMPARE, Physics.PYB)
    track = race_mod.track_from_config(cfg, 1)
    assert spec.random_gates_obstacles and spec.random_drone_inertia
    B = 128
    reset, step = race_rl_rowfast.make_row_env(spec, track, B, interpret=True)
    st = reset(jax.random.PRNGKey(3))
    gates = np.asarray(track.gates_nominal)

    # geometry rows within bounds and actually varying across envs
    gx = np.asarray(st.gates_xyyaw[:, 0])  # (G, Tb, 128)
    for g in range(spec.num_gates):
        off = gx[g] - gates[g, 0]
        assert off.min() >= spec.rg_gates[0] - 1e-6
        assert off.max() <= spec.rg_gates[1] + 1e-6
    assert float(gx[0].std()) > 0.01  # not degenerate
    mass = np.asarray(st.mass)
    assert mass.std() > 1e-4
    assert abs(float(mass.mean()) - 0.027) < 0.01

    # determinism: same key -> identical reset rows
    st2 = reset(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(st.S), np.asarray(st2.S))
    np.testing.assert_array_equal(
        np.asarray(st.gates_xyyaw), np.asarray(st2.gates_xyyaw)
    )

    # obs: far from gate 0 -> nominal pose; flying toward it -> actual
    act = jnp.tile(jnp.asarray([[0.0, 0.0, 0.8, 0.0]], dtype=jnp.float32),
                   (B, 1))
    st_, obs, rew, done = step(st, act, jax.random.PRNGKey(10))
    np.testing.assert_allclose(
        np.asarray(obs[:, 12]), gates[0, 0], rtol=0, atol=1e-6
    )  # out of range: nominal x
    # steer at the actual gate-0 position of each env
    for i in range(40):
        tgt_x = st_.gates_xyyaw[0, 0].reshape(B)
        tgt_y = st_.gates_xyyaw[0, 1].reshape(B)
        pos = obs[:, 0:3]
        dx = jnp.clip(tgt_x - pos[:, 0], -1, 1)
        dy = jnp.clip(tgt_y - pos[:, 1], -1, 1)
        dz = jnp.clip(1.0 - pos[:, 2], -1, 1)
        act = jnp.stack([dx, dy, dz, jnp.zeros(B)], axis=1)
        st_, obs, rew, done = step(st_, act, jax.random.PRNGKey(20 + i))
        in_range = np.asarray(obs[:, 28]) > 0.5  # gate-0 visibility flag
        if in_range.any():
            actual_x = np.asarray(st_.gates_xyyaw[0, 0].reshape(B))
            np.testing.assert_allclose(
                np.asarray(obs[in_range, 12]), actual_x[in_range],
                rtol=0, atol=1e-6,
            )
            break
    else:
        raise AssertionError("never got within visibility range of gate 0")


def test_rowfast_compete_matches_fast_path(monkeypatch):
    """2-drone COMPETE: opponent-pose obs channels, drone-drone collision
    elimination, env-level done, drone-0 shaped reward — all must track the
    pack/unpack kernel path (race_fast, itself validated against the general
    XLA path), which shares the window dynamics but computes the ctrl-rate
    tail with the independent XLA geometry. getting_started: deterministic
    resets, so trajectories are comparable step by step.

    Runs under disable_x64: the conftest's global x64 makes the fast path
    compute setpoint assembly in f64-then-round while the row path is
    f32-native, and that 1e-8 seed amplifies through the knife-edge firmware
    PWM/gating boundaries over a multi-step closed loop. In matched (f32)
    precision the two paths agree to ~1e-8 per step.
    """
    import gym_pybullet_adrp_tpu.ops.pallas_race as pr

    orig_window = pr.race_window
    monkeypatch.setattr(
        pr, "race_window",
        lambda *a, **k: orig_window(*a, **{**k, "interpret": True}),
    )
    with jax.enable_x64(False):
        _run_compete_comparison()


def _run_compete_comparison():
    cfg = load_config("getting_started")
    N = 2
    spec = race_mod.RaceSpec.from_config(cfg, N, RaceMode.COMPETE, Physics.PYB)
    track = race_mod.track_from_config(cfg, N)
    B = 128
    G, O = spec.num_gates, spec.num_obstacles
    # unfused twin: shares the window kernel with the fast path, so the
    # ~1e-8 agreement below holds; the fused kernel is pinned against this
    # twin separately (test_fused_matches_unfused)
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, end_after_gate=0, interpret=True, fused=False
    )
    st_row = reset(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    bstate = jax.vmap(lambda k: race_rl.rl_race_reset(spec, track, k))(keys)

    act = jnp.tile(
        jnp.asarray(
            [[[0.0, 0.0, 0.4, 0.0]], [[0.05, 0.0, 0.3, 0.0]]],
            dtype=jnp.float32,
        ).reshape(1, N, 4),
        (B, 1, 1),
    )
    for i in range(8):
        k = jax.random.PRNGKey(100 + i)
        st_row, obs_r, rew_r, done_r = step(st_row, act, k)
        bstate, obs_g, rew_g, te, tr = race_rl.batched_rl_race_step(
            spec, track, bstate, act, jax.random.split(k, B), fast=True,
        )
    assert obs_r.shape == obs_g.shape == (B, N, spec.obs_size)
    assert spec.obs_size == 49 + 6 * (N - 1)
    # matched-precision paths agree essentially bit-exactly
    assert float(jnp.abs(obs_r - obs_g).max()) < 1e-5
    # discrete channels identical: visibility flags + gate id, per drone
    for sl in (
        slice(12 + 4 * G, 12 + 5 * G),
        slice(12 + 5 * G + 3 * O, 12 + 5 * G + 4 * O),
        slice(48, 49),
    ):
        np.testing.assert_array_equal(
            np.asarray(obs_r[:, :, sl]), np.asarray(obs_g[:, :, sl])
        )
    # opponent pose channels mirror the other drone's kinematic channels
    np.testing.assert_allclose(
        np.asarray(obs_r[:, 0, 49:55]), np.asarray(obs_r[:, 1, 0:6]),
        rtol=0, atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(done_r), np.asarray(te | tr)
    )
    np.testing.assert_allclose(
        np.asarray(rew_r), np.asarray(rew_g), atol=0.02
    )


def test_rowfast_compete_drone_collision_eliminates():
    """Force both drones to the same spot -> drone-drone contact eliminates
    both (COMPETE semantics) and the episode terminates env-wide."""
    cfg = load_config("getting_started")
    N = 2
    spec = race_mod.RaceSpec.from_config(cfg, N, RaceMode.COMPETE, Physics.PYB)
    track = race_mod.track_from_config(cfg, N)
    B = 128
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, end_after_gate=0, interpret=True
    )
    st = reset(jax.random.PRNGKey(0))
    # steer drone 1 onto drone 0's start column while both climb
    init = np.asarray(track.init_pos)
    d10 = (init[0] - init[1]).astype(np.float32)
    act = jnp.tile(
        jnp.asarray(
            [[0.0, 0.0, 0.5, 0.0],
             [np.clip(d10[0], -1, 1), np.clip(d10[1], -1, 1), 0.5, 0.0]],
            dtype=jnp.float32,
        ).reshape(1, N, 4),
        (B, 1, 1),
    )
    collided = False
    for i in range(25):
        st, obs, rew, done = step(st, act, jax.random.PRNGKey(i))
        if bool(jnp.any(done)):
            collided = True
            break
    assert collided, "drones never collided/terminated"


def test_rowfast_per_drone_reward_selfplay():
    """per_drone_reward mode: reward (B, N); without sparse events, drone
    0's shaped reward equals the default (drone-0, reference-semantics)
    reward; a drone's own elimination contributes exactly -1 on that step."""
    cfg = load_config("getting_started")
    N = 2
    spec = race_mod.RaceSpec.from_config(cfg, N, RaceMode.COMPETE, Physics.PYB)
    track = race_mod.track_from_config(cfg, N)
    B = 128
    reset, step0 = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=True
    )
    _, step_pd = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=True, per_drone_reward=True
    )
    st0 = reset(jax.random.PRNGKey(0))
    st1 = st0
    act = jnp.tile(
        jnp.asarray(
            [[[0.0, 0.0, 0.4, 0.0], [0.05, 0.0, 0.3, 0.0]]],
            dtype=jnp.float32,
        ).reshape(1, N, 4),
        (B, 1, 1),
    )
    for i in range(4):
        k = jax.random.PRNGKey(100 + i)
        st0, obs0, rew0, done0 = step0(st0, act, k)
        st1, obs1, rew1, done1 = step_pd(st1, act, k)
        assert rew1.shape == (B, N)
        # no sparse events early on: drone-0 per-drone shaping == default
        assert not bool(done0.any())
        np.testing.assert_allclose(
            np.asarray(rew1[:, 0]), np.asarray(rew0), rtol=0, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(done0), np.asarray(done1))

    # ram drone 1 into drone 0: the eliminated drones take a -1 hit
    init = np.asarray(track.init_pos)
    d10 = (init[0] - init[1]).astype(np.float32)
    ram = jnp.tile(
        jnp.asarray(
            [[0.0, 0.0, 0.5, 0.0],
             [np.clip(d10[0], -1, 1), np.clip(d10[1], -1, 1), 0.5, 0.0]],
            dtype=jnp.float32,
        ).reshape(1, N, 4),
        (B, 1, 1),
    )
    st = reset(jax.random.PRNGKey(0))
    for i in range(25):
        prev_elim = st.eliminated
        st, obs, rew, done = step_pd(st, ram, jax.random.PRNGKey(i))
        if bool(done.any()):
            # both drones newly eliminated -> each reward includes the -1
            assert float(rew[:, 0].min()) < -0.5
            assert float(rew[:, 1].min()) < -0.5
            break
    else:
        raise AssertionError("no collision within 25 steps")


def test_rowfast_sharded_over_mesh():
    """Flagship race env shards over a device mesh (DP): 8 independent
    shards of 128 envs step on 8 virtual devices, metrics psum over the
    axis. Validates the multi-chip story for the race workload (conftest
    provides the 8-device CPU mesh; kernels run in interpret mode)."""
    from gym_pybullet_adrp_tpu.parallel.distributed import (
        make_mesh, race_rollout_throughput_fn,
    )

    cfg = load_config("getting_started")
    N = 2
    spec = race_mod.RaceSpec.from_config(cfg, N, RaceMode.COMPETE, Physics.PYB)
    track = race_mod.track_from_config(cfg, N)
    mesh = make_mesh(8)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    kb = jnp.asarray(keys, dtype=jnp.uint32).reshape(16)
    for rollout_k in (0, 2):
        fn = race_rollout_throughput_fn(
            mesh, spec, track, n_envs_per_device=128, n_steps=2,
            interpret=True, rollout_k=rollout_k,
        )
        out = np.asarray(fn(kb))
        assert out.shape == (8,)
        # psum -> every device reports the same global sum, finite
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, out[0], rtol=1e-6)
