"""Policy-in-kernel rollout step (VERDICT r2 item 3).

The fused race kernel can run the ActorCritic forward + Gaussian sampling
inside the launch (ops/pallas_race_step._policy_forward). This pins the
in-kernel policy against the reference composition — flax
``net.apply`` -> ``mean + exp(log_std) * noise`` -> the plain fused env
step — on identical noise draws and step keys, in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import race as race_mod, race_rl_rowfast
from gym_pybullet_adrp_tpu.models.policy import ActorCritic, gaussian_logp
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode


def _run_case(cfg_name, n_drones, mode, hidden=(64, 64)):
    cfg = load_config(cfg_name)
    spec = race_mod.RaceSpec.from_config(cfg, n_drones, mode, Physics.PYB)
    track = race_mod.track_from_config(cfg, n_drones)
    B = 128
    N = n_drones
    Tb = B // 128
    T = N * Tb
    C = spec.obs_size
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=True, per_drone_reward=(N > 1),
        policy_hidden=hidden,
    )
    net = ActorCritic(act_dim=4, hidden=hidden)
    params = net.init(
        jax.random.PRNGKey(3), jnp.zeros((1, C), jnp.float32)
    )
    pp = race_rl_rowfast.pack_policy_params(params)

    st_f = reset(jax.random.PRNGKey(0))
    st_r = reset(jax.random.PRNGKey(0))
    obs_rows = reset.initial_obs_rows(st_f)

    def rows_to_flat(x, ch=None):
        if ch is None:
            return (x.reshape(B) if N == 1
                    else x.reshape(N, B).T.reshape(B * N))
        return (x.reshape(ch, B).T if N == 1
                else x.reshape(ch, N, B).transpose(2, 1, 0).reshape(
                    B * N, ch))

    key = jax.random.PRNGKey(11)
    for i in range(3):
        key, k_n, k_s = jax.random.split(key, 3)
        actn = jax.random.normal(k_n, (4, T, 128), dtype=jnp.float32)

        # fused: policy + env in one kernel
        st_f, obs_rows2, tr = step.policy_step(st_f, obs_rows, pp, actn, k_s)

        # reference composition on the SAME obs/noise/key
        obs_flat = rows_to_flat(obs_rows, C).astype(jnp.float32)
        mean, log_std, value = net.apply(params, obs_flat)
        noise_flat = rows_to_flat(actn, 4)
        action = mean + jnp.exp(log_std) * noise_flat   # unclipped
        logp = gaussian_logp(action, mean, log_std)
        act_env = jnp.clip(action, -1.0, 1.0)
        act_env = act_env.reshape(B, N, 4) if N > 1 else act_env
        st_r, obs_r, rew_r, done_r = step(st_r, act_env, k_s)

        # trajectory fields match the flax/XLA reference
        np.testing.assert_allclose(
            rows_to_flat(tr["action"], 4), np.asarray(action),
            atol=2e-5, err_msg=f"step {i} action",
        )
        np.testing.assert_allclose(
            rows_to_flat(tr["logp"]), np.asarray(logp), atol=2e-4,
            err_msg=f"step {i} logp",
        )
        np.testing.assert_allclose(
            rows_to_flat(tr["value"]), np.asarray(value), atol=2e-5,
            err_msg=f"step {i} value",
        )
        # env outputs match the plain fused step driven by the same action
        obs_r_rows = (
            obs_r.T.reshape(C, Tb, 128) if N == 1
            else obs_r.transpose(2, 1, 0).reshape(C, T, 128)
        )
        np.testing.assert_allclose(
            np.asarray(obs_rows2), np.asarray(obs_r_rows), atol=5e-3,
            err_msg=f"step {i} obs",
        )
        np.testing.assert_allclose(
            rows_to_flat(tr["reward"]) if N == 1
            else rows_to_flat(tr["reward"]),
            np.asarray(rew_r).reshape(-1), atol=5e-3,
            err_msg=f"step {i} reward",
        )
        np.testing.assert_array_equal(
            np.asarray(tr["done"]).reshape(B) > 0.5, np.asarray(done_r),
            err_msg=f"step {i} done",
        )
        obs_rows = obs_rows2


def test_policy_fused_matches_reference_single_drone():
    _run_case("getting_started", 1, RaceMode.COMPARE)


def test_policy_fused_matches_reference_selfplay_compete():
    _run_case("twogates", 2, RaceMode.COMPETE)


def test_policy_fused_wide_towers():
    """The pack layout is width-parametric (VERDICT r3 item 2): a
    256-128 tower exercises the >128-inner-dim chunked matmul path."""
    _run_case("getting_started", 1, RaceMode.COMPARE, hidden=(256, 128))


def test_policy_rollout_override_chunked_matches_per_step():
    """make_policy_rollout with the K-step rollout kernel (kernel_chunk=2)
    must produce the same trajectory, metrics and train-state as the
    one-launch-per-step path (kernel_chunk=0) — bitwise."""
    from gym_pybullet_adrp_tpu.rl.ppo import PPOConfig, make_ppo_core
    from gym_pybullet_adrp_tpu.rl.ppo import EnvAdapter

    cfg_y = load_config("getting_started")
    spec = race_mod.RaceSpec.from_config(
        cfg_y, 1, RaceMode.COMPARE, Physics.PYB
    )
    track = race_mod.track_from_config(cfg_y, 1)
    B, n_steps = 128, 4
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=True
    )
    outs = {}
    for chunk in (0, 2):
        b_reset, rollout_override, fused_step = \
            race_rl_rowfast.make_policy_rollout(
                spec, reset, step, B, n_steps, kernel_chunk=chunk
            )
        adapter = EnvAdapter(
            batched_reset=b_reset, step=fused_step,
            obs_dim=spec.obs_size, act_dim=4,
        )
        cfg = PPOConfig(n_envs=B, n_steps=n_steps, n_minibatches=2,
                        n_epochs=1)
        init_fn, _, _ = make_ppo_core(
            cfg, adapter, rollout_override=rollout_override
        )
        ts = init_fn(jax.random.PRNGKey(0))
        ts2, traj, metrics = rollout_override(ts)
        outs[chunk] = (ts2, traj, metrics)
    ts_a, traj_a, m_a = outs[0]
    ts_b, traj_b, m_b = outs[2]
    for f in ("obs", "action", "logp", "value", "reward", "done"):
        np.testing.assert_array_equal(
            np.asarray(getattr(traj_a, f)), np.asarray(getattr(traj_b, f)),
            err_msg=f,
        )
    np.testing.assert_array_equal(
        np.asarray(ts_a.last_obs), np.asarray(ts_b.last_obs)
    )
    np.testing.assert_array_equal(
        np.asarray(ts_a.ep_return), np.asarray(ts_b.ep_return)
    )
    for k in m_a:
        np.testing.assert_array_equal(
            np.asarray(m_a[k]), np.asarray(m_b[k]), err_msg=k
        )
