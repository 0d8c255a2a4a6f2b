"""Race-PPO phase profile + roofline table.

Times one PPO iteration end-to-end and its phases (rollout / update) on the
current device, and reports achieved FLOP/s and HBM bytes/s from XLA's own
cost model (``compiled.cost_analysis()``) against the measured wall time —
the roofline evidence VALIDATION.md cites. The reference has no counterpart
(its only perf instrumentation is a wall-clock ratio print,
BaseAviary.py:408-416); this replaces SB3's Logger throughput line.

Usage: python scripts/profile_ppo.py [--envs 4096] [--config getting_started]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, repeats=8, rounds=3):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(repeats)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best


def cost(compiled):
    """(flops, bytes) from XLA's cost model; 0 when unavailable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--n_steps", type=int, default=64)
    ap.add_argument("--config", default="getting_started")
    ap.add_argument("--shuffle_block", type=int, default=512)
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="minibatches accumulated per optimizer update "
                         "(1 = exact SB3 schedule)")
    ap.add_argument("--kernel_chunk", type=int, default=16,
                    help="with --fuse_policy: env steps per rollout-kernel "
                         "launch (0 = one launch per step)")
    ap.add_argument("--fuse_policy", action="store_true",
                    help="profile the policy-in-kernel rollout "
                         "(race_rl_rowfast.make_policy_rollout)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gym_pybullet_adrp_tpu.envs import race as race_mod
    from gym_pybullet_adrp_tpu.envs import race_rl_rowfast
    from gym_pybullet_adrp_tpu.models.policy import ActorCritic, sample_action
    from gym_pybullet_adrp_tpu.rl.ppo import (
        EnvAdapter, PPOConfig, make_ppo_core,
    )
    from gym_pybullet_adrp_tpu.utils.config import load_config
    from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode

    B = args.envs
    config = load_config(args.config)
    spec = race_mod.RaceSpec.from_config(
        config, 1, RaceMode.COMPARE, Physics.PYB
    )
    track = race_mod.track_from_config(config, 1)
    interpret = jax.devices()[0].platform == "cpu"
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, B, interpret=interpret
    )

    def batched_reset(key):
        return reset(key), jnp.zeros((B, spec.obs_size), dtype=jnp.float32)

    adapter = EnvAdapter(batched_reset=batched_reset, step=step,
                         obs_dim=spec.obs_size, act_dim=4)
    cfg = PPOConfig(n_envs=B, n_steps=args.n_steps,
                    shuffle_block=args.shuffle_block,
                    grad_accum=args.grad_accum)
    rollout_override = None
    if args.fuse_policy:
        b_reset, rollout_override, fused_step = \
            race_rl_rowfast.make_policy_rollout(
                spec, reset, step, B, args.n_steps,
                kernel_chunk=args.kernel_chunk,
            )
        adapter = adapter._replace(batched_reset=b_reset, step=fused_step)
    init_fn, train_step, _ = make_ppo_core(
        cfg, adapter, rollout_override=rollout_override
    )
    ts = init_fn(jax.random.PRNGKey(0))

    net = ActorCritic(act_dim=4)

    # ---- phase functions ---------------------------------------------------
    def env_only(st, key):
        def body(carry, _):
            st, k = carry
            k, ka, ks = jax.random.split(k, 3)
            a = jax.random.uniform(ka, (B, 4), minval=-1.0, maxval=1.0)
            st, obs, rew, done = step(st, a, ks)
            return (st, k), rew.sum()

        (st, _), r = jax.lax.scan(body, (st, key), None, length=cfg.n_steps)
        return r.sum()

    def rollout_only(st, obs, params, key):
        def body(carry, _):
            st, obs, k = carry
            k, ka, ks = jax.random.split(k, 3)
            mean, log_std, value = net.apply(params, obs)
            action, logp = sample_action(ka, mean, log_std)
            st, obs, rew, done = step(
                st, jnp.clip(action, -1.0, 1.0), ks
            )
            return (st, obs, k), (obs, action, logp, value, rew, done)

        (st, obs, _), traj = jax.lax.scan(
            body, (st, obs, key), None, length=cfg.n_steps
        )
        return traj[0].sum()

    key = jax.random.PRNGKey(0)
    train_j = jax.jit(train_step)
    env_j = jax.jit(env_only)
    t_train = timeit(train_j, ts)
    if args.fuse_policy:
        # env-only phase on the bare row state; the fused rollout IS the
        # rollout phase (policy runs inside the env kernel launch)
        t_env = timeit(env_j, ts.env_state[0], key)
        roll_j = jax.jit(lambda t: rollout_override(t)[1].reward)
        t_roll = timeit(roll_j, ts)
    else:
        roll_j = jax.jit(rollout_only)
        t_env = timeit(env_j, ts.env_state, key)
        t_roll = timeit(roll_j, ts.env_state, ts.last_obs, ts.params, key)

    compiled = train_j.lower(ts).compile()
    flops, bts = cost(compiled)

    steps = cfg.batch_size
    print(f"config={args.config} envs={B} n_steps={cfg.n_steps} "
          f"shuffle_block={cfg.shuffle_block} "
          f"platform={jax.devices()[0].platform}")
    print(f"{'phase':<26}{'ms/iter':>10}{'share':>8}")
    for name, t in (
        ("env steps only", t_env),
        ("rollout (env+policy)", t_roll),
        ("update (train - rollout)", t_train - t_roll),
        ("full train iteration", t_train),
    ):
        print(f"{name:<26}{t * 1e3:>10.2f}{t / t_train:>8.1%}")
    print(f"\nenv-steps/s end-to-end : {steps / t_train / 1e6:,.1f} M")
    if flops:
        print(f"XLA cost model         : {flops / 1e9:.1f} GFLOP, "
              f"{bts / 1e6:.0f} MB accessed per iteration")
        print(f"achieved               : {flops / t_train / 1e12:.2f} "
              f"TFLOP/s, {bts / t_train / 1e9:.0f} GB/s HBM")
    print("\nNOTE: the policy is the reference's 2x64 SB3 MlpPolicy — at "
          "this size the workload is\nlatency/bandwidth-bound by design; "
          "MXU FLOP utilization is bounded by K=49, N=64 tiles.")


if __name__ == "__main__":
    main()
