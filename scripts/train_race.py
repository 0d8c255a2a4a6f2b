"""Race-policy PPO training over vmapped race envs.

The reference's race-RL pathway wrapped MultiRaceAviary with the reward/
observation wrappers and fed SB3 one env at a time (its twogates.zip /
example_RL_model.zip artifacts). Here the shaped race env (envs/race_rl.py)
trains under the same PPO learner as the hover tasks, with thousands of
randomized race instances per device.

    python scripts/train_race.py --config configs/twogates.yaml \
        --end_after_gate 2 --iters 200
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/twogates.yaml")
    ap.add_argument("--n_envs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--n_steps", type=int, default=64)
    ap.add_argument("--end_after_gate", type=int, default=2,
                    help="early termination after N gates (0 = full track)")
    ap.add_argument("--out", default="results/race_policy.msgpack")
    ap.add_argument("--init", default=None,
                    help="warm-start params from a saved policy .msgpack "
                         "(curriculum: e.g. train gate-2 first, then init "
                         "the full-track run from it)")
    ap.add_argument("--save_every", type=int, default=0,
                    help="also save the policy every N iterations (0 = "
                         "only at the end)")
    ap.add_argument("--shuffle_block", type=int, default=512,
                    help="minibatch shuffle granularity (1 = exact SB3 "
                         "per-sample permutation; larger = whole-tile "
                         "shuffles, ~5x faster PPO updates on TPU)")
    ap.add_argument("--ent_coef", type=float, default=None,
                    help="override PPO entropy bonus")
    ap.add_argument("--lr", type=float, default=None,
                    help="override PPO learning rate")
    ap.add_argument("--lr_decay", action="store_true",
                    help="linear LR decay to 0 over the run (SB3's "
                         "schedule shape)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fast", action="store_true",
                    help="run the firmware window through the Pallas race "
                         "kernel (envs/race_fast.py)")
    ap.add_argument("--rowfast", action="store_true",
                    help="fully row-major env path (envs/race_rl_rowfast.py;"
                         " fastest; whole level0-3 ladder incl. randomized "
                         "tracks and in-kernel PRNG disturbances)")
    ap.add_argument("--elim_penalty", type=float, default=1.0,
                    help="per-drone sparse penalty at elimination "
                         "(rowfast self-play shaping; 1.0 = reference)")
    ap.add_argument("--prox_radius", type=float, default=0.3,
                    help="opponent-proximity shaping radius (m)")
    ap.add_argument("--prox_penalty", type=float, default=0.0,
                    help="opponent-proximity shaping weight (rowfast "
                         "multi-drone): reward -= w * max(0, 1 - d/radius) "
                         "with d the nearest-opponent horizontal distance "
                         "read from the opponent-pose obs channels — "
                         "pushes racing lines apart at gate convergence "
                         "(level3's dominant failure mode)")
    ap.add_argument("--kernel_chunk", type=int, default=16,
                    help="with --fuse_policy: env steps per rollout-kernel "
                         "launch (0 = one launch per step)")
    ap.add_argument("--fuse_policy", action="store_true",
                    help="run the ActorCritic forward + Gaussian sampling "
                         "INSIDE the fused race kernel (rowfast only): the "
                         "rollout has no XLA policy stage between env "
                         "launches")
    ap.add_argument("--hidden", default="64,64",
                    help="ActorCritic tower widths, e.g. 128,128 — the "
                         "fused policy pack is width-parametric "
                         "(ops/pallas_race_step.pp_layout)")
    ap.add_argument("--n_drones", type=int, default=1,
                    help="with --rowfast and >1: shared-policy self-play — "
                         "every drone acts and learns from its own shaped "
                         "reward (the reference can train only one agent)")
    ap.add_argument("--compete", action="store_true",
                    help="COMPETE mode: drone-drone collisions + opponent "
                         "poses in the observation")
    ap.add_argument("--seed", type=int, default=0,
                    help="PRNG seed for init + the rollout/shuffle key "
                         "chain (with --init the params are overwritten, "
                         "so the seed varies only the training stream — "
                         "the multi-seed continuation lever of "
                         "VALIDATION §4c)")
    ap.add_argument("--league", default=None,
                    help="comma-separated frozen policy .msgpack paths: "
                         "league training (rowfast COMPETE self-play "
                         "only). Drone 0 of every env is the learner; "
                         "drones 1..N-1 act greedily (mean action) from a "
                         "frozen opponent policy — env block i of "
                         "n_envs/P uses pool member i, so the learner "
                         "optimizes against the opponent MIXTURE instead "
                         "of mirrors of itself (the recipe-level lever "
                         "VALIDATION §4c names for the level3 plateau). "
                         "PPO batch = learner-drone rows only.")
    ap.add_argument("--league_refresh", type=int, default=0,
                    help="with --league: every N iterations overwrite "
                         "pool slot 0 with the CURRENT learner params "
                         "(past-selves league, AlphaStar-style); 0 = "
                         "fully frozen pool")
    ap.add_argument("--obs", default="kin", choices=["kin", "rgb"],
                    help="'rgb': camera-based racing — drone-POV frames of "
                         "the actual gates/obstacles ray-cast in-graph, "
                         "conv actor-critic (general path only)")
    ap.add_argument("--img", default="32x24",
                    help="with --obs rgb: frame WxH (reference camera "
                         "spec: 64x48, BaseRLAviary.py:284-305)")
    ap.add_argument("--fov", type=float, default=60.0,
                    help="with --obs rgb: vertical FOV in degrees "
                         "(reference: 60; the round-4 pixels negative "
                         "result diagnosed the gate 1->2 turn as leaving "
                         "the 60-deg frame — widen to retry)")
    ap.add_argument("--camera", default="body",
                    choices=["body", "velocity"],
                    help="with --obs rgb: 'body' = reference rig (along "
                         "body +x; yaw is zeroed by the action space so "
                         "it never turns — target-gate visibility 0-20% "
                         "on 3 of 4 getting_started gates at any "
                         "res/FOV); 'velocity' = gimbal along horizontal "
                         "velocity (48-92% visibility — VALIDATION §5)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gym_pybullet_adrp_tpu.envs import race as race_mod
    from gym_pybullet_adrp_tpu.envs import race_rl
    from gym_pybullet_adrp_tpu.rl import checkpoint as ckpt
    from gym_pybullet_adrp_tpu.rl.ppo import EnvAdapter, PPOConfig, make_ppo_core
    from gym_pybullet_adrp_tpu.utils.config import load_config
    from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode

    config = load_config(args.config)
    rollout_override = None
    n_drones = args.n_drones
    racemode = RaceMode.COMPETE if args.compete else RaceMode.COMPARE
    if n_drones > 1 and not args.rowfast:
        ap.error("--n_drones > 1 requires --rowfast (self-play path)")
    if args.prox_penalty and not (n_drones > 1 and args.compete):
        ap.error("--prox_penalty needs COMPETE self-play (--compete "
                 "--n_drones > 1): it reads the opponent-pose channels")
    if args.prox_penalty and args.fuse_policy:
        ap.error("--prox_penalty shapes rewards in the adapter step; "
                 "use it without --fuse_policy")
    if args.obs == "rgb" and (args.rowfast or args.fast):
        ap.error("--obs rgb runs on the general path (no --rowfast/--fast)")
    if args.league and not (args.rowfast and args.compete
                            and n_drones > 1):
        ap.error("--league needs --rowfast --compete --n_drones > 1")
    if args.league and args.fuse_policy:
        ap.error("--league computes opponent actions in the adapter step; "
                 "use it without --fuse_policy")
    spec = race_mod.RaceSpec.from_config(
        config, num_drones=n_drones, racemode=racemode, physics=Physics.PYB
    )
    track = race_mod.track_from_config(config, num_drones=n_drones)
    # self-play: the PPO batch is every drone of every env
    import dataclasses

    # league: only the learner drone's rows enter the PPO batch
    ppo_rows = args.n_envs * (1 if args.league else n_drones)
    blk = max(1, args.shuffle_block)
    mb = ppo_rows * args.n_steps // 8
    while mb % blk:
        blk //= 2
    cfg = PPOConfig(n_envs=ppo_rows, n_steps=args.n_steps,
                    shuffle_block=blk)
    if args.ent_coef is not None:
        cfg = dataclasses.replace(cfg, ent_coef=args.ent_coef)
    if args.lr is not None:
        cfg = dataclasses.replace(cfg, lr=args.lr)
    if args.lr_decay:
        cfg = dataclasses.replace(
            cfg, total_updates=cfg.updates_for_iters(args.iters)
        )
    end_after = args.end_after_gate

    reset1 = lambda key: race_rl.rl_race_reset(spec, track, key)

    def batched_reset(key):
        keys = jax.random.split(key, cfg.n_envs)
        states = jax.vmap(reset1)(keys)
        obs = jax.vmap(
            lambda s: race_mod.compute_obs(spec, track, s.race)
        )(states)
        return states, obs.reshape(cfg.n_envs, -1)

    if args.rowfast:
        from gym_pybullet_adrp_tpu.envs import race_rl_rowfast

        B = args.n_envs
        row_reset, row_step = race_rl_rowfast.make_row_env(
            spec, track, B, end_after_gate=end_after,
            per_drone_reward=(n_drones > 1),
            interpret=jax.devices()[0].platform == "cpu",
            elim_penalty=args.elim_penalty,
            policy_hidden=tuple(int(x) for x in args.hidden.split(",")),
        )

        def batched_reset(key):
            st = row_reset(key)
            # first obs exactly as the kernel's autoreset builds it
            # (kinematics + nominal geometry channels)
            obs = row_reset.initial_obs(st)
            return st, obs.reshape(cfg.n_envs, spec.obs_size)

        def prox_shape(obs, reward):
            """reward -= w * max(0, 1 - d_min/0.3): opponent-proximity
            shaping from the COMPETE obs channels (obs (B, N, C); the
            opponent poses live at base + 6j). Separates racing lines
            where the characterized level3 failure is drone-drone
            contact at gate convergence (VALIDATION §4c)."""
            base = spec.obs_size - 6 * (n_drones - 1)
            px, py = obs[..., 0], obs[..., 1]
            d2min = None
            for j in range(n_drones - 1):
                ox = obs[..., base + 6 * j]
                oy = obs[..., base + 6 * j + 1]
                d2 = (px - ox) ** 2 + (py - oy) ** 2
                d2min = d2 if d2min is None else jnp.minimum(d2min, d2)
            pen = args.prox_penalty * jnp.clip(
                1.0 - jnp.sqrt(d2min) / args.prox_radius, 0.0, 1.0
            )
            return reward - pen

        if n_drones == 1:
            step_fn = lambda s, a, k: row_step(s, a, k)
        else:
            def step_fn(env_state, action, key):
                # PPO batch = every drone of every env (shared policy)
                act = action.reshape(B, n_drones, 4)
                env_state, obs, reward, done = row_step(env_state, act, key)
                if args.prox_penalty:
                    reward = prox_shape(obs, reward)
                return (
                    env_state,
                    obs.reshape(B * n_drones, spec.obs_size),
                    reward.reshape(B * n_drones),
                    jnp.repeat(done, n_drones),
                )

        adapter = EnvAdapter(
            batched_reset=batched_reset,
            step=step_fn,
            obs_dim=spec.obs_size,
            act_dim=4,
        )

        if args.league:
            from typing import NamedTuple

            from gym_pybullet_adrp_tpu.models.policy import ActorCritic

            hidden_ = tuple(int(x) for x in args.hidden.split(","))
            opp_net = ActorCritic(act_dim=4, hidden=hidden_)
            tmpl = opp_net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, spec.obs_size))
            )
            paths = [p for p in args.league.split(",") if p]
            pool_list = [ckpt.load_policy(p, tmpl) for p in paths]
            P = len(pool_list)
            assert B % P == 0, f"n_envs must divide by pool size {P}"
            pool0 = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *pool_list
            )
            print(f"league pool ({P}): {paths}", flush=True)

            class LeagueState(NamedTuple):
                row: object            # RowRaceState
                obs: jnp.ndarray       # (B, N, C) post-step full obs
                pool: dict             # stacked opponent params (P, ...)

            def league_reset(key):
                st = row_reset(key)
                obs = row_reset.initial_obs(st).reshape(
                    B, n_drones, spec.obs_size
                )
                return LeagueState(st, obs, pool0), obs[:, 0, :]

            def league_step(env_state, action, key):
                obs = env_state.obs
                # opponents act greedily from their frozen pool member:
                # env block i (of B/P) -> member i
                opp_obs = obs[:, 1:, :].reshape(
                    P, (B // P) * (n_drones - 1), spec.obs_size
                )

                def fwd(params, o):
                    mean, _, _ = opp_net.apply(params, o)
                    return mean

                opp_act = jnp.clip(
                    jax.vmap(fwd)(env_state.pool, opp_obs), -1.0, 1.0
                ).reshape(B, n_drones - 1, 4)
                act = jnp.concatenate(
                    [action.reshape(B, 1, 4), opp_act], axis=1
                )
                row, obs2, reward, done = row_step(env_state.row, act, key)
                obs2 = obs2.reshape(B, n_drones, spec.obs_size)
                if args.prox_penalty:
                    reward = prox_shape(obs2, reward)
                return (
                    LeagueState(row, obs2, env_state.pool),
                    obs2[:, 0, :],
                    reward[:, 0],       # learner drone's own shaping
                    done,
                )

            adapter = EnvAdapter(
                batched_reset=league_reset,
                step=league_step,
                obs_dim=spec.obs_size,
                act_dim=4,
            )

        if args.fuse_policy:
            (b_reset, rollout_override, fused_step) = \
                race_rl_rowfast.make_policy_rollout(
                    spec, row_reset, row_step, B, args.n_steps,
                    kernel_chunk=args.kernel_chunk,
                )
            adapter = adapter._replace(
                batched_reset=b_reset, step=fused_step
            )
    else:
        def step(env_state, action, key):
            keys = jax.random.split(key, cfg.n_envs)
            act = action.reshape(cfg.n_envs, 1, 4)
            env_state, obs, reward, term, trunc = race_rl.batched_rl_race_step(
                spec, track, env_state, act, keys, end_after_gate=end_after,
                fast=args.fast,
            )
            return env_state, obs.reshape(cfg.n_envs, -1), reward, term | trunc

        adapter = EnvAdapter(
            batched_reset=batched_reset,
            step=step,
            obs_dim=spec.obs_size,
            act_dim=4,
        )

    network = None
    hidden = tuple(int(x) for x in args.hidden.split(","))
    if hidden != (64, 64):
        from gym_pybullet_adrp_tpu.models.policy import ActorCritic

        network = ActorCritic(act_dim=4, hidden=hidden)
    if args.obs == "rgb":
        from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic

        img_w, img_h = (int(x) for x in args.img.split("x"))
        rgb = jax.vmap(
            lambda s: race_rl.compute_rgb_obs(
                spec, s, width=img_w, height=img_h, fov_deg=args.fov,
                camera=args.camera,
            )
        )
        kin_reset, kin_step = adapter.batched_reset, adapter.step

        def rgb_reset(key):
            env_state, _ = kin_reset(key)
            return env_state, rgb(env_state)

        def rgb_step(env_state, action, key):
            env_state, _, reward, done = kin_step(env_state, action, key)
            return env_state, rgb(env_state), reward, done

        adapter = EnvAdapter(
            batched_reset=rgb_reset, step=rgb_step,
            obs_dim=img_h * img_w * 3, act_dim=4,
        )
        network = CnnActorCritic(act_dim=4, img_h=img_h, img_w=img_w)

    init_fn, train_step, eval_fn = make_ppo_core(
        cfg, adapter, network=network, rollout_override=rollout_override
    )
    ts = init_fn(jax.random.PRNGKey(args.seed))
    if args.init:
        ts = ts._replace(params=ckpt.load_policy(args.init, ts.params))
        print("warm-started from", args.init, flush=True)
    train = jax.jit(train_step)

    t0 = time.time()
    for it in range(args.iters):
        ts, metrics = train(ts)
        if (args.league and args.league_refresh
                and (it + 1) % args.league_refresh == 0):
            # past-selves league: slot 0 becomes the current learner
            ts = ts._replace(env_state=ts.env_state._replace(
                pool=jax.tree_util.tree_map(
                    lambda pool, p: pool.at[0].set(p),
                    ts.env_state.pool, ts.params,
                )
            ))
        if it % 10 == 0 or it == args.iters - 1:
            jax.block_until_ready(metrics["loss"])
            print(
                f"[{it:4d}] mean_ep_return "
                f"{float(metrics['mean_episode_return']):8.3f}  "
                f"mean_reward {float(metrics['mean_reward']):7.4f}  "
                f"({(it + 1) * cfg.batch_size / (time.time() - t0):,.0f} steps/s)",
                flush=True,
            )
        if args.save_every and (it + 1) % args.save_every == 0:
            # numbered snapshots: post-hoc checkpoint selection by eval
            stem = args.out.rsplit(".", 1)
            ckpt.save_policy(f"{stem[0]}_it{it + 1}.{stem[1]}", ts.params)

    ckpt.save_policy(args.out, ts.params)
    print("saved policy:", args.out)


if __name__ == "__main__":
    main()
