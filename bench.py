"""Benchmark: aggregate env-step throughput on one chip.

Workload per BASELINE.md north star: 4096 hover-env instances (240 Hz PYB
physics, 30 Hz control — 8 fused substeps per env step, the reference's
learn.py rates) stepped in lockstep under jit/vmap with random actions.
Prints ONE JSON line; ``vs_baseline`` is against the 1M env-steps/s target.

Usage: python bench.py [--envs 4096] [--steps 256] [--platform default]
"""

import argparse
import json
import sys
import time
from functools import partial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=None,
                    help="rollout length (default 3840 for pallas-rollout, "
                         "256 otherwise)")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu); default: real chip")
    ap.add_argument("--repeats", type=int, default=16,
                    help="calls per timed batch (dispatched back-to-back, "
                         "blocked once: sustained device throughput; 16 "
                         "amortizes per-call dispatch ~fully)")
    ap.add_argument(
        "--impl", choices=["xla", "pallas", "pallas-rollout", "race"],
        default="pallas-rollout",
        help="pallas-rollout: whole 64-step rollout chunks fused in one "
             "kernel launch (in-kernel PRNG actions + episode logic); "
             "pallas: fused physics kernel per control step; "
             "xla: reference-faithful path; "
             "race: flagship 2-drone COMPETE race env on the row-major "
             "kernel path (each env step = 20 firmware ticks of physics + "
             "Mellinger + gates/collisions/opponent obs)",
    )
    ap.add_argument("--drones", type=int, default=2,
                    help="drone count for --impl race")
    ap.add_argument("--rollout_k", type=int, default=0,
                    help="with --impl race: env steps per kernel launch "
                         "(0 = one launch per step)")
    ap.add_argument("--chunk", type=int, default=64,
                    help="with --impl pallas-rollout: control steps per "
                         "hover_rollout launch (K sweep measured flat "
                         "+1.3% from 64 to 256 — VALIDATION §5d)")
    ap.add_argument("--no-extras", action="store_true",
                    help="skip the extra race measurements + roofline keys "
                         "on the default pallas-rollout run")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from gym_pybullet_adrp_tpu.envs import rl as rlenv
    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.parallel.distributed import (
        make_mesh, rollout_throughput_fn,
    )
    from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel

    rl_cfg = rlenv.RLConfig(
        aviary=AviaryConfig(ctrl_freq=30), act_type=ActionType.RPM
    )
    params = drone_params(DroneModel.CF2X)
    init_xyzs = np.array([[0.0, 0.0, 0.1125]])
    init_rpys = np.zeros((1, 3))

    if args.impl == "pallas-rollout" and jax.devices()[0].platform != "tpu":
        # the fused-rollout Mosaic kernel has no practical CPU interpret
        # path (64 in-kernel steps/launch); degrade to the XLA impl so
        # every invocation still prints its JSON line
        print(
            "[bench] pallas-rollout requires a TPU; falling back to "
            "--impl xla", file=sys.stderr,
        )
        args.impl = "xla"

    if args.steps is None:
        args.steps = 3840 if args.impl == "pallas-rollout" else 256

    def build_race_fn(n_drones, n_steps, rollout_k=0):
        """``rollout_k`` > 0: drive the K-step rollout kernel (state
        VMEM-resident across steps) instead of one launch per step — the
        same action/key draws, so the trajectories are identical."""
        from gym_pybullet_adrp_tpu.envs import race as race_mod
        from gym_pybullet_adrp_tpu.envs import race_rl_rowfast
        from gym_pybullet_adrp_tpu.utils.config import load_config
        from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode

        N = n_drones
        config = load_config("getting_started")
        spec = race_mod.RaceSpec.from_config(
            config, N, RaceMode.COMPETE if N > 1 else RaceMode.COMPARE,
            Physics.PYB,
        )
        track = race_mod.track_from_config(config, N)
        interpret = jax.devices()[0].platform == "cpu"
        reset, step = race_rl_rowfast.make_row_env(
            spec, track, args.envs, interpret=interpret
        )
        state0 = reset(jax.random.PRNGKey(0))
        act_shape = (args.envs, N, 4) if N > 1 else (args.envs, 4)

        # NOTE: the initial state must be an ARGUMENT, not a closed-over
        # constant — baking a multi-MB pytree into the executable as
        # constants costs ~30 ms of re-materialization per call (measured),
        # which understates throughput 2-3x at these step counts.
        @jax.jit
        def fn(key, state0):
            # actions for the whole rollout in ONE batched draw — the
            # serialized per-step threefry chain otherwise charges ~2-3 us
            # of tiny-op latency to every step (harness cost, not env cost)
            k_act, k_env = jax.random.split(key[0])
            actions = jax.random.uniform(
                k_act, (n_steps,) + act_shape, minval=-1.0, maxval=1.0
            )
            env_keys = jax.random.split(k_env, n_steps)

            if rollout_k:
                n_chunks = n_steps // rollout_k
                actions_c = actions.reshape(
                    (n_chunks, rollout_k) + actions.shape[1:]
                )
                keys_c = env_keys.reshape(
                    (n_chunks, rollout_k) + env_keys.shape[1:]
                )

                def body(carry, xs):
                    st, acc = carry
                    a, ks = xs
                    st, REW, DONE = step.rollout_steps(st, a, ks)
                    return (st, acc + jnp.sum(REW)), None

                (st, acc), _ = jax.lax.scan(
                    body, (state0, jnp.zeros(())), (actions_c, keys_c),
                )
                return acc[None]

            def body(carry, xs):
                st, acc = carry
                a, ks = xs
                st, obs, reward, done = step(st, a, ks)
                return (st, acc + jnp.sum(reward)), None

            (st, acc), _ = jax.lax.scan(
                body, (state0, jnp.zeros(())), (actions, env_keys),
            )
            return acc[None]

        return partial(fn, state0=state0)

    if args.impl == "race":
        fn = build_race_fn(args.drones, args.steps, rollout_k=args.rollout_k)
    elif args.impl == "pallas-rollout":
        from gym_pybullet_adrp_tpu.envs import fast_hover
        from gym_pybullet_adrp_tpu.ops import pallas_step

        chunk = args.chunk
        n_chunks = max(args.steps // chunk, 1)
        args.steps = chunk * n_chunks
        state0 = fast_hover.reset_packed(
            np.array([0.0, 0.0, 0.1125]), args.envs
        )

        @jax.jit
        def fn(key, packed0):
            seed = key[0, 0].astype(jnp.int32)

            def body(carry, i):
                p, total = carry
                p, acc = pallas_step.hover_rollout(
                    params, p, seed + i, n_steps=chunk
                )
                return (p, total + jnp.sum(acc)), None

            (p, total), _ = jax.lax.scan(
                body, (packed0, jnp.zeros(())), jnp.arange(n_chunks)
            )
            return total[None]

        fn = partial(fn, packed0=state0.packed)
    elif args.impl == "pallas":
        from gym_pybullet_adrp_tpu.envs import fast_hover

        # pallas compiles for TPU; CPU runs use the interpreter
        interpret = jax.devices()[0].platform == "cpu"
        step = fast_hover.make_step(params, args.envs, interpret=interpret)
        state0 = fast_hover.reset_packed(
            np.array([0.0, 0.0, 0.1125]), args.envs
        )
        T = args.envs // fast_hover.LANE

        @jax.jit
        def fn(key, state0):
            def body(carry, _):
                st, k, acc = carry
                k, ka = jax.random.split(k)
                action = jax.random.uniform(
                    ka, (4, T, fast_hover.LANE), minval=-0.05, maxval=0.05
                )
                st, (obs, reward, done) = step(st, action)
                return (st, k, acc + jnp.sum(reward)), None

            (st, _, acc), _ = jax.lax.scan(
                body, (state0, key[0], jnp.zeros(())), None,
                length=args.steps,
            )
            return acc[None]

        fn = partial(fn, state0=state0)
    else:
        mesh = make_mesh(1)
        fn = rollout_throughput_fn(
            mesh, rl_cfg, params, init_xyzs, init_rpys,
            n_envs_per_device=args.envs, n_steps=args.steps,
        )
    key = jax.random.PRNGKey(0)[None]

    spreads = {}

    def measure(f, env_steps, repeats, spread_key=None):
        # sustained throughput: dispatch `repeats` independent calls
        # back-to-back and block once — the device executes them
        # contiguously, so host/tunnel round-trip latency (~20 ms/call
        # through the remote-TPU tunnel) isn't charged to every call.
        # The batch-to-batch spread is recorded so a capture carries its
        # own variance estimate (sessions drift ±10% on the shared chip).
        jax.block_until_ready(f(key))     # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f(key) for _ in range(repeats)]
            jax.block_until_ready(outs)
            times.append((time.perf_counter() - t0) / repeats)
        if spread_key:
            spreads[spread_key] = round(
                100.0 * (max(times) - min(times)) / min(times), 1
            )
        return env_steps / min(times)

    steps_per_sec = measure(fn, args.envs * args.steps, args.repeats,
                            spread_key="headline")

    from gym_pybullet_adrp_tpu.utils import roofline as rf

    out = {
        "metric": (
            f"race{args.drones}_env_steps_per_sec_per_chip_"
            f"{args.envs}envs" if args.impl == "race"
            else "env_steps_per_sec_per_chip_4096envs"
        ),
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / 1e6, 4),
    }

    # roofline annotation of the headline number (VERDICT r2 item 4):
    # analytic HBM bytes/step from the kernel block shapes + VPU issue
    # slots/step from the jaxpr census (utils/roofline.py — slot currency
    # per VERDICT r3 item 4: vpu_pct is a true utilization, <= 100 by
    # construction; regenerated by scripts/roofline.py)
    def annotate(prefix, sps, slots_key, bytes_per_step):
        pct = rf.roofline_pct(
            sps, rf.VPU_SLOTS_PER_ENV_STEP[slots_key], bytes_per_step,
            rf.VPU_SLOTS_CAL_PER_ENV_STEP[slots_key],
        )
        out[f"{prefix}_vpu_pct"] = pct["vpu_pct"]
        out[f"{prefix}_vpu_cal_pct"] = pct["vpu_cal_pct"]
        out[f"{prefix}_hbm_pct"] = pct["hbm_pct"]

    if args.impl == "pallas-rollout":
        annotate("hover", steps_per_sec, "hover",
                 rf.hover_rollout_bytes_per_step(args.envs, args.chunk))
        if not args.no_extras:
            # the flagship race kernels as extra keys on the same line:
            # the K-step rollout kernel (the headline, state VMEM-resident
            # across 32 steps/launch) AND the single-step-launch path
            # (the gymnasium-step-granularity number)
            for n in (1, 2):
                sps = measure(
                    build_race_fn(n, 256, rollout_k=32),
                    args.envs * 256, args.repeats,
                    spread_key=f"race{n}",
                )
                out[f"race{n}_env_steps_per_sec"] = round(sps, 1)
                annotate(
                    f"race{n}", sps, f"race{n}",
                    rf.race_rollout_bytes_per_step(args.envs, n),
                )
                # full `repeats` dispatch depth: at 8 the per-call
                # dispatch overhead shaved ~25% off the race numbers
                sps_step = measure(
                    build_race_fn(n, 256), args.envs * 256, args.repeats,
                )
                out[f"race{n}_steplaunch_env_steps_per_sec"] = round(
                    sps_step, 1
                )
    elif args.impl == "race" and args.drones in (1, 2):
        annotate(
            f"race{args.drones}", steps_per_sec, f"race{args.drones}",
            rf.race_rollout_bytes_per_step(
                args.envs, args.drones, k_steps=args.rollout_k
            ) if args.rollout_k
            else rf.race_fused_bytes_per_step(args.envs, args.drones),
        )

    for k, v in spreads.items():
        out[f"{k}_batch_spread_pct"] = v
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
