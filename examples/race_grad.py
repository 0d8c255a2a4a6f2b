"""Gradient-based trajectory optimization THROUGH the race stack.

Differentiates the full flagship pipeline — FULLSTATE command processing,
the Mellinger firmware control law with its biquad filters and tick
gating, power distribution, and 20 physics substeps per control step —
and optimizes an action plan by plain Adam on exact gradients. The
reference's equivalent stack is a C-firmware subprocess behind pipes and
a C++ physics engine: no gradients exist there at any price.

The plan is a K-step sequence of FULLSTATE position offsets (the RL
action convention); the loss pulls the drone through the first gate
(a waypoint slightly beyond the gate plane) with a small effort penalty.

    python examples/race_grad.py --iters 200 --horizon 25
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run(iters=200, horizon=25, lr=0.05, config="configs/twogates.yaml",
        seed=0, verbose=True):
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from gym_pybullet_adrp_tpu.envs import race as race_mod
    from gym_pybullet_adrp_tpu.envs import race_rl
    from gym_pybullet_adrp_tpu.utils.config import load_config
    from gym_pybullet_adrp_tpu.utils.enums import Physics, RaceMode

    cfg = load_config(config)
    spec = race_mod.RaceSpec.from_config(
        cfg, num_drones=1, racemode=RaceMode.COMPARE, physics=Physics.PYB
    )
    track = race_mod.track_from_config(cfg, num_drones=1)
    gate = np.asarray(track.gates_nominal[0])
    # waypoint 0.3 m beyond the gate plane along its normal
    yaw = gate[5]
    normal = np.array([-np.sin(yaw), np.cos(yaw), 0.0])
    from gym_pybullet_adrp_tpu.utils.constants import GATE_Z_LOW, GATE_Z_TALL

    center = gate[:3].copy()
    center[2] = GATE_Z_TALL if gate[6] == 0 else GATE_Z_LOW
    start = np.asarray(track.init_pos[0])
    if np.dot(start - center, normal) > 0:
        normal = -normal
    waypoint = jnp.asarray(center + 0.3 * normal, dtype=jnp.float32)

    @jax.jit
    def rollout(actions):
        st = race_rl.rl_race_reset(spec, track, jax.random.PRNGKey(seed))

        @jax.checkpoint
        def body(s, a):
            s, obs, r, te, tr = race_rl.rl_race_step(spec, track, s, a[None])
            return s, s.race.phys.pos[0]
        st, traj = jax.lax.scan(body, st, actions)
        return st, traj

    def loss_fn(actions):
        st, traj = rollout(jnp.tanh(actions))
        # sqrt(.+eps): safe gradient if the trajectory hits the waypoint
        d = jnp.sqrt(jnp.sum((traj - waypoint) ** 2, axis=-1) + 1e-8)
        # pull the closest-approach AND the endpoint through the gate
        return d.min() + d[-1] + 1e-3 * jnp.sum(jnp.tanh(actions) ** 2)

    actions = jnp.zeros((horizon, 4))
    # 25 control steps = 500 firmware ticks of BPTT: clip the exploding
    # tail of the gradient spectrum, drop isolated non-finite cotangents
    tx = optax.chain(
        optax.zero_nans(), optax.clip_by_global_norm(1.0), optax.adam(lr)
    )
    opt_state = tx.init(actions)
    val_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.time()
    losses = []
    for it in range(iters):
        loss, g = val_and_grad(actions)
        updates, opt_state = tx.update(g, opt_state, actions)
        actions = optax.apply_updates(actions, updates)
        losses.append(float(loss))
        if verbose and (it % 20 == 0 or it == iters - 1):
            print(f"[{it:4d}] loss {losses[-1]:8.4f}")

    st, traj = rollout(jnp.tanh(actions))
    gates_passed = int(st.race.current_gate[0])
    closest = float(jnp.linalg.norm(traj - waypoint, axis=-1).min())
    if verbose:
        print(
            f"optimized plan: gates passed {gates_passed}, closest approach "
            f"to the beyond-gate waypoint {closest:.3f} m "
            f"({time.time() - t0:.1f} s)"
        )
    return losses, gates_passed, closest


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--config", default="configs/twogates.yaml")
    args = ap.parse_args()
    run(iters=args.iters, horizon=args.horizon, lr=args.lr,
        config=args.config)
