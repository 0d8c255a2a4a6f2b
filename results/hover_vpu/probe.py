"""Hover rollout kernel probes (VERDICT r5 item 1) — bench methodology
(best-of-3 batches of 16 back-to-back dispatches, block once).

Probes: chunk (K) sweep, env-count sweep (vreg-occupancy/ILP diagnostic:
each op covers n_envs/1024 vregs; if utilization climbs with envs at fixed
per-env work, the 4096-env headline is dependency-latency bound, not
slot bound), v2 tuple carry.
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_pybullet_adrp_tpu.envs import fast_hover
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.ops import pallas_step

sys.path.insert(0, "/root/repo/results/hover_vpu")
from ab_v2 import hover_rollout_v2  # noqa: E402

PARAMS = drone_params(jax.tree_util.tree_leaves and __import__(
    "gym_pybullet_adrp_tpu.utils.enums", fromlist=["DroneModel"]
).DroneModel.CF2X)


def make_fn(roll, envs, steps, chunk, **kw):
    n_chunks = max(steps // chunk, 1)
    state0 = fast_hover.reset_packed(np.array([0.0, 0.0, 0.1125]), envs)

    @jax.jit
    def fn(seed, packed0):
        def body(carry, i):
            p, total = carry
            p, acc = roll(PARAMS, p, seed + i, n_steps=chunk, **kw)
            return (p, total + jnp.sum(acc)), None

        (p, total), _ = jax.lax.scan(
            body, (packed0, jnp.zeros(())), jnp.arange(n_chunks)
        )
        return total

    return partial(fn, packed0=state0.packed), n_chunks * chunk


def measure(fn, env_steps, repeats=16):
    jax.block_until_ready(fn(0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(0) for _ in range(repeats)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / repeats)
    return env_steps / min(times)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3840)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    assert jax.devices()[0].platform == "tpu"

    runs = []
    if args.which in ("all", "chunk"):
        runs += [(f"v1 4096env chunk={c}", pallas_step.hover_rollout,
                  4096, c, {}) for c in (32, 64, 128, 256)]
    if args.which in ("all", "envs"):
        runs += [(f"v1 {e}env chunk=64", pallas_step.hover_rollout,
                  e, 64, {}) for e in (1024, 2048, 8192, 16384, 32768)]
    if args.which in ("all", "v2"):
        runs += [("v2 4096env chunk=64", hover_rollout_v2, 4096, 64, {}),
                 ("v2 16384env chunk=64", hover_rollout_v2, 16384, 64, {})]

    for name, roll, envs, chunk, kw in runs:
        steps = (args.steps // chunk) * chunk or chunk
        fn, steps = make_fn(roll, envs, steps, chunk, **kw)
        r = measure(fn, envs * steps)
        print(f"{name:24s} {r / 1e9:6.3f}B env-steps/s  "
              f"({100 * r * 942.1 / 3.9e12:5.1f}% VPU @942 slots)",
              flush=True)
