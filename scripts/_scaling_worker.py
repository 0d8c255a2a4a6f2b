"""Worker for scripts/scaling.py: timed sharded-PPO steps in a localhost
jax.distributed cluster (CPU backend, fixed virtual devices per process).

Launched as:
  python scripts/_scaling_worker.py <pid> <nproc> <port> <out.json>
      <n_local_dev> <envs_per_dev> <n_steps> <iters> [mode] [grad_accum]

mode "ppo" (default): timed sharded-PPO train steps.
mode "allreduce": per-sync cost of a gradient-sized (ActorCritic ~26k f32)
cross-process all-reduce — K sequential in-graph psums, timed, divided by
K. On a core-starved container this is the meaningful measured quantity
(the PPO mode's compute thrashes the few physical cores across processes).
"""

import json
import os
import sys
import time

N_DEV = int(sys.argv[5])
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    f" --xla_force_host_platform_device_count={N_DEV}"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gym_pybullet_adrp_tpu.parallel import hosts  # noqa: E402


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    envs_per_dev, n_steps, iters = (
        int(sys.argv[6]), int(sys.argv[7]), int(sys.argv[8])
    )
    if nproc > 1:
        joined = hosts.ensure_initialized(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid,
        )
        assert joined

    import numpy as np

    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
    from gym_pybullet_adrp_tpu.envs.rl import RLConfig
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.parallel import distributed
    from gym_pybullet_adrp_tpu.rl.ppo import PPOConfig
    from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel

    mode = sys.argv[9] if len(sys.argv) > 9 else "ppo"
    grad_accum = int(sys.argv[10]) if len(sys.argv) > 10 else 1
    mesh = hosts.global_mesh()

    if mode == "allreduce":
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_elems = 26_757   # ActorCritic(64,64) param count (f32 ~105 KiB)
        K = 64
        nrm = float(mesh.devices.size)

        def body(x):
            for _ in range(K):
                x = jax.lax.psum(x, "dp") / nrm   # K dependent syncs
            return x

        f = jax.jit(distributed.shard_map(
            body, mesh=mesh, in_specs=(P(),), out_specs=P(),
            check_rep=False,
        ))
        xg = jax.device_put(
            np.ones(n_elems, np.float32),
            NamedSharding(mesh, P()),
        )
        jax.block_until_ready(f(xg))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(xg))
            best = min(best, (time.perf_counter() - t0) / K)
        if pid == 0:
            with open(out_path, "w") as f_:
                json.dump(
                    {"nproc": nproc, "sec_per_sync": best,
                     "bytes": n_elems * 4,
                     "global_devices": int(mesh.devices.size)}, f_,
                )
        print(f"SCALEWORKER{pid} allreduce nproc={nproc} "
              f"{best*1e6:.0f} us/sync", flush=True)
        return

    # fixed total compute across process counts (launcher divides the
    # device count), so step-time inflation isolates the process boundary
    cfg = PPOConfig(n_envs=envs_per_dev, n_steps=n_steps,
                    n_minibatches=2, n_epochs=2, grad_accum=grad_accum)
    rl_cfg = RLConfig(aviary=AviaryConfig(ctrl_freq=30),
                      act_type=ActionType.RPM)
    params = drone_params(DroneModel.CF2X)
    init_xyzs = np.array([[0.0, 0.0, 0.1125]])
    init_rpys = np.zeros((1, 3))
    global_init, train_step = distributed.make_distributed_ppo(
        mesh, cfg, rl_cfg, params, init_xyzs, init_rpys
    )
    ts = distributed.host_to_global(mesh, global_init(jax.random.PRNGKey(0)))

    # warmup / compile
    for _ in range(2):
        ts, metrics = train_step(ts)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        ts, metrics = train_step(ts)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    if pid == 0:
        n_param = sum(
            int(np.prod(np.asarray(x).shape))
            for x in jax.tree_util.tree_leaves(ts.params)
        )
        with open(out_path, "w") as f:
            json.dump(
                {
                    "nproc": nproc,
                    "sec_per_iter": dt,
                    "global_devices": int(mesh.devices.size),
                    "global_batch": int(
                        mesh.devices.size * envs_per_dev * n_steps
                    ),
                    "n_params": n_param,
                    "grad_accum": grad_accum,
                    "grad_syncs_per_iter": cfg.n_epochs
                    * (cfg.n_minibatches // cfg.grad_accum),
                },
                f,
            )
    print(f"SCALEWORKER{pid} nproc={nproc} {dt*1e3:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
