"""Multi-process cluster worker for tests/test_hosts.py.

Launched as: python tests/_hosts_worker.py <pid> <nproc> <port> <out.json> [n_local_dev]

Joins a localhost jax.distributed cluster (CPU backend, 4 virtual devices
per process), asserts the hosts.py surface (ensure_initialized,
global_mesh, local_env_slice), runs a cross-process psum, then executes TWO
sharded hover-PPO train steps over the global 8-device mesh and writes the
resulting metrics to ``out.json`` — the single-process equivalence anchor
is computed by the parent test on an 8-virtual-device mesh.

Everything before the jax.distributed join must avoid initializing the XLA
backend (the package imports are backend-clean; regression-pinned in
test_hosts.py).
"""

import json
import os
import sys

N_DEV = int(sys.argv[5]) if len(sys.argv) > 5 else 4
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
    joined = hosts.ensure_initialized(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert joined
    # idempotent re-entry (driver scripts call it unconditionally)
    assert hosts.ensure_initialized(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
    from gym_pybullet_adrp_tpu.envs.rl import RLConfig
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.parallel import distributed
    from gym_pybullet_adrp_tpu.rl.ppo import PPOConfig
    from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel

    assert jax.process_count() == nproc
    assert jax.local_device_count() == N_DEV
    assert jax.device_count() == N_DEV * nproc

    mesh = hosts.global_mesh()
    assert mesh.devices.size == N_DEV * nproc

    start, count = hosts.local_env_slice(64)
    assert count == 64 // nproc and start == pid * count

    # cross-process collective: psum over the global dp axis
    x_local = np.arange(start, start + count, dtype=np.float32)
    xg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), x_local, (64,)
    )
    psum = jax.jit(distributed.shard_map(
        lambda x: jax.lax.psum(x.sum(), "dp"),
        mesh=mesh, in_specs=(P("dp"),), out_specs=P(), check_rep=False,
    ))(xg)
    total = float(np.asarray(psum.addressable_data(0)))
    assert total == float(sum(range(64))), total

    # sharded PPO over the global mesh: 2 train steps, metrics out
    cfg = PPOConfig(n_envs=4, n_steps=8, n_minibatches=2, n_epochs=2)
    rl_cfg = RLConfig(aviary=AviaryConfig(ctrl_freq=30),
                      act_type=ActionType.RPM)
    params = drone_params(DroneModel.CF2X)
    init_xyzs = np.array([[0.0, 0.0, 0.1125]])
    init_rpys = np.zeros((1, 3))
    global_init, train_step = distributed.make_distributed_ppo(
        mesh, cfg, rl_cfg, params, init_xyzs, init_rpys
    )
    ts = hosts_to_global_state(mesh, global_init)
    metrics = None
    for _ in range(2):
        ts, metrics = train_step(ts)
    out = {
        k: float(np.asarray(v.addressable_data(0)).ravel()[0])
        for k, v in metrics.items()
    }
    out["psum"] = total
    out["process_count"] = jax.process_count()
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"WORKER{pid} OK {out}", flush=True)


def hosts_to_global_state(mesh, global_init):
    """Deterministic host-side init in every process, then the standard
    multi-controller conversion (each process contributes local shards)."""
    from gym_pybullet_adrp_tpu.parallel import distributed

    ts = global_init(jax.random.PRNGKey(0))
    return distributed.host_to_global(mesh, ts)


if __name__ == "__main__":
    main()
