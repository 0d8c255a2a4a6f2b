"""Multi-chip data-parallel training: shard_map over a device mesh.

The reference has no distributed backend at all (SURVEY §2.2: single host,
subprocess pipes). Here the scaling recipe follows the standard JAX pattern:
pick a mesh, shard the env batch over the ``dp`` axis, replicate learner
params, and let the per-device PPO update ``pmean`` its gradients over ICI.
Rollout physics never leaves the device it lives on — the only cross-chip
traffic is the gradient all-reduce, which is exactly the layout that rides
ICI at full bandwidth.

Works identically on a real TPU slice and on a virtual
``--xla_force_host_platform_device_count=N`` CPU mesh (how the tests and the
driver's dryrun exercise it without hardware).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: shard_map is a stable API, check_rep renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from gym_pybullet_adrp_tpu.envs import rl as rlenv
from gym_pybullet_adrp_tpu.models.drone import DroneParams
from gym_pybullet_adrp_tpu.rl import ppo

AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(n_devices=None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({devices[0].platform})"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def make_mesh_2d(n_dp: int, n_tp: int, devices=None) -> Mesh:
    """('dp', 'tp') mesh: env batch over dp, learner hidden dims over tp."""
    if devices is None:
        devices = jax.devices()
    need = n_dp * n_tp
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices, have {len(devices)} "
            f"({devices[0].platform})"
        )
    return Mesh(
        np.array(devices[:need]).reshape(n_dp, n_tp), (AXIS, TP_AXIS)
    )


def state_specs(ts: ppo.TrainState) -> ppo.TrainState:
    """Partition specs over the TrainState pytree: params/opt replicated,
    env batch + episode stats sharded on the leading env axis, one rng per
    device."""
    rep = jax.tree_util.tree_map(lambda _: P(), ts.params)
    opt = jax.tree_util.tree_map(lambda _: P(), ts.opt_state)
    sharded = lambda tree: jax.tree_util.tree_map(lambda _: P(AXIS), tree)
    return ppo.TrainState(
        params=rep,
        opt_state=opt,
        env_state=sharded(ts.env_state),
        last_obs=P(AXIS),
        rng=P(AXIS),
        ep_return=P(AXIS),
        ep_len=P(AXIS),
    )


def host_to_global(mesh: Mesh, ts: ppo.TrainState) -> ppo.TrainState:
    """Convert a host-built (process-local) TrainState into global arrays
    laid out per ``state_specs`` over a possibly multi-process mesh.

    Every process must hold the SAME full host state (global_init is
    deterministic in its key, so that holds by construction); each process
    contributes only the shards that live on its local devices — the
    standard ``jax.make_array_from_callback`` multi-controller recipe.
    Single-process meshes pass through unchanged semantically.
    """
    from jax.sharding import NamedSharding

    specs = state_specs(jax.eval_shape(lambda: ts))

    def conv(x, spec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(
        conv, ts, specs,
        is_leaf=lambda v: isinstance(v, P),
    )


def make_distributed_ppo(
    mesh: Mesh,
    cfg: ppo.PPOConfig,
    rl_cfg: rlenv.RLConfig,
    params: DroneParams,
    init_xyzs,
    init_rpys,
    dtype=jnp.float32,
):
    """Build (global_init, global_train_step) over the mesh.

    ``cfg.n_envs`` is the PER-DEVICE env count; the global batch is
    ``n_devices * n_envs * n_steps``. Returned train step is jitted with
    shard_map: env state sharded P('dp'), learner params replicated P().
    """
    n_dev = mesh.devices.size
    init_fn, train_step, _ = ppo.make_ppo(
        cfg, rl_cfg, params, init_xyzs, init_rpys, dtype=dtype, axis_name=AXIS
    )

    def global_init(rng):
        """Build the global TrainState: per-device shards stacked on axis 0."""
        keys = jax.random.split(rng, n_dev)
        states = [init_fn(k) for k in keys]
        # params/opt_state identical across devices: take device 0's
        merged = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[s.env_state for s in states]
        )
        ts = ppo.TrainState(
            params=states[0].params,
            opt_state=states[0].opt_state,
            env_state=merged,
            last_obs=jnp.concatenate([s.last_obs for s in states], axis=0),
            rng=jnp.stack([s.rng for s in states], axis=0),
            ep_return=jnp.concatenate([s.ep_return for s in states], axis=0),
            ep_len=jnp.concatenate([s.ep_len for s in states], axis=0),
        )
        return ts

    def local_step(ts_local: ppo.TrainState):
        # rng arrives as a (1, key_shape...) block per device
        ts_local = ts_local._replace(rng=ts_local.rng[0])
        ts_local, metrics = train_step(ts_local)
        metrics = {
            k: jax.lax.pmean(v.astype(jnp.float32), AXIS)
            for k, v in metrics.items()
        }
        return ts_local._replace(rng=ts_local.rng[None]), metrics

    dummy = jax.eval_shape(lambda: global_init(jax.random.PRNGKey(0)))
    specs = state_specs(dummy)
    metric_specs = {
        "loss": P(), "mean_episode_return": P(), "mean_reward": P(),
        "steps": P(),
    }

    sharded_step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, metric_specs),
        check_rep=False,
    )
    return global_init, jax.jit(sharded_step)


# ---------------------------------------------------------------------------
# learner-side tensor parallelism (pjit sharding annotations)
#
# SURVEY §2.2 closes its parallelism mapping with "optional learner-side TP
# via pjit sharding annotations". The reference has no model parallelism of
# any kind (its policies are 2-layer SB3 MLPs); here the capability exists as
# the standard JAX recipe: annotate the parameter shardings over a ('dp',
# 'tp') mesh and let XLA's SPMD partitioner insert the collectives. The
# ActorCritic towers shard Megatron-style — first Dense column-parallel
# (output features over 'tp'), second Dense row-parallel (contraction over
# 'tp', XLA inserts the psum) — and the Gaussian/value heads stay replicated.
# PP / SP / EP have no substrate in this workload (no pipeline-depth model,
# no token sequences, no experts — SURVEY §2.2, §5 "long-context: N/A").


def actor_critic_tp_specs(tree, n_hidden: int = 2):
    """PartitionSpec tree for an ActorCritic param (or optax state) pytree.

    Works on anything whose paths contain the flax ``Dense_<i>`` module names
    (so the same function annotates adam's mu/nu). Tower layout per
    models/policy.ActorCritic: each tower is ``n_hidden`` Dense layers + one
    head, pi tower first. Hidden layers alternate column/row parallel; heads
    and everything else (biases of row layers, log_std, step counts) stay
    replicated.
    """
    per_tower = n_hidden + 1

    def spec_for(path, leaf):
        dense = None
        for k in path:
            key = getattr(k, "key", None)
            if isinstance(key, str) and key.startswith("Dense_"):
                dense = int(key.split("_")[1])
        if dense is None or leaf.ndim == 0:
            return P()
        j = dense % per_tower
        if j == n_hidden:  # head: replicated
            return P()
        if j % 2 == 0:  # column-parallel: out features sharded
            return P(None, TP_AXIS) if leaf.ndim == 2 else P(TP_AXIS)
        # row-parallel: contraction dim sharded, output replicated
        return P(TP_AXIS, None) if leaf.ndim == 2 else P()

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def make_pjit_ppo(
    mesh: Mesh,
    cfg: ppo.PPOConfig,
    rl_cfg: rlenv.RLConfig,
    params: DroneParams,
    init_xyzs,
    init_rpys,
    dtype=jnp.float32,
):
    """Build (init, train_step) jitted over a ('dp', 'tp') mesh.

    Unlike :func:`make_distributed_ppo` (shard_map, explicit pmean), this is
    the compiler-driven path: one logical single-program train step, env
    batch constrained to P('dp'), ActorCritic hidden dims to P(None, 'tp'),
    XLA SPMD inserts the gradient all-reduce over 'dp' and the activation
    psum over 'tp'. ``cfg.n_envs`` is the GLOBAL env count (must divide the
    'dp' extent). Semantics are bitwise those of the single-device step —
    the mesh only changes the partitioning.
    """
    from jax.sharding import NamedSharding

    n_dp = mesh.shape[AXIS]
    if cfg.n_envs % n_dp:
        raise ValueError(f"n_envs={cfg.n_envs} not divisible by dp={n_dp}")
    init_fn, train_step, _ = ppo.make_ppo(
        cfg, rl_cfg, params, init_xyzs, init_rpys, dtype=dtype
    )

    ts_shape = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    is_spec = lambda x: isinstance(x, P)
    batched = lambda tree: jax.tree_util.tree_map(lambda _: P(AXIS), tree)
    specs = ppo.TrainState(
        params=actor_critic_tp_specs(ts_shape.params),
        opt_state=actor_critic_tp_specs(ts_shape.opt_state),
        env_state=batched(ts_shape.env_state),
        last_obs=P(AXIS),
        rng=P(),
        ep_return=P(AXIS),
        ep_len=P(AXIS),
    )
    sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=is_spec
    )
    metric_sh = {
        k: NamedSharding(mesh, P())
        for k in ("loss", "mean_episode_return", "mean_reward", "steps")
    }
    init = jax.jit(init_fn, out_shardings=sh)
    step = jax.jit(train_step, in_shardings=(sh,), out_shardings=(sh, metric_sh))
    return init, step


def rollout_throughput_fn(mesh, rl_cfg, params, init_xyzs, init_rpys,
                          n_envs_per_device: int, n_steps: int,
                          dtype=jnp.float32):
    """Pure env-stepping throughput workload, sharded over the mesh.

    Steps ``n_devices * n_envs_per_device`` envs for ``n_steps`` control
    steps with random RPM-type actions generated on-device. Returns a jitted
    fn(key) -> scalar checksum; total env steps = n_dev*n_envs*n_steps.
    """
    n_dev = mesh.devices.size
    reset_template = rlenv.rl_reset(rl_cfg, init_xyzs, init_rpys, dtype=dtype)
    env_step = jax.vmap(
        partial(rlenv.autoreset_step, rl_cfg, params, reset_template)
    )

    def local(key):
        key = key[0]
        env_state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_envs_per_device,) + x.shape),
            reset_template,
        )
        n = rl_cfg.aviary.num_drones

        def body(carry, _):
            env_state, key, acc = carry
            key, k = jax.random.split(key)
            action = jax.random.uniform(
                k, (n_envs_per_device, n, rl_cfg.act_size),
                minval=-0.05, maxval=0.05, dtype=dtype,
            )
            env_state, obs, reward, term, trunc = env_step(env_state, action)
            return (env_state, key, acc + jnp.sum(reward)), None

        (env_state, _, acc), _ = jax.lax.scan(
            body, (env_state, key, jnp.zeros((), dtype=dtype)), None,
            length=n_steps,
        )
        return jax.lax.psum(acc, AXIS)[None]

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(AXIS),), out_specs=P(AXIS),
        check_rep=False,
    )
    return jax.jit(fn)


def race_rollout_throughput_fn(mesh, spec, track, n_envs_per_device: int,
                               n_steps: int, interpret: bool = False,
                               rollout_k: int = 0):
    """Sharded flagship-race rollout: the row-major kernel env
    (envs/race_rl_rowfast.py) stepped independently on every device of the
    mesh, metrics psum'd over ICI.

    Same DP recipe as :func:`rollout_throughput_fn` — env shards never
    leave their device; the only cross-chip traffic is the scalar metric
    reduce. Takes a (n_devices*2,) uint32 key block sharded over ``dp``
    (2 per device); returns the global per-device reward sums.
    ``rollout_k`` > 0 drives the K-step rollout kernel
    (ops/pallas_race_step.race_rollout) instead of per-step launches.
    """
    from gym_pybullet_adrp_tpu.envs import race_rl_rowfast

    n = spec.num_drones
    reset, step = race_rl_rowfast.make_row_env(
        spec, track, n_envs_per_device, interpret=interpret
    )

    def local(key_block):
        key = key_block.reshape(2)
        st = reset(key)

        shape = (n_envs_per_device, n, 4) if n > 1 \
            else (n_envs_per_device, 4)
        if rollout_k:
            def body(carry, _):
                s, k = carry
                k, ka, ks = jax.random.split(k, 3)
                a = jax.random.uniform(
                    ka, (rollout_k,) + shape, minval=-1.0, maxval=1.0
                )
                s, REW, _ = step.rollout_steps(
                    s, a, jax.random.split(ks, rollout_k)
                )
                return (s, k), jnp.sum(REW)

            (st, _), rews = jax.lax.scan(
                body, (st, key), None, length=n_steps // rollout_k
            )
            return jax.lax.psum(rews.sum(), AXIS)[None]

        def body(carry, _):
            s, k = carry
            k, ka, ks = jax.random.split(k, 3)
            a = jax.random.uniform(ka, shape, minval=-1.0, maxval=1.0)
            s, _, reward, _ = step(s, a, ks)
            return (s, k), jnp.sum(reward)

        (st, _), rews = jax.lax.scan(body, (st, key), None, length=n_steps)
        return jax.lax.psum(rews.sum(), AXIS)[None]

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(AXIS),), out_specs=P(AXIS),
        check_rep=False,
    )
    return jax.jit(fn)
