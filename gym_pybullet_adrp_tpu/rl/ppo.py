"""PPO learner over vmapped envs — pure JAX, one jitted train step.

Replaces the reference's SB3 PPO training loop (reference
examples/learn.py:72-94, which stepped ONE PyBullet env per rollout step
through Python). Here the rollout is a ``lax.scan`` over time of a ``vmap``
over thousands of env instances, and the PPO update (GAE + clipped surrogate,
SB3-default hyperparameters) runs in the same XLA program — so a full
iteration is a single device launch. Multi-chip scaling wraps this train
step in ``shard_map`` over a device mesh (see ``parallel/``).

Two entry points:
* ``make_ppo``      — hover/multihover envs (the reference's learn.py tasks)
* ``make_ppo_core`` — any environment via an ``EnvAdapter`` (used by the
  race trainer, scripts/train_race.py)
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gym_pybullet_adrp_tpu.envs import rl as rlenv
from gym_pybullet_adrp_tpu.models.drone import DroneParams
from gym_pybullet_adrp_tpu.models.policy import (
    ActorCritic, gaussian_entropy, gaussian_logp, sample_action,
)


@dataclass(frozen=True)
class PPOConfig:
    """SB3-default PPO hyperparameters (reference learn.py uses SB3 defaults)."""

    n_envs: int = 256
    n_steps: int = 64          # rollout horizon per env per iteration
    n_epochs: int = 10
    n_minibatches: int = 8
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    # optional linear LR decay to 0 over this many optimizer updates
    # (len(iterations) * n_epochs * n_minibatches); None = constant LR
    total_updates: int = None
    # minibatch-shuffle granularity: 1 = exact SB3 per-sample permutation;
    # >1 permutes contiguous blocks of that many samples instead. TPU
    # gathers of ~200-byte rows run far below HBM bandwidth, and the
    # 131k-element sort behind jax.random.permutation costs ~0.5 ms per
    # epoch — block shuffling keeps minibatches unbiased (consecutive rows
    # are independent envs at one timestep) while moving whole tiles.
    shuffle_block: int = 1
    # gradient accumulation: average gradients over this many consecutive
    # minibatches per optimizer update (must divide n_minibatches). The
    # multi-host lever (VERDICT r3 item 5): under data parallelism the
    # cross-host pmean fires once per UPDATE, so grad_accum=8 cuts an
    # iteration's gradient syncs 80 -> 10 at n_epochs=10. Semantics delta
    # vs SB3 (deliberate, documented): n_minibatches/grad_accum optimizer
    # steps per epoch with an 8x-larger effective batch each, where each
    # micro-batch still normalizes its own advantages; grad_accum=1
    # (default) is exactly the SB3 schedule.
    grad_accum: int = 1

    @property
    def batch_size(self):
        return self.n_envs * self.n_steps

    def updates_for_iters(self, n_iters: int) -> int:
        """Optimizer updates (tx.update calls) across n_iters iterations —
        the linear-LR-schedule horizon. Accumulation groups g minibatches
        into one update."""
        return n_iters * self.n_epochs * (
            self.n_minibatches // self.grad_accum
        )


class EnvAdapter(NamedTuple):
    """Minimal batched-env interface PPO trains against.

    batched_reset(key) -> env_state (leaves carry a leading n_envs axis)
    step(env_state, action (n_envs, act_dim), key)
        -> (env_state, flat_obs (n_envs, obs_dim), reward (n_envs,),
            done (n_envs,))  with autoreset semantics (post-done obs is the
            fresh episode's first obs).
    """

    batched_reset: Callable
    step: Callable
    obs_dim: int
    act_dim: int


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: object            # batched env pytree
    last_obs: jnp.ndarray        # (n_envs, obs_dim)
    rng: jax.Array
    ep_return: jnp.ndarray
    ep_len: jnp.ndarray


def ppo_loss(network, clip_eps, vf_coef, ent_coef, params, batch,
             advantages, returns):
    """Clipped-surrogate PPO loss (SB3 semantics: per-micro-batch advantage
    normalization). Module-level so tests can compute reference gradients
    with the exact same function the learner differentiates."""
    mean, log_std, value = network.apply(params, batch.obs)
    logp = gaussian_logp(batch.action, mean, log_std)
    ratio = jnp.exp(logp - batch.logp)
    adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    pg1 = ratio * adv
    pg2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
    v_loss = 0.5 * jnp.mean((value - returns) ** 2)
    ent = gaussian_entropy(log_std)
    total = pg_loss + vf_coef * v_loss - ent_coef * ent
    return total, (pg_loss, v_loss, ent)


def grouped_update(loss_fn, tx, axis_name, g, params, opt_state, xs):
    """g gradient-accumulation micro-steps, ONE optimizer update (and,
    under a mesh axis, ONE cross-host gradient pmean) — the multi-host
    sync-thinning lever (PPOConfig.grad_accum). ``xs`` is a
    (batch, advantages, returns) tuple whose leaves carry a leading
    ``g`` axis; the applied gradient is the MEAN of the g micro-batch
    gradients (each micro-batch normalizes its own advantages inside
    ``loss_fn``). Pinned by tests/test_rl.py::test_grad_accum_*."""

    def accum(acc, micro):
        batch, adv, ret = micro
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, adv, ret)
        acc = jax.tree_util.tree_map(jnp.add, acc, grads)
        return acc, loss

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    acc, losses = jax.lax.scan(accum, zeros, xs)
    grads = jax.tree_util.tree_map(lambda t: t / g, acc)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name=axis_name)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return (params, opt_state), losses


def make_ppo_core(cfg: PPOConfig, adapter: EnvAdapter, dtype=jnp.float32,
                  axis_name=None, network=None, rollout_override=None):
    """Build (init_fn, train_step, eval_rollout) for any EnvAdapter.

    Pass ``axis_name`` when wrapping in shard_map/pmap so gradients pmean
    over the mesh axis. ``network`` overrides the default MLP ActorCritic —
    any flax module with the same ``(mean, log_std, value)`` call contract
    (e.g. models.policy.CnnActorCritic for pixel observations).

    ``rollout_override(ts) -> (ts, traj, roll_metrics)`` replaces the
    default scan of (network.apply -> sample -> adapter.step) — used by
    the policy-in-kernel race rollout (envs/race_rl_rowfast.step_policy),
    where the policy forward runs inside the env kernel launch. The
    override must return a :class:`Transition` with (n_steps, batch)
    leaves and metrics with the same keys as the default rollout.
    """
    network = network or ActorCritic(act_dim=adapter.act_dim)
    if cfg.total_updates is not None:
        lr = optax.linear_schedule(
            init_value=cfg.lr, end_value=0.0,
            transition_steps=cfg.total_updates,
        )
    else:
        lr = cfg.lr
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )

    def init_fn(rng):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        net_params = network.init(
            k1, jnp.zeros((1, adapter.obs_dim), dtype=dtype)
        )
        env_state, obs = adapter.batched_reset(k2)
        return TrainState(
            params=net_params,
            opt_state=tx.init(net_params),
            env_state=env_state,
            last_obs=obs.astype(dtype),
            rng=rng,
            ep_return=jnp.zeros(cfg.n_envs, dtype=dtype),
            ep_len=jnp.zeros(cfg.n_envs, dtype=jnp.int32),
        )

    def rollout_step(carry, _):
        ts = carry
        rng, k_act, k_env = jax.random.split(ts.rng, 3)
        mean, log_std, value = network.apply(ts.params, ts.last_obs)
        action, logp = sample_action(k_act, mean, log_std)
        action_clipped = jnp.clip(action, -1.0, 1.0)
        env_state, obs, reward, done = adapter.step(
            ts.env_state, action_clipped, k_env
        )
        ep_return = ts.ep_return + reward
        ep_len = ts.ep_len + 1
        tr = Transition(
            obs=ts.last_obs, action=action, logp=logp, value=value,
            reward=reward.astype(dtype), done=done,
        )
        metrics = {
            "finished_return": jnp.where(done, ep_return, jnp.nan),
            "finished_len": jnp.where(done, ep_len, -1),
        }
        ts = ts._replace(
            env_state=env_state,
            last_obs=obs.astype(dtype),
            rng=rng,
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_len=jnp.where(done, 0, ep_len),
        )
        return ts, (tr, metrics)

    def compute_gae(traj: Transition, last_value):
        def scan_fn(carry, tr):
            gae, next_value = carry
            nonterminal = 1.0 - tr.done.astype(last_value.dtype)
            delta = tr.reward + cfg.gamma * next_value * nonterminal - tr.value
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            return (gae, tr.value), gae

        (_, _), advantages = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        return advantages, advantages + traj.value

    loss_fn = partial(
        ppo_loss, network, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef
    )

    def make_update_epoch(traj, advantages, returns):
        """Epoch body closing over the (invariant) trajectory arrays —
        carrying them through the epoch scan would copy ~30 MB per epoch."""
        batch_size = cfg.batch_size
        mb = batch_size // cfg.n_minibatches
        blk = cfg.shuffle_block
        assert batch_size % blk == 0 and mb % blk == 0, \
            "shuffle_block must divide the minibatch size"
        n_blocks = batch_size // blk

        def update_epoch(carry, _):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            # permute the whole batch ONCE and scan over contiguous
            # minibatch slices: same minibatch membership/order as
            # per-minibatch index gathers. blk > 1 permutes whole tiles
            # (one sort of batch/blk elements + contiguous DMA).
            take = jax.random.permutation(k, n_blocks)[
                : (mb * cfg.n_minibatches) // blk
            ]
            if blk == 1:
                shuffle = lambda x: x.reshape(
                    (batch_size,) + x.shape[2:]
                )[take].reshape((cfg.n_minibatches, mb) + x.shape[2:])
            else:
                shuffle = lambda x: x.reshape(
                    (n_blocks, blk) + x.shape[2:]
                )[take].reshape((cfg.n_minibatches, mb) + x.shape[2:])
            # only the fields the surrogate loss reads (value/reward/done
            # are already folded into advantages/returns by GAE)
            mb_traj = Transition(
                obs=shuffle(traj.obs), action=shuffle(traj.action),
                logp=shuffle(traj.logp), value=None, reward=None, done=None,
            )
            mb_adv = shuffle(advantages)
            mb_ret = shuffle(returns)

            g = cfg.grad_accum
            assert cfg.n_minibatches % g == 0, \
                "grad_accum must divide n_minibatches"

            def group(x):
                # (n_minibatches, mb, ...) -> (n_groups, g, mb, ...)
                return x.reshape(
                    (cfg.n_minibatches // g, g) + x.shape[1:]
                )

            gr_traj = jax.tree_util.tree_map(
                lambda x: None if x is None else group(x), mb_traj
            )
            gr_adv, gr_ret = group(mb_adv), group(mb_ret)

            (params, opt_state), losses = jax.lax.scan(
                lambda carry, xs: grouped_update(
                    loss_fn, tx, axis_name, g, carry[0], carry[1], xs
                ),
                (params, opt_state),
                (gr_traj, gr_adv, gr_ret),
            )
            return (params, opt_state, rng), losses.reshape(-1)

        return update_epoch

    def train_step(ts: TrainState):
        """One PPO iteration. Returns (train_state, metrics dict)."""
        if rollout_override is not None:
            ts, traj, roll_metrics = rollout_override(ts)
        else:
            ts, (traj, roll_metrics) = jax.lax.scan(
                rollout_step, ts, None, length=cfg.n_steps
            )
        _, _, last_value = network.apply(ts.params, ts.last_obs)
        advantages, returns = compute_gae(traj, last_value)

        carry = (ts.params, ts.opt_state, ts.rng)
        carry, losses = jax.lax.scan(
            make_update_epoch(traj, advantages, returns), carry, None,
            length=cfg.n_epochs,
        )
        params, opt_state, rng = carry
        ts = ts._replace(params=params, opt_state=opt_state, rng=rng)

        metrics = {
            "loss": losses.mean(),
            "mean_episode_return": jnp.nanmean(roll_metrics["finished_return"]),
            "mean_reward": traj.reward.mean(),
            "steps": jnp.asarray(cfg.batch_size, dtype=jnp.int32),
        }
        return ts, metrics

    def eval_rollout(params, rng, n_steps: int, eval_reset_key=0):
        """Deterministic (mean-action) single-env return, first episode only
        (SB3 evaluate_policy(deterministic=True), reference learn.py:142-145)."""
        env_state, obs = adapter.batched_reset(
            jax.random.PRNGKey(eval_reset_key)
        )
        # use only the first env of the batch; adapter batches are cheap
        def step_fn(carry, _):
            env_state, obs, ret, done_seen = carry
            mean, _, _ = network.apply(params, obs)
            act = jnp.clip(mean, -1.0, 1.0)
            env_state, obs2, reward, done = adapter.step(
                env_state, act, jax.random.PRNGKey(0)
            )
            ret = ret + jnp.where(done_seen, 0.0, reward)
            done_seen = done_seen | done
            return (env_state, obs2.astype(dtype), ret, done_seen), None

        carry = (
            env_state, obs.astype(dtype),
            jnp.zeros(obs.shape[0], dtype=dtype),
            jnp.zeros(obs.shape[0], dtype=bool),
        )
        (_, _, ret, _), _ = jax.lax.scan(step_fn, carry, None, length=n_steps)
        return ret

    return init_fn, train_step, eval_rollout


# ---------------------------------------------------------------------------
# hover/multihover adapter (the reference learn.py tasks)


def hover_adapter(cfg: PPOConfig, rl_cfg: rlenv.RLConfig,
                  params: DroneParams, init_xyzs, init_rpys,
                  dtype=jnp.float32) -> EnvAdapter:
    n_drones = rl_cfg.aviary.num_drones
    reset_template = rlenv.rl_reset(rl_cfg, init_xyzs, init_rpys, dtype=dtype)
    env_step = jax.vmap(
        partial(rlenv.autoreset_step, rl_cfg, params, reset_template)
    )

    def batched_reset(key):
        env_state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (cfg.n_envs,) + x.shape),
            reset_template,
        )
        obs = jax.vmap(partial(rlenv.compute_obs, rl_cfg))(env_state)
        return env_state, obs.reshape(cfg.n_envs, -1)

    def step(env_state, action, key):
        act = action.reshape(-1, n_drones, rl_cfg.act_size)
        env_state, obs, reward, term, trunc = env_step(env_state, act)
        return (
            env_state,
            obs.reshape(obs.shape[0], -1),
            reward,
            term | trunc,
        )

    return EnvAdapter(
        batched_reset=batched_reset,
        step=step,
        obs_dim=n_drones * rl_cfg.obs_size,
        act_dim=n_drones * rl_cfg.act_size,
    )


def rgb_hover_adapter(cfg: PPOConfig, rl_cfg: rlenv.RLConfig,
                      params: DroneParams, init_xyzs, init_rpys,
                      width: int = 32, height: int = 24,
                      dtype=jnp.float32) -> EnvAdapter:
    """Pixels-to-actions hover env: obs = drone-0 POV frames rendered
    in-graph (rlenv.compute_rgb_obs). Pair with
    ``models.policy.CnnActorCritic(act_dim, img_h=height, img_w=width)``.
    """
    kin = hover_adapter(cfg, rl_cfg, params, init_xyzs, init_rpys, dtype)
    rgb = jax.vmap(
        partial(rlenv.compute_rgb_obs, rl_cfg, params,
                width=width, height=height)
    )

    def batched_reset(key):
        env_state, _ = kin.batched_reset(key)
        return env_state, rgb(env_state)

    def step(env_state, action, key):
        env_state, _, reward, done = kin.step(env_state, action, key)
        # post-done env_state is already reset, so this is the fresh obs
        return env_state, rgb(env_state), reward, done

    return EnvAdapter(
        batched_reset=batched_reset,
        step=step,
        obs_dim=height * width * 3,
        act_dim=kin.act_dim,
    )


def make_ppo(cfg: PPOConfig, rl_cfg: rlenv.RLConfig, params: DroneParams,
             init_xyzs, init_rpys, dtype=jnp.float32, axis_name=None):
    """Hover-task PPO (public API used by examples/learn.py and parallel/)."""
    adapter = hover_adapter(cfg, rl_cfg, params, init_xyzs, init_rpys, dtype)
    init_fn, train_step, eval_core = make_ppo_core(
        cfg, adapter, dtype=dtype, axis_name=axis_name
    )

    def eval_rollout(params_, rng, n_steps: int):
        return eval_core(params_, rng, n_steps)[:1]

    return init_fn, train_step, eval_rollout


def flatten_obs(cfg: rlenv.RLConfig, obs):
    """(..., N, D) per-drone obs -> flat (..., N*D) vector."""
    return obs.reshape(obs.shape[:-2] + (-1,))
