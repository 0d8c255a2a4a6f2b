"""Vectorized Gymnasium envs: N instances stepped as ONE device launch.

The reference's vectorization is SB3's ``make_vec_env(HoverAviary,
n_envs=1)`` (reference examples/learn.py:53-65) — one PyBullet process per
env instance, stepped sequentially on the host. Here the batch axis is a
``jax.vmap`` axis of the functional env core, so a ``JaxVectorEnv`` with
thousands of instances costs one XLA launch per step — usable as a drop-in
batched env for external (e.g. torch-based) trainers, while the in-repo PPO
(rl/ppo.py) skips the host boundary entirely.

Autoreset is SAME-STEP (the SB3 VecEnv convention the reference trained
against): when an episode ends, the returned observation is already the
FIRST observation of the next episode, and the ended episode's terminal
observation is surfaced through infos under BOTH the gymnasium >= 1.0
spellings (``infos["final_obs"]`` / ``infos["_final_obs"]``) and the
0.29-era ones (``infos["final_observation"]`` / ``"_final_observation"``),
so external trainers of either generation bootstrap V(s_T) from the right
state on truncation. ``metadata["autoreset_mode"]`` declares the mode for
gymnasium 1.x consumers.

``reset(seed=...)`` keys both the initial batch and the autoreset chain
(see ``init_pos_jitter``/``init_rpy_jitter``); the reference's
BaseAviary.reset:246 accepts a seed but ignores it.
"""

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import gymnasium
from gymnasium.vector import VectorEnv
from gymnasium.vector.utils import batch_space

try:  # gymnasium >= 1.0
    _AUTORESET_SAME_STEP = gymnasium.vector.AutoresetMode.SAME_STEP
except AttributeError:  # pragma: no cover - older gymnasium
    _AUTORESET_SAME_STEP = "SameStep"

from gym_pybullet_adrp_tpu.envs import rl
from gym_pybullet_adrp_tpu.envs.aviary import HoverAviary, MultiHoverAviary

# first seed used by reset(seed=None): disjoint from the small explicit
# seeds users pass, so an unseeded reset never aliases reset(seed=0)
_UNSEEDED_BASE = 1 << 31
from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel


class JaxVectorEnv(VectorEnv):
    """Batched HoverAviary / MultiHoverAviary (task='hover'/'multihover')."""

    metadata = {"render_modes": [], "autoreset_mode": _AUTORESET_SAME_STEP}

    def __init__(
        self,
        num_envs: int,
        task: str = "hover",
        num_drones: int = 1,
        drone_model: DroneModel = DroneModel.CF2X,
        act: ActionType = ActionType.RPM,
        ctrl_freq: int = 30,
        dtype=jnp.float32,
        init_pos_jitter: float = 0.0,
        init_rpy_jitter: float = 0.0,
    ):
        """``init_pos_jitter``/``init_rpy_jitter`` enable seeded per-episode
        initial-state randomization: every reset AND every autoreset draws
        uniform offsets in ``[-jitter, +jitter]`` (meters / radians) around
        the nominal start pose, keyed off ``reset(seed=...)``. The default
        0.0 keeps the reference-parity behavior (the reference's
        BaseAviary.reset:246 accepts but ignores its seed) while the key
        chain is still threaded — so identical seeds are bitwise equal and,
        with jitter enabled, different seeds give different batches.
        """
        if task == "multihover":
            proto = MultiHoverAviary(
                drone_model=drone_model, num_drones=max(num_drones, 2),
                act=act, ctrl_freq=ctrl_freq, dtype=dtype,
            )
        else:
            proto = HoverAviary(
                drone_model=drone_model, act=act, ctrl_freq=ctrl_freq,
                dtype=dtype,
            )
        self._proto = proto           # space definitions + params + inits
        self.num_envs = num_envs
        self.single_observation_space = proto.observation_space
        self.single_action_space = proto.action_space
        self.observation_space = batch_space(proto.observation_space, num_envs)
        self.action_space = batch_space(proto.action_space, num_envs)

        cfg, params = proto.rl_cfg, proto.params
        self._n = proto.NUM_DRONES
        self._act_size = cfg.act_size
        reset_template = rl.rl_reset(
            cfg, proto.INIT_XYZS, proto.INIT_RPYS, dtype=dtype
        )
        self._template = reset_template
        base_xyzs = jnp.asarray(proto.INIT_XYZS, dtype=dtype)
        base_rpys = jnp.asarray(proto.INIT_RPYS, dtype=dtype)
        pj, rj = float(init_pos_jitter), float(init_rpy_jitter)
        self._jitter = (pj, rj)

        def _draw_reset_states(key):
            """Per-env reset states with seeded start-pose jitter (the
            keyed randomization the reference only declares in its configs;
            with jitter 0 this reduces to the broadcast template)."""
            if pj == 0.0 and rj == 0.0:
                return jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape),
                    reset_template,
                )
            kp, kr = jax.random.split(key)
            n = base_xyzs.shape[0]
            dx = pj * jax.random.uniform(
                kp, (num_envs, n, 3), minval=-1.0, maxval=1.0, dtype=dtype
            )
            dr = rj * jax.random.uniform(
                kr, (num_envs, n, 3), minval=-1.0, maxval=1.0, dtype=dtype
            )
            return jax.vmap(
                lambda x, r: rl.rl_reset(cfg, x, r, dtype=dtype)
            )(base_xyzs[None] + dx, base_rpys[None] + dr)

        @jax.jit
        def _batched_reset(seed):
            key = jax.random.PRNGKey(seed)
            k_init, k_chain = jax.random.split(key)
            state = _draw_reset_states(k_init)
            return (
                state,
                jax.vmap(partial(rl.compute_obs, cfg))(state),
                k_chain,
            )

        self._jit_reset = _batched_reset
        obs_dim = int(np.prod(self.single_observation_space.shape))
        self._obs_dim = obs_dim

        @jax.jit
        def _step(state, act, key):
            k_reset, k_next = jax.random.split(key)
            reset_states = _draw_reset_states(k_reset)
            state, obs, final_obs, reward, term, trunc = jax.vmap(
                partial(rl.autoreset_step_with_final, cfg, params)
            )(reset_states, state, act)
            # ONE packed output array = ONE device->host transfer per step
            # (each separate fetch pays a full host round trip — ~50 ms
            # through this container's remote-TPU tunnel, 5 of them made
            # the naive step 269 ms)
            packed = jnp.concatenate(
                [
                    obs.reshape(num_envs, -1),
                    final_obs.reshape(num_envs, -1),
                    reward[:, None].astype(jnp.float32),
                    term[:, None].astype(jnp.float32),
                    trunc[:, None].astype(jnp.float32),
                ],
                axis=1,
            )
            return state, packed, k_next

        self._jit_step = _step
        self._state = None
        self._key = None
        # unseeded resets draw from a counter disjoint from small user
        # seeds (seed=None must not alias an explicit reset(seed=0))
        self._unseeded_count = _UNSEEDED_BASE

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        # the seed keys the initial-state jitter draws AND the autoreset key
        # chain: identical seeds -> bitwise-identical batches; with
        # init_pos_jitter/init_rpy_jitter > 0, different seeds -> different
        # initial batches (VERDICT r2 item 7). `seed=None` advances an
        # internal counter starting at 2**31 — deterministic per process
        # (gymnasium's "don't reseed" convention, without aliasing small
        # explicit seeds).
        del options
        if seed is None:
            seed = self._unseeded_count
            self._unseeded_count += 1
        # explicit device_put of the seed scalar keeps reset() inside the
        # transfer-guard contract pinned in tests/test_rl.py
        self._state, obs, self._key = self._jit_reset(
            jax.device_put(np.uint32(seed))
        )
        # explicit device_get: the ONLY device->host transfer of reset()
        # (tests/test_rl.py pins this with jax.transfer_guard)
        return jax.device_get(obs).astype(np.float32), {}

    def step(self, actions):
        if self._state is None:
            raise RuntimeError(
                "JaxVectorEnv.step() called before reset(); call reset() "
                "first to initialize the batched env state."
            )
        # ONE explicit host->device upload (actions) and ONE explicit
        # device->host download (the packed outputs) per step — the
        # single-transfer contract (VALIDATION §5c), pinned by the
        # jax.transfer_guard regression test in tests/test_rl.py
        act = jax.device_put(
            np.reshape(
                np.asarray(actions), (self.num_envs, self._n, self._act_size)
            ).astype(self._template.core.phys.pos.dtype)
        )
        self._state, packed, self._key = self._jit_step(
            self._state, act, self._key
        )
        packed = jax.device_get(packed)
        d = self._obs_dim
        obs_shape = (self.num_envs,) + self.single_observation_space.shape
        obs = packed[:, :d].reshape(obs_shape).astype(np.float32)
        reward = packed[:, 2 * d].astype(np.float32)
        term = packed[:, 2 * d + 1] > 0.5
        trunc = packed[:, 2 * d + 2] > 0.5
        done = term | trunc
        infos = {}
        if done.any():
            fo = packed[:, d:2 * d].reshape(obs_shape).astype(np.float32)
            final = np.full(self.num_envs, None, dtype=object)
            final_info = np.full(self.num_envs, None, dtype=object)
            for i in np.flatnonzero(done):
                final[i] = fo[i]
                final_info[i] = {}
            infos = {
                # gymnasium >= 1.0 spelling
                "final_obs": final, "_final_obs": done,
                "final_info": final_info, "_final_info": done,
                # legacy (gymnasium 0.29 / SB3 VecEnv-era) spelling
                "final_observation": final, "_final_observation": done,
            }
        return obs, reward, term, trunc, infos

    def render(self):  # pragma: no cover - headless container
        return None

    def close_extras(self, **kwargs):
        pass
