"""Actor-critic policy network (flax).

Mirrors the reference's learner capacity: SB3 ``PPO('MlpPolicy', ...)``
(reference examples/learn.py:72-75) — a flatten extractor with separate
64-64 tanh towers for policy and value, a Gaussian head with
state-independent log-std initialized to 0, and orthogonal init scaling
(pi head 0.01, vf head 1.0). Kept deliberately MLP-small: the FLOPs live in
the batched env, the learner matmuls batch thousands of envs so they land on
the MXU.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class ActorCritic(nn.Module):
    """Separate pi/vf towers + Gaussian actor head (SB3 MlpPolicy layout)."""

    act_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        ortho = nn.initializers.orthogonal
        x = obs
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h, kernel_init=ortho(np.sqrt(2)))(x))
        mean = nn.Dense(self.act_dim, kernel_init=ortho(0.01))(x)

        v = obs
        for h in self.hidden:
            v = nn.tanh(nn.Dense(h, kernel_init=ortho(np.sqrt(2)))(v))
        value = nn.Dense(1, kernel_init=ortho(1.0))(v)

        # explicit f32: initializers.zeros defaults to float64 under
        # jax_enable_x64, silently promoting sampled actions
        log_std = self.param(
            "log_std", lambda _, s: jnp.zeros(s, jnp.float32),
            (self.act_dim,),
        )
        return mean, log_std, jnp.squeeze(value, axis=-1)


class CnnActorCritic(nn.Module):
    """Pixel actor-critic: shared conv extractor + Gaussian/value heads.

    The RGB analog of :class:`ActorCritic` (SB3 ``CnnPolicy`` layout:
    shared NatureCNN-style features, heads straight off the embedding),
    scaled to the drone camera's small frames. Consumes the FLAT pixel
    observation vector the RGB env adapters emit (values in [0, 1]) and
    reshapes internally, so the PPO core is identical for pixels and
    state vectors. Convs run channels-last on the MXU.
    """

    act_dim: int
    img_h: int = 24
    img_w: int = 32
    img_c: int = 3
    features: int = 256

    @nn.compact
    def __call__(self, obs):
        ortho = nn.initializers.orthogonal
        x = obs.reshape(obs.shape[:-1] + (self.img_h, self.img_w, self.img_c))
        for ch, k, s in ((16, 5, 2), (32, 3, 2), (64, 3, 2)):
            x = nn.relu(
                nn.Conv(ch, (k, k), strides=(s, s), padding="SAME",
                        kernel_init=ortho(np.sqrt(2)))(x)
            )
        x = x.reshape(x.shape[:-3] + (-1,))
        feat = nn.relu(
            nn.Dense(self.features, kernel_init=ortho(np.sqrt(2)))(x)
        )
        mean = nn.Dense(self.act_dim, kernel_init=ortho(0.01))(feat)
        value = nn.Dense(1, kernel_init=ortho(1.0))(feat)
        # explicit f32: initializers.zeros defaults to float64 under
        # jax_enable_x64, silently promoting sampled actions
        log_std = self.param(
            "log_std", lambda _, s: jnp.zeros(s, jnp.float32),
            (self.act_dim,),
        )
        return mean, log_std, jnp.squeeze(value, axis=-1)


def sample_action(rng, mean, log_std):
    std = jnp.exp(log_std)
    noise = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    action = mean + std * noise
    return action, gaussian_logp(action, mean, log_std)


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    logp = -0.5 * (((action - mean) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
    return jnp.sum(logp, axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
