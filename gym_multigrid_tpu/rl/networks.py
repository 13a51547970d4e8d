"""Actor-critic networks for the PPO learner (flax.linen).

Replaces the reference's SB3 MlpPolicy dependency
(scripts/main_mvn_ctf_rl.py:30-34) with a TPU-friendly network: matmul-heavy
MLP torso, bfloat16 activations on the MXU, f32 params/outputs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """MLP actor-critic over flattened grid observations.

    One categorical head per agent (MultiDiscrete action space like the
    reference MvN env, ctf.py:842-845) plus a scalar value head.
    """

    num_actions: int
    num_agents: int = 2
    hidden: Sequence[int] = (256, 256)
    activation_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array):
        x = obs.reshape((obs.shape[0], -1)).astype(self.activation_dtype)
        # Normalize uint8-ish encodings into a sane range.
        x = x / 10.0
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.activation_dtype)(x)
            x = nn.tanh(x)
        logits = nn.Dense(self.num_agents * self.num_actions, dtype=jnp.float32)(x)
        logits = logits.reshape((obs.shape[0], self.num_agents, self.num_actions))
        value = nn.Dense(1, dtype=jnp.float32)(x).squeeze(-1)
        return logits, value


def sample_actions(key: jax.Array, logits: jax.Array):
    """Sample per-agent actions + joint logprob from (B, A, num_actions)."""
    actions = jax.random.categorical(key, logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(logp, actions[..., None], axis=-1).squeeze(-1)
    return actions.astype(jnp.int32), chosen.sum(axis=-1)
