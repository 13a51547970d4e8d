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


class ConvActorCritic(nn.Module):
    """Conv actor-critic over 2-D grid observations.

    Takes either an integer class map (B, H, W) — e.g. the CtF/Maze
    "map" observation option (envs/ctf.py encode_map) — which is one-hot
    embedded into ``num_classes`` channels, or an already-multichannel
    grid (B, H, W, C) like the Collect full-grid encoding.  The conv
    torso keeps spatial structure the MLP flattens away and runs as
    bf16 convolutions on the MXU; heads match ``ActorCritic`` (one
    categorical per agent + scalar value), so it drops into the same
    PPO/self-play learners unchanged.
    """

    num_actions: int
    num_agents: int = 2
    num_classes: int = 8
    features: Sequence[int] = (32, 64)
    hidden: int = 256
    activation_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array):
        if obs.ndim == 3:
            x = jax.nn.one_hot(
                obs.astype(jnp.int32), self.num_classes,
                dtype=self.activation_dtype,
            )
        elif obs.ndim == 4:
            x = obs.astype(self.activation_dtype) / 10.0
        else:
            raise ValueError(
                f"ConvActorCritic expects (B, H, W) or (B, H, W, C) "
                f"observations, got shape {obs.shape}"
            )
        for f in self.features:
            x = nn.Conv(f, (3, 3), dtype=self.activation_dtype)(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.hidden, dtype=self.activation_dtype)(x)
        x = nn.tanh(x)
        logits = nn.Dense(
            self.num_agents * self.num_actions, dtype=jnp.float32
        )(x)
        logits = logits.reshape(
            (obs.shape[0], self.num_agents, self.num_actions)
        )
        value = nn.Dense(1, dtype=jnp.float32)(x).squeeze(-1)
        return logits, value


def sample_actions(key: jax.Array, logits: jax.Array):
    """Sample per-agent actions + joint logprob from (B, A, num_actions).

    The chosen logprob is ``logit[action] - logsumexp(logits)`` — same
    value as gathering from log_softmax without materializing the full
    (B, A, num_actions) log-probability tensor (that fusion was 9-12% of
    PPO train-step device time at 1M envs, artifacts/sol_report.json
    ppo_train)."""
    actions = jax.random.categorical(key, logits, axis=-1)
    chosen = jnp.take_along_axis(
        logits, actions[..., None], axis=-1
    ).squeeze(-1)
    logp = chosen - jax.scipy.special.logsumexp(logits, axis=-1)
    return actions.astype(jnp.int32), logp.sum(axis=-1)
