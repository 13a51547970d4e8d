"""Build-your-own environment, the TPU-first way — a worked example.

The reference package's extension point is subclassing ``MultiGridEnv``
(that route exists here too — ``gym_multigrid_tpu.multigrid`` — and is
covered in docs/MIGRATION.md).  This example shows the route the four
built-in families use instead, the one that runs at 10^8 agent-steps/s:

  1. a frozen, hashable **config** dataclass (everything static bakes
     into the compiled program),
  2. an **EnvState** pytree of small int/float arrays (no Python objects
     anywhere in the hot path),
  3. pure ``reset``/``step`` functions built by a ``make_*`` factory
     that closes over precomputed constants,
  4. a **BatchedEnv** wrapper (``parallel.vector``) that vmaps the core,
     fuses auto-reset in-graph, and scans whole rollouts,
  5. the stock PPO learner (``rl.ppo``) on top — nothing else needed.

The env itself — **Pursuit** — is deliberately small: A pursuers chase
one scripted prey on a toroidal W×W grid.  The prey flees the nearest
pursuer (an in-graph scripted opponent, the same pattern CtF uses for
its red team, envs/ctf.py ``_build_red_policy``).  Pursuers are rewarded
for being adjacent to the prey; the episode ends when the prey is
cornered (2+ adjacent pursuers).

Run it:

    python examples/custom_env.py            # rollout + a few PPO iters

Scaling it up needs no new code: ``BatchedEnv.rollout`` is one
``lax.scan``, the batch axis shards over a ``jax.sharding.Mesh`` exactly
like the built-in families (parallel/shard.py), and if a profile ever
shows the step dominating, rewrite it over ``(B, ...)`` slabs and drop
it in as ``step_batch=`` — see docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp

# Repo-root import (there is no installed package).
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# stay / west / south / east / north — same action vocabulary as CtF
# (reference agent.py:54-67); reuse keeps the example's action space
# familiar to reference users.
ACTION_VEC = jnp.asarray(
    [[0, 0], [0, -1], [-1, 0], [0, 1], [1, 0]], dtype=jnp.int32
)


@dataclass(frozen=True)
class PursuitConfig:
    size: int = 9
    num_agents: int = 3
    max_steps: int = 60
    tag_reward: float = 0.25
    corner_reward: float = 1.0
    step_penalty: float = 0.01


@jax.tree_util.register_dataclass
@dataclass
class PursuitState:
    pursuers: jax.Array  # (A, 2) int32
    prey: jax.Array  # (2,) int32
    step_count: jax.Array  # () int32
    key: jax.Array  # consumed by BatchedEnv's in-graph auto-reset


def make_pursuit(cfg: PursuitConfig):
    """Returns (reset_one, step_one, encode_one) pure functions."""
    W, A = cfg.size, cfg.num_agents

    def _torus_delta(a, b):
        # Signed shortest displacement a->b on the torus, per axis.
        d = (b - a + W // 2) % W - W // 2
        return d

    def reset_one(key: jax.Array) -> PursuitState:
        k_p, k_q, k_next = jax.random.split(key, 3)
        # Distinct start cells via a permutation of the flat board —
        # rejection-free placement (contrast the reference's Python
        # rejection sampling, multigrid.py:282-339).
        cells = jax.random.permutation(k_p, W * W)[: A + 1]
        pos = jnp.stack([cells // W, cells % W], axis=1).astype(jnp.int32)
        return PursuitState(
            pursuers=pos[:A],
            prey=pos[A],
            step_count=jnp.int32(0),
            key=k_next,
        )

    def _prey_policy(state: PursuitState) -> jax.Array:
        # Scripted opponent IN-GRAPH: flee the nearest pursuer.  Pick the
        # action maximizing the new toroidal L1 distance to it (argmax
        # over the 5 candidate moves — compiler-friendly, no host).
        d = _torus_delta(state.prey[None, :], state.pursuers)  # (A, 2)
        dist = jnp.abs(d).sum(axis=1)
        nearest = state.pursuers[jnp.argmin(dist)]
        cand = (state.prey[None, :] + ACTION_VEC) % W  # (5, 2)
        cand_d = jnp.abs(_torus_delta(cand, nearest[None, :])).sum(axis=1)
        return jnp.argmax(cand_d)  # ties -> lowest action id, deterministic

    def step_one(state: PursuitState, actions: jax.Array):
        acts = jnp.clip(actions.astype(jnp.int32), 0, 4)
        pursuers = (state.pursuers + ACTION_VEC[acts]) % W
        prey = (state.prey + ACTION_VEC[_prey_policy(state)]) % W

        d = jnp.abs(_torus_delta(pursuers, prey[None, :])).sum(axis=1)
        adjacent = d == 1  # (A,)
        cornered = adjacent.sum() >= 2
        # Per-agent rewards, like Collect — BatchedEnv/PPO sum them into
        # a team reward.
        rewards = (
            cfg.tag_reward * adjacent.astype(jnp.float32)
            + cfg.corner_reward * cornered * adjacent.astype(jnp.float32)
            - cfg.step_penalty
        )
        step_count = state.step_count + 1
        terminated = cornered
        truncated = (step_count >= cfg.max_steps) & ~terminated
        new_state = PursuitState(
            pursuers=pursuers,
            prey=prey,
            step_count=step_count,
            key=state.key,
        )
        obs = encode_one(new_state)
        return new_state, obs, rewards, terminated, truncated, {}

    def encode_one(state: PursuitState) -> jax.Array:
        # Flat normalized positions — the "flattened" observation style
        # (CtF's observation_option="flattened").  (A+1)*2 floats.
        flat = jnp.concatenate(
            [state.pursuers.reshape(-1), state.prey]
        ).astype(jnp.float32)
        return flat / (W - 1)

    return reset_one, step_one, encode_one


def make_pursuit_batch(cfg: PursuitConfig, num_envs: int):
    from gym_multigrid_tpu.parallel.vector import BatchedEnv

    reset_one, step_one, encode_one = make_pursuit(cfg)
    return BatchedEnv(
        reset_one=reset_one,
        step_one=step_one,
        encode_one=encode_one,
        num_envs=num_envs,
        num_actions=5,
        actions_shape=(cfg.num_agents,),
    )


def main() -> None:
    jax.config.update("jax_platforms", "cpu")  # demo-sized; run anywhere
    cfg = PursuitConfig()
    env = make_pursuit_batch(cfg, num_envs=256)

    # 1. Random rollout through the stock scan (auto-reset + episode
    #    metrics come for free).
    states, obs = env.reset(jax.random.PRNGKey(0))
    states, metrics = jax.jit(
        lambda s, k: env.rollout(s, k, 120)
    )(states, jax.random.PRNGKey(1))
    random_ret = float(metrics["ep_return_sum"]) / max(
        1, int(metrics["episodes"])
    )
    print(
        f"random policy: {int(metrics['episodes'])} episodes, "
        f"mean return {random_ret:+.3f}"
    )

    # 2. The stock PPO learner on the custom env — unchanged.
    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo

    net = ActorCritic(num_actions=5, num_agents=cfg.num_agents)
    init_fn, train_step = make_ppo(
        env, net, PPOConfig(rollout_len=32, num_minibatches=4)
    )
    # make_ppo returns a pure function — jit it yourself (donation lets
    # XLA update the optimizer state in place).  The shared trainer
    # (rl/trainer.py train_loop) does this, plus logging/resume, for you.
    step = jax.jit(train_step, donate_argnums=(1, 2))
    params, opt_state, carry = init_fn(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    for it in range(60):
        params, opt_state, carry, key, m = step(
            params, opt_state, carry, key
        )
        if it % 10 == 9:
            ep = float(m["ep_return_mean"])
            print(f"iter {it + 1:3d}  ep_return {ep:+.3f}")
    final_ret = float(m["ep_return_mean"])
    print(
        f"PPO after 60 iters: {final_ret:+.3f} "
        f"(random baseline {random_ret:+.3f})"
    )


if __name__ == "__main__":
    main()
