"""The examples/custom_env.py tutorial must stay runnable — it is the
documented recipe for building new envs on the framework (BatchedEnv +
stock PPO on a user-defined functional core)."""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)

from custom_env import (  # noqa: E402
    PursuitConfig,
    make_pursuit,
    make_pursuit_batch,
)


def test_pursuit_core_semantics():
    cfg = PursuitConfig(size=7, num_agents=2, max_steps=10)
    reset_one, step_one, encode_one = make_pursuit(cfg)
    s = reset_one(jax.random.PRNGKey(0))
    # Distinct start cells.
    cells = np.concatenate(
        [np.asarray(s.pursuers), np.asarray(s.prey)[None]], axis=0
    )
    assert len({tuple(c) for c in cells}) == 3
    # Stepping with all-stay still moves the scripted prey.
    s2, obs, r, term, trunc, _ = step_one(s, jnp.zeros((2,), jnp.int32))
    assert obs.shape == ((cfg.num_agents + 1) * 2,)
    assert r.shape == (cfg.num_agents,)
    assert np.array_equal(np.asarray(s2.pursuers), np.asarray(s.pursuers))
    # Toroidal wrap: a pursuer at the west edge moving west appears east.
    s_edge = type(s)(
        pursuers=jnp.asarray([[0, 0], [3, 3]], jnp.int32),
        prey=jnp.asarray([5, 5], jnp.int32),
        step_count=jnp.int32(0),
        key=s.key,
    )
    s3, *_ = step_one(s_edge, jnp.asarray([1, 0], jnp.int32))  # west
    assert tuple(np.asarray(s3.pursuers[0])) == (0, cfg.size - 1)
    # Truncation at max_steps.
    for _ in range(cfg.max_steps):
        s, _, _, term, trunc, _ = step_one(s, jnp.zeros((2,), jnp.int32))
        if bool(term) or bool(trunc):
            break
    assert bool(term) or bool(trunc)


def test_pursuit_batch_rollout_and_ppo_step():
    cfg = PursuitConfig(size=7, num_agents=2, max_steps=12)
    env = make_pursuit_batch(cfg, num_envs=32)
    states, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (32, 6)
    states, metrics = env.rollout(states, jax.random.PRNGKey(1), 24)
    assert int(metrics["episodes"]) > 0
    assert np.isfinite(float(metrics["ep_return_sum"]))
    # Determinism: same key, same metrics.
    states2, _ = env.reset(jax.random.PRNGKey(0))
    _, m2 = env.rollout(states2, jax.random.PRNGKey(1), 24)
    assert float(m2["reward_sum"]) == float(metrics["reward_sum"])

    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo

    net = ActorCritic(num_actions=5, num_agents=cfg.num_agents)
    init_fn, train_step = make_ppo(
        env, net, PPOConfig(rollout_len=8, num_minibatches=2)
    )
    params, opt_state, carry = init_fn(jax.random.PRNGKey(2))
    params, opt_state, carry, key, m = train_step(
        params, opt_state, carry, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(m["loss"]))
