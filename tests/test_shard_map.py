"""Explicit shard_map rollout over the 8-device virtual mesh."""

import numpy as np
import jax
import pytest

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.parallel.mesh import make_mesh, shard_batch_tree
from gym_multigrid_tpu.parallel.shard import sharded_rollout
from gym_multigrid_tpu.parallel.vector import make_collect_batch


def test_shard_map_rollout_matches_devices():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_parallel=1)
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    env = make_collect_batch(cfg, num_envs=64)

    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    states = shard_batch_tree(states, mesh)

    rollout = sharded_rollout(env, mesh, num_actions=4, actions_shape=(2,))
    run = jax.jit(lambda s, k: rollout(s, k, 32))
    states2, metrics = run(states, jax.random.PRNGKey(1))

    # Metrics are psum-reduced -> finite scalars covering the global batch.
    assert np.isfinite(float(metrics["reward_sum"]))
    assert float(metrics["reward_sum"]) > 0
    # State stays sharded.
    assert not jax.tree_util.tree_leaves(states2)[0].sharding.is_fully_replicated

    # Determinism under the explicit-collective path.
    states3, metrics3 = run(states, jax.random.PRNGKey(1))
    assert float(metrics["reward_sum"]) == float(metrics3["reward_sum"])


def test_shard_map_rollout_matches_unsharded_distribution():
    """The sharded rollout must agree with the plain vmapped rollout
    distributionally: same per-step reward rate and episode-return mean
    within sampling noise (RNG streams differ by design — per-shard
    fold_in — so the comparison is statistical, not bitwise).  A sharding
    bug that skewed rewards or dropped shard contributions would fail."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_parallel=1)
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    num_envs, steps = 256, 100
    env = make_collect_batch(cfg, num_envs=num_envs)

    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))

    # Unsharded: single-device vmapped rollout.
    un_states, un_metrics = jax.jit(lambda s, k: env.rollout(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    # Sharded: same batch split over 8 shards with explicit collectives.
    sh_states_in = shard_batch_tree(states, mesh)
    rollout = sharded_rollout(env, mesh, num_actions=4, actions_shape=(2,))
    sh_states, sh_metrics = jax.jit(lambda s, k: rollout(s, k, steps))(
        sh_states_in, jax.random.PRNGKey(1)
    )

    n = num_envs * steps
    un_rate = float(un_metrics["reward_sum"]) / n
    sh_rate = float(sh_metrics["reward_sum"]) / n
    assert un_rate > 0 and sh_rate > 0
    # 25,600 random-policy samples: rates agree well within 15%.
    assert abs(un_rate - sh_rate) / un_rate < 0.15
    # Episode accounting covers the global batch on both paths (50-step
    # truncation, 100 steps -> exactly 2 episodes per env).
    assert int(un_metrics["episodes"]) == num_envs * 2
    assert int(sh_metrics["episodes"]) == num_envs * 2
    un_ep = float(un_metrics["ep_return_sum"]) / int(un_metrics["episodes"])
    sh_ep = float(sh_metrics["ep_return_sum"]) / int(sh_metrics["episodes"])
    assert abs(un_ep - sh_ep) / abs(un_ep) < 0.15
