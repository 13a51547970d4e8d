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
