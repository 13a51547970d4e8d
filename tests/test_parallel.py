"""Parallel layer tests: vmapped batches, auto-reset, scan rollouts, and
mesh-sharded execution on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
from gym_multigrid_tpu.envs.maze import MazeConfig
from gym_multigrid_tpu.envs.wildfire import WildfireConfig
from gym_multigrid_tpu.parallel.mesh import (
    batch_tree_shardings,
    make_mesh,
    shard_batch_tree,
)
from gym_multigrid_tpu.parallel.vector import (
    make_collect_batch,
    make_ctf_batch,
    make_maze_batch,
    make_wildfire_batch,
)

MAP_PATH = "tests/assets/board.txt"
MAZE_PATH = "tests/assets/board_maze.txt"


def _ctf_cfg():
    return CtfConfig.from_map_path(
        MAP_PATH,
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("fight"), PolicySpec("rw")),
        observation_option="flattened",
    )


@pytest.mark.parametrize(
    "make,cfg,actions_shape,num_actions",
    [
        (make_collect_batch, CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50), (2,), 4),
        (make_ctf_batch, "ctf", (2,), 5),
        (make_maze_batch, MazeConfig.from_map_path(MAZE_PATH, max_steps=30), (), 5),
        (make_wildfire_batch, WildfireConfig(size=8, max_steps=30), (2,), 5),
    ],
)
def test_batched_rollout(make, cfg, actions_shape, num_actions):
    if cfg == "ctf":
        cfg = _ctf_cfg()
    env = make(cfg, num_envs=16)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_leaves(states)[0].shape[0] == 16

    run = jax.jit(
        lambda s, k: env.rollout(
            s, k, 60, num_actions=num_actions, actions_shape=actions_shape
        )
    )
    states, metrics = run(states, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["reward_sum"]))
    # 60 steps x 16 envs with <=50-step caps must finish episodes
    assert int(metrics["episodes"]) > 0


def test_batch_determinism():
    cfg = CollectConfig(layout="quadrants", max_steps=20)
    env = make_collect_batch(cfg, num_envs=8)

    def run():
        states, obs = env.reset(jax.random.PRNGKey(5))
        states, metrics = env.rollout(
            states, jax.random.PRNGKey(6), 20, num_actions=4, actions_shape=(2,)
        )
        return obs, metrics

    o1, m1 = jax.jit(run)()
    o2, m2 = jax.jit(run)()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(m1["reward_sum"]) == float(m2["reward_sum"])


def test_auto_reset_produces_fresh_episodes():
    cfg = CollectConfig(layout="even", max_steps=5)
    env = make_collect_batch(cfg, num_envs=4, auto_reset=True)
    states, _ = env.reset(jax.random.PRNGKey(0))
    for _ in range(5):
        actions = jnp.zeros((4, 2), dtype=jnp.int32)
        states, obs, rew, term, trunc = jax.jit(env.step)(states, actions)
    # The 5th step truncates every env; auto-reset must zero step_count.
    assert bool(trunc.all())
    assert int(jnp.max(states.step_count)) == 0


def test_sharded_rollout_on_mesh():
    """Env batch sharded over the 'data' axis of an 8-device mesh; the whole
    rollout executes under jit with GSPMD-partitioned state."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8, model_parallel=1)
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    env = make_collect_batch(cfg, num_envs=64)

    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    states = shard_batch_tree(states, mesh)
    sh = jax.tree_util.tree_leaves(states)[0].sharding
    assert not sh.is_fully_replicated

    s_shard = batch_tree_shardings(states, mesh)
    run = jax.jit(
        lambda s, k: env.rollout(s, k, 16, num_actions=4, actions_shape=(2,)),
        in_shardings=(s_shard, None),
    )
    states2, metrics = run(states, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["reward_sum"]))
    # State stays sharded across the mesh after the rollout.
    sh2 = jax.tree_util.tree_leaves(states2)[0].sharding
    assert not sh2.is_fully_replicated
