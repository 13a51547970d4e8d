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


def test_episode_returns_fixed_horizon_aligned():
    """On a fixed-horizon config with the rollout aligned to episode
    boundaries, every reward belongs to a completed episode: episodes =
    num_envs * (steps / max_steps) exactly and ep_return_sum == reward_sum
    (SURVEY.md §7 hard-parts bullet: metrics across the auto-reset)."""
    cfg = CollectConfig(layout="rooms", fixed_horizon=True, max_steps=10)
    env = make_collect_batch(cfg, num_envs=8)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    run = jax.jit(lambda s, k: env.rollout(s, k, 30))
    states, metrics = run(states, jax.random.PRNGKey(1))
    assert int(metrics["episodes"]) == 8 * 3
    np.testing.assert_allclose(
        float(metrics["ep_return_sum"]), float(metrics["reward_sum"]), rtol=1e-5
    )
    # All episodes completed at the call boundary -> no return in flight.
    np.testing.assert_allclose(np.asarray(metrics["run_return"]), 0.0, atol=1e-6)


def test_episode_returns_match_stepwise_oracle():
    """ep_return_sum/episodes from the scanned rollout must equal a
    step-by-step host loop replaying the same key stream (exact, including
    episodes that end mid-call on a terminating config)."""
    cfg = CollectConfig(layout="quadrants", max_steps=15)
    env = make_collect_batch(cfg, num_envs=6)
    states0, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))

    num_steps = 40
    states, metrics = jax.jit(lambda s, k: env.rollout(s, k, num_steps))(
        states0, jax.random.PRNGKey(3)
    )

    # Oracle: identical loop, un-scanned.
    key = jax.random.PRNGKey(3)
    st = states0
    run_ret = np.zeros(6, np.float32)
    exp_sum, exp_count, exp_reward = 0.0, 0, 0.0
    step = jax.jit(env.step)
    for _ in range(num_steps):
        key, k_act = jax.random.split(key)
        actions = jax.random.randint(k_act, (6, 2), 0, 4)
        st, obs, rew, term, trunc = step(st, actions)
        team = np.asarray(rew).sum(axis=-1)
        done = np.asarray(term | trunc)
        run_ret += team
        exp_reward += float(np.asarray(rew).sum())
        exp_sum += float(run_ret[done].sum())
        exp_count += int(done.sum())
        run_ret[done] = 0.0

    assert int(metrics["episodes"]) == exp_count
    np.testing.assert_allclose(float(metrics["ep_return_sum"]), exp_sum, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["reward_sum"]), exp_reward, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(metrics["run_return"]), run_ret, rtol=1e-5
    )


def test_episode_returns_carry_across_calls():
    """Feeding run_return back in makes split rollouts equal one long one."""
    cfg = CollectConfig(layout="rooms", fixed_horizon=True, max_steps=10)
    env = make_collect_batch(cfg, num_envs=4)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(4))

    # One 15-step call: episode 1 completes at t=10, 5 steps in flight.
    s_a, m_a = jax.jit(lambda s, k: env.rollout(s, k, 15))(
        states, jax.random.PRNGKey(5)
    )
    # Continue 5 more steps, carrying the in-flight returns: the second
    # episode completes; totals must account for every reward exactly once.
    s_b, m_b = jax.jit(lambda s, k, rr: env.rollout(s, k, 5, run_return=rr))(
        s_a, jax.random.PRNGKey(6), m_a["run_return"]
    )
    total_eps = int(m_a["episodes"]) + int(m_b["episodes"])
    assert total_eps == 4 * 2
    total_ep_ret = float(m_a["ep_return_sum"]) + float(m_b["ep_return_sum"])
    total_reward = float(m_a["reward_sum"]) + float(m_b["reward_sum"])
    np.testing.assert_allclose(total_ep_ret, total_reward, rtol=1e-5)


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


def test_batched_step_rejects_wrong_batch_size():
    import pytest

    from gym_multigrid_tpu.envs.collect import CollectConfig
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    env = make_collect_batch(CollectConfig(layout="quadrants"), 4)
    states, _ = env.reset(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="batched over 4 envs"):
        env.step(states, jnp.zeros((8, 2), jnp.int32))


def test_param_tp_shardings_dense_and_conv():
    """Dense (in, out) and Conv (kh, kw, cin, cout) kernels both shard
    their output dim over 'model'; biases/scalars replicate; the jitted
    forward runs with the sharded params (parallel/mesh.py)."""
    from gym_multigrid_tpu.parallel.mesh import make_mesh, param_tp_shardings
    from gym_multigrid_tpu.rl.networks import ConvActorCritic

    mesh = make_mesh(8, model_parallel=2)
    net = ConvActorCritic(num_actions=5, num_agents=2, features=(8, 16),
                          hidden=32)
    obs = jnp.zeros((4, 10, 10), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), obs)
    shardings = param_tp_shardings(params, mesh)

    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(shardings))
    saw_conv = saw_dense = False
    for path, leaf in flat_p:
        spec = flat_s[tuple(path)].spec
        if leaf.ndim == 4:  # conv kernel
            saw_conv = True
            assert spec[-1] == "model", path
        elif leaf.ndim == 2 and leaf.shape[-1] % 2 == 0:
            saw_dense = True
            assert spec[-1] == "model", path
        else:
            assert all(s is None for s in spec), path
    assert saw_conv and saw_dense

    params = jax.device_put(params, shardings)
    logits, value = jax.jit(net.apply)(params, obs)
    assert logits.shape == (4, 2, 5)
    assert np.isfinite(np.asarray(value)).all()
