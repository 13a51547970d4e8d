"""Maze Pallas kernels vs their pure-jax specs (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_multigrid_tpu.envs.maze import (
    MazeConfig,
    make_maze_step_batch,
    maze_reset_math,
    maze_static_inputs,
    maze_step_math,
    maze_tables,
)
from gym_multigrid_tpu.ops.pallas_maze import (
    MS_STRIDE,
    _maze_ms_math,
    make_maze_episode_rollout,
    maze_step_slab,
)
from gym_multigrid_tpu.parallel.vector import make_maze_batch

CFG = MazeConfig.from_map_path("tests/assets/board_maze.txt", max_steps=25)


def test_maze_step_kernel_matches_spec():
    t = maze_tables(CFG)
    cells, bg = maze_static_inputs(CFG)
    B = 32
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.integers(0, 13, size=(B, 2)), jnp.int32)
    dirs = jnp.full((B, 1), 3, jnp.int32)
    acts = jnp.asarray(rng.integers(0, 5, size=(B, 1)), jnp.int32)

    spec = maze_step_math(t, pos, dirs, acts, cells)
    kern = maze_step_slab(t, pos, dirs, acts, cells, True)
    for s, k in zip(spec, kern):
        s, k = np.asarray(s), np.asarray(k)
        if np.issubdtype(s.dtype, np.integer):
            np.testing.assert_array_equal(s, k)
        else:
            np.testing.assert_allclose(s, k, rtol=1e-6, atol=1e-6)


def test_maze_multistep_math_matches_repeated_single_steps():
    """The K-step episode math must equal K manual applications of the
    single-step spec + the auto-reset selects on the same draws.
    (Through round 4 this pinned the multi-step episode kernel, pruned
    after the round-5 slab-width sweep — artifacts/kernel_vs_xla.md.)"""
    from gym_multigrid_tpu.envs.maze import maze_reset_math

    t = maze_tables(CFG)
    cells, bg = maze_static_inputs(CFG)
    B, K = 16, 6
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.integers(0, 13, size=(B, 2)), jnp.int32)
    dirs = jnp.full((B, 1), 3, jnp.int32)
    sc = jnp.asarray(rng.integers(0, 25, size=(B, 1)), jnp.int32)
    run_ret = jnp.zeros((B, 1), jnp.float32)
    packed = jnp.asarray(rng.random((B, K * MS_STRIDE)), jnp.float32)
    for k in range(K):
        packed = packed.at[:, k * MS_STRIDE].multiply(5.0)

    got = _maze_ms_math(t, K, pos, dirs, sc, run_ret, packed, cells, bg)

    # independent oracle: unrolled single steps + reset selects
    w_pos, w_dirs, w_sc, w_run = pos, dirs, sc, run_ret
    w_rew = jnp.zeros((B, 1), jnp.float32)
    w_ep = jnp.zeros((B, 1), jnp.float32)
    w_eps = jnp.zeros((B, 1), jnp.int32)
    for k in range(K):
        base = k * MS_STRIDE
        acts = packed[:, base : base + 1].astype(jnp.int32)
        rnd_reset = packed[:, base + 1 : base + 2]
        p2, d2, reward, term = maze_step_math(t, w_pos, w_dirs, acts, cells)
        sc2 = w_sc + 1
        done = (term == 1) | (sc2 >= t.max_steps)
        run2 = w_run + reward
        w_rew = w_rew + reward
        w_ep = w_ep + jnp.where(done, run2, 0.0)
        w_eps = w_eps + done.astype(jnp.int32)
        w_run = jnp.where(done, 0.0, run2)
        rpos, rdirs = maze_reset_math(t, rnd_reset, bg)
        w_pos = jnp.where(done, rpos, p2)
        w_dirs = jnp.where(done, rdirs, d2)
        w_sc = jnp.where(done, 0, sc2)
    want = (w_pos, w_dirs, w_sc, w_run, w_rew, w_ep, w_eps)

    for s, k in zip(want, got):
        s, k = np.asarray(s), np.asarray(k)
        if np.issubdtype(s.dtype, np.integer):
            np.testing.assert_array_equal(s, k)
        else:
            np.testing.assert_allclose(s, k, rtol=1e-6, atol=1e-5)


def test_maze_step_batch_matches_vmapped_core():
    """The slab step and vmap(step_fn) share semantics: same positions,
    rewards and termination from the same start (the slab path draws no
    step randomness, so this is exact)."""
    env_v = make_maze_batch(CFG, 16)
    states, _ = jax.jit(env_v.reset)(jax.random.PRNGKey(2))
    acts = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 5)

    import dataclasses

    sb = make_maze_step_batch(CFG, use_pallas=False)
    s1, o1, r1, t1, u1, _ = sb(states, acts)

    from gym_multigrid_tpu.envs.maze import make_maze

    fns = make_maze(CFG)
    s2, o2, r2, t2, u2, _ = jax.vmap(
        lambda s, a: fns.step_fn(s, a.reshape(()))
    )(states, acts)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_maze_episode_rollout_invariants():
    env = make_maze_batch(CFG, 8)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(4))
    rollout = make_maze_episode_rollout(CFG, chunk=10)
    states, m = rollout(states, jax.random.PRNGKey(5), 50)
    assert int(m["episodes"]) >= 8  # 25-step cap, 50 steps
    assert np.isfinite(float(m["reward_sum"]))
    pos = np.asarray(states.pos)
    assert pos.min() >= 0 and pos.max() < 13
    assert int(np.asarray(states.step_count).max()) < CFG.max_steps
