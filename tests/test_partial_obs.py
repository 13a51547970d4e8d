"""Batched in-graph partial observations vs the host gen_obs pipeline.

The host path (gym_multigrid_tpu/multigrid.py gen_obs — the FIXED version
of reference multigrid.py:485-545) is the semantics oracle; the batched
jnp pipeline (envs/partial_obs.py) must match it bit-for-bit: view slice
with wall-padding, dir+1 left-rotations, shadow-cast process_vis, masked
3-dim encode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.core.agent import Agent
from gym_multigrid_tpu.core.grid import Grid
from gym_multigrid_tpu.core.object import Ball, Wall
from gym_multigrid_tpu.core.world import CollectWorld
from gym_multigrid_tpu.envs.collect import (
    AGENT,
    BALL,
    WALL,
    WALL_COLOR,
    CollectConfig,
    make_collect,
    make_collect_partial_encode,
)
from gym_multigrid_tpu.envs.partial_obs import make_partial_obs_fn

V = 7


def _host_obs(grid: Grid, agent: Agent) -> np.ndarray:
    """The MultiGridEnv.gen_obs pipeline for one agent (multigrid.py
    gen_obs_grid/gen_obs), without needing a full env object."""
    topX, topY, _, _ = agent.get_view_exts()
    g = grid.slice(topX, topY, agent.view_size, agent.view_size)
    for _ in range(agent.dir + 1):
        g = g.rotate_left()
    vis = g.process_vis(agent_pos=(agent.view_size // 2, agent.view_size - 1))
    return g.encode_for_agents(
        [g.width // 2, g.height - 1], vis
    )


def _host_grid_from_state(cfg, state):
    """Rebuild a host Grid + Agent objects from a functional CollectState."""
    w = h = cfg.size
    grid = Grid(w, h, CollectWorld)
    go = np.asarray(state.grid_obj).reshape(h, w)
    gc = np.asarray(state.grid_color).reshape(h, w)
    for y in range(h):
        for x in range(w):
            if go[y, x] == WALL:
                grid.set(x, y, Wall(CollectWorld))
            elif go[y, x] == BALL:
                grid.set(x, y, Ball(CollectWorld, index=int(gc[y, x])))
    agents = []
    for i, color in enumerate(cfg.agents_index):
        a = Agent(CollectWorld, index=color, view_size=V)
        a.pos = tuple(int(v) for v in np.asarray(state.agent_pos)[i])
        a.dir = 3
        grid.set(a.pos[0], a.pos[1], a)
        agents.append(a)
    return grid, agents


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_collect_partial_obs_matches_host_pipeline(seed):
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    reset_fn, step_fn, _ = make_collect(cfg)
    state = jax.jit(reset_fn)(jax.random.PRNGKey(seed))
    # Advance a few steps so agents sit at generic positions.
    for t in range(5):
        state, *_ = jax.jit(step_fn)(
            state, jnp.asarray([t % 4, (t + 1) % 4])
        )

    encode_partial = jax.jit(make_collect_partial_encode(cfg, V))
    got = np.asarray(encode_partial(state))

    grid, agents = _host_grid_from_state(cfg, state)
    for i, a in enumerate(agents):
        want = _host_obs(grid, a)
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"agent {i} seed {seed}"
        )


def test_all_directions_and_occlusion_match_host():
    """Synthetic 9x9 board with interior walls; all four facings."""
    w = h = 9
    grid = Grid(w, h, CollectWorld)
    grid.wall_rect(0, 0, w, h)
    for x, y in [(3, 3), (4, 3), (5, 5), (2, 6), (6, 2), (4, 6)]:
        grid.set(x, y, Wall(CollectWorld))
    grid.set(2, 2, Ball(CollectWorld, index=0))
    grid.set(6, 6, Ball(CollectWorld, index=2))

    # xy-indexed planes mirroring the host grid.
    obj = np.zeros((w, h), np.int32)
    col = np.zeros((w, h), np.int32)
    for x in range(w):
        for y in range(h):
            c = grid.get(x, y)
            if c is None:
                continue
            obj[x, y] = CollectWorld.OBJECT_TO_IDX[c.type]
            col[x, y] = CollectWorld.COLOR_TO_IDX[c.color]

    a = Agent(CollectWorld, index=1, view_size=V)
    a.pos = (4, 4)
    obj[4, 4] = AGENT
    col[4, 4] = CollectWorld.COLOR_TO_IDX[a.color]
    grid.set(4, 4, a)

    obs_fn = make_partial_obs_fn(w, h, V, wall_encode=(WALL, WALL_COLOR, 0))
    for d in range(4):
        a.dir = d
        ch2 = np.where(obj == AGENT, d, 0)
        planes = jnp.asarray(np.stack([obj, col, ch2]))
        opaque = jnp.asarray(obj == WALL)
        got = np.asarray(
            jax.jit(obs_fn)(
                planes, opaque, jnp.asarray(a.pos), jnp.int32(d)
            )
        )
        want = _host_obs(grid.copy(), a)
        np.testing.assert_array_equal(got, want, err_msg=f"dir {d}")


def test_partial_obs_batched_env_shapes():
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    env = make_collect_batch(cfg, 16, partial_obs_view=V)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (16, cfg.num_agents, V, V, 3)
    assert obs.dtype == jnp.uint8
    states, obs2, rew, term, trunc = jax.jit(env.step)(
        states, jnp.zeros((16, cfg.num_agents), jnp.int32)
    )
    assert obs2.shape == obs.shape
    # Agent always sees itself bottom-center of its own view.
    me = np.asarray(obs2)[:, :, V // 2, V - 1, 0]
    assert (me == AGENT).all()
