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


# ---------------------------------------------------------------------------
# CtF and Maze families (round 4): the same bit-exact differential against
# the host gen_obs pipeline.  Host grids are painted exactly as the
# reference _gen_grid does (ctf.py:279-323, maze.py:182-197); out-of-bounds
# view cells use the wall-less worlds' boundary rule (sight-blocking grey
# Obstacle — core/grid.py slice docstring).
# ---------------------------------------------------------------------------

import os

from gym_multigrid_tpu.core.object import Flag, Floor, Obstacle
from gym_multigrid_tpu.core.world import CtfWorld, MazeWorld

TESTS = os.path.dirname(os.path.abspath(__file__))


def _host_obs_stw(grid: Grid, agent: Agent, see_through: bool) -> np.ndarray:
    """_host_obs with the MultiGridEnv.see_through_walls switch."""
    topX, topY, _, _ = agent.get_view_exts()
    g = grid.slice(topX, topY, agent.view_size, agent.view_size)
    for _ in range(agent.dir + 1):
        g = g.rotate_left()
    if see_through:
        vis = np.ones((g.width, g.height), dtype=bool)
    else:
        vis = g.process_vis(
            agent_pos=(agent.view_size // 2, agent.view_size - 1)
        )
    return g.encode_for_agents([g.width // 2, g.height - 1], vis)


def _ctf_host_grid(cfg, state, view_size):
    from gym_multigrid_tpu.envs.ctf import build_tables

    t = build_tables(cfg)
    W, H = t.fm.shape
    grid = Grid(W, H, CtfWorld)
    for (i, j) in t.blue_territory:
        grid.set(i, j, Floor(CtfWorld, color="light_blue",
                             type="blue_territory"))
    for (i, j) in t.red_territory:
        grid.set(i, j, Floor(CtfWorld, color="light_red",
                             type="red_territory"))
    for (i, j) in t.obstacle.reshape(-1, 2):
        grid.set(i, j, Obstacle(CtfWorld))
    grid.set(*t.blue_flag, Flag(CtfWorld, index=0, color="blue",
                                type="blue_flag", bg_color="light_blue"))
    grid.set(*t.red_flag, Flag(CtfWorld, index=1, color="red",
                               type="red_flag", bg_color="light_red"))
    agents = []
    n_blue = cfg.num_blue_agents
    pos = np.asarray(state.pos)
    dirs = np.asarray(state.dir)
    term = np.asarray(state.terminated)
    for a in range(cfg.num_agents):
        is_blue = a < n_blue
        ag = Agent(
            CtfWorld,
            index=0 if is_blue else 1,
            view_size=view_size,
            color="blue" if is_blue else "red",
            type="blue_agent" if is_blue else "red_agent",
        )
        if bool(term[a]):
            ag.color = "blue_grey" if is_blue else "red_grey"
        ag.pos = (int(pos[a, 0]), int(pos[a, 1]))
        ag.dir = int(dirs[a])
        grid.set(ag.pos[0], ag.pos[1], ag)
        agents.append(ag)
    return grid, agents


@pytest.mark.parametrize("seed", [0, 3])
def test_ctf_partial_obs_matches_host_pipeline(seed):
    from gym_multigrid_tpu.envs.ctf import (
        CtfConfig,
        PolicySpec,
        make_ctf,
        make_ctf_partial_encode,
    )

    cfg = CtfConfig.from_map_path(
        os.path.join(TESTS, "assets/board.txt"),
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("fight"), PolicySpec("rw")),
        observation_option="flattened",
    )
    fns = make_ctf(cfg)
    state = jax.jit(fns.reset_fn)(jax.random.PRNGKey(seed))
    step = jax.jit(fns.step_fn)
    for t_i in range(6):
        state, *_ = step(state, jnp.asarray([t_i % 5, (t_i + 2) % 5]))

    encode_partial = jax.jit(make_ctf_partial_encode(cfg, V))
    got = np.asarray(encode_partial(state))

    grid, agents = _ctf_host_grid(cfg, state, V)
    for i, a in enumerate(agents):
        want = _host_obs_stw(grid, a, see_through=False)
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"agent {i} seed {seed}"
        )


def _maze_host_grid(cfg, state, view_size):
    fm = cfg.field_map
    from gym_multigrid_tpu.envs.maze import BACKGROUND, FLAG, M_OBSTACLE

    W, H = fm.shape
    grid = Grid(W, H, MazeWorld)
    flag_idx = 0
    for i in range(W):
        for j in range(H):
            if fm[i, j] == BACKGROUND:
                grid.set(i, j, Floor(MazeWorld, color="white",
                                     type="background"))
            elif fm[i, j] == M_OBSTACLE:
                grid.set(i, j, Obstacle(MazeWorld,
                                        penalty=cfg.obstacle_penalty))
            elif fm[i, j] == FLAG:
                grid.set(i, j, Flag(MazeWorld, index=flag_idx, color="red",
                                    bg_color="white"))
                flag_idx += 1
    ag = Agent(MazeWorld, index=0, view_size=view_size, color="blue",
               type="agent")
    pos = np.asarray(state.pos)
    ag.pos = (int(pos[0]), int(pos[1]))
    ag.dir = int(state.dir)
    grid.set(ag.pos[0], ag.pos[1], ag)
    return grid, ag


@pytest.mark.parametrize("see_through", [True, False])
def test_maze_partial_obs_matches_host_pipeline(see_through):
    from gym_multigrid_tpu.envs.maze import (
        MazeConfig,
        make_maze,
        make_maze_partial_encode,
    )

    cfg = MazeConfig.from_map_path(
        os.path.join(TESTS, "assets/board_maze.txt"), max_steps=200
    )
    fns = make_maze(cfg)
    state = jax.jit(fns.reset_fn)(jax.random.PRNGKey(2))
    step = jax.jit(fns.step_fn)
    for t_i in range(6):
        state, *_ = step(state, jnp.int32(1 + t_i % 4))

    encode_partial = jax.jit(
        make_maze_partial_encode(cfg, V, see_through_walls=see_through)
    )
    got = np.asarray(encode_partial(state))
    assert got.shape == (1, V, V, 3)

    grid, ag = _maze_host_grid(cfg, state, V)
    want = _host_obs_stw(grid, ag, see_through=see_through)
    np.testing.assert_array_equal(got[0], want)


def test_partial_obs_batched_ctf_maze_shapes():
    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
    from gym_multigrid_tpu.envs.maze import MazeConfig
    from gym_multigrid_tpu.parallel.vector import (
        make_ctf_batch,
        make_maze_batch,
    )

    cfg = CtfConfig.from_map_path(
        os.path.join(TESTS, "assets/board.txt"),
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
        observation_option="flattened",
    )
    env = make_ctf_batch(cfg, 8, partial_obs_view=V)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (8, cfg.num_agents, V, V, 3)
    assert obs.dtype == jnp.uint8
    states, obs2, *_ = jax.jit(env.step)(
        states, jnp.zeros((8, cfg.num_blue_agents), jnp.int32)
    )
    assert obs2.shape == obs.shape

    mcfg = MazeConfig.from_map_path(
        os.path.join(TESTS, "assets/board_maze.txt"), max_steps=200
    )
    menv = make_maze_batch(mcfg, 8, partial_obs_view=V)
    mstates, mobs = jax.jit(menv.reset)(jax.random.PRNGKey(1))
    assert mobs.shape == (8, 1, V, V, 3)
    mstates, mobs2, *_ = jax.jit(menv.step)(
        mstates, jnp.zeros((8,), jnp.int32)
    )
    assert mobs2.shape == mobs.shape


def test_wildfire_partial_obs_spec():
    """Wildfire (no reference / no host-Grid oracle — design-note
    semantics): the FOV slice of the family's own full encode, agents
    facing up, everything see-through, empty beyond the edge."""
    from gym_multigrid_tpu.envs.wildfire import (
        EMPTY,
        W_AGENT,
        WildfireConfig,
        make_wildfire,
        make_wildfire_partial_encode,
    )
    from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

    cfg = WildfireConfig(size=16, max_steps=50)
    fns = make_wildfire(cfg)
    state = jax.jit(fns.reset_fn)(jax.random.key(3))
    full = np.asarray(jax.jit(fns.encode_fn)(state))  # (W, H, 3) xy
    got = np.asarray(jax.jit(make_wildfire_partial_encode(cfg, V))(state))
    assert got.shape == (cfg.num_agents, V, V, 3)

    # Oracle: pad the full encode with empty, slice the dir-3 (up) view,
    # dir 3 + 1 left-rotations == identity for the "up" facing window
    # centered at (x - V//2 .. x + V//2, y - V + 1 .. y).
    pad = np.zeros((cfg.width + 2 * V, cfg.height + 2 * V, 3), np.uint8)
    pad[:, :, 0] = EMPTY
    pad[V : V + cfg.width, V : V + cfg.height] = full
    hs = V // 2
    pos = np.asarray(state.agent_pos)
    for a in range(cfg.num_agents):
        x, y = int(pos[a, 0]), int(pos[a, 1])
        want = pad[x - hs + V : x + hs + 1 + V, y - V + 1 + V : y + 1 + V]
        np.testing.assert_array_equal(got[a], want, err_msg=f"agent {a}")
        assert got[a, hs, V - 1, 0] == W_AGENT  # sees itself bottom-center

    env = make_wildfire_batch(cfg, 8, partial_obs_view=V)
    states, obs = jax.jit(env.reset)(jax.random.key(0))
    assert obs.shape == (8, cfg.num_agents, V, V, 3)
    states, obs2, *_ = jax.jit(env.step)(
        states, jnp.zeros((8, cfg.num_agents), jnp.int32)
    )
    assert obs2.shape == obs.shape
