"""Batched on-device rendering: per-env equality with the host renderers
(render/tiles.py), jit-compatibility, shapes."""

import numpy as np
import jax
import pytest

from gym_multigrid_tpu.core.constants import TILE_PIXELS
from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
from gym_multigrid_tpu.envs.maze import MazeConfig
from gym_multigrid_tpu.envs.wildfire import WildfireConfig
from gym_multigrid_tpu.parallel.vector import (
    make_collect_batch,
    make_ctf_batch,
    make_maze_batch,
    make_wildfire_batch,
)
from gym_multigrid_tpu.render.tiles import (
    render_collect,
    render_collect_batch,
    render_ctf,
    render_ctf_batch,
    render_maze,
    render_maze_batch,
    render_wildfire,
    render_wildfire_batch,
)

B = 4


def _take(states, i):
    return jax.tree_util.tree_map(lambda x: x[i], states)


def test_collect_batch_render_matches_host():
    cfg = CollectConfig(layout="quadrants", max_steps=20)
    env = make_collect_batch(cfg, B)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    imgs = np.asarray(jax.jit(lambda s: render_collect_batch(cfg, s))(states))
    assert imgs.shape == (B, 10 * TILE_PIXELS, 10 * TILE_PIXELS, 3)
    assert imgs.dtype == np.uint8
    for i in range(B):
        np.testing.assert_array_equal(imgs[i], render_collect(cfg, _take(states, i)))


def test_ctf_batch_render_matches_host():
    cfg = CtfConfig.from_map_path(
        "tests/assets/board.txt",
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
        observation_option="flattened",
    )
    env = make_ctf_batch(cfg, B)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    # step a bit so dirs/terminated vary
    states, *_ = jax.jit(env.step)(
        states, jax.random.randint(jax.random.PRNGKey(2), (B, 2), 0, 5)
    )
    imgs = np.asarray(jax.jit(lambda s: render_ctf_batch(cfg, s))(states))
    for i in range(B):
        np.testing.assert_array_equal(imgs[i], render_ctf(cfg, _take(states, i)))


def test_maze_batch_render_matches_host():
    cfg = MazeConfig.from_map_path("tests/assets/board_maze.txt", max_steps=20)
    env = make_maze_batch(cfg, B)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    imgs = np.asarray(jax.jit(lambda s: render_maze_batch(cfg, s))(states))
    for i in range(B):
        np.testing.assert_array_equal(imgs[i], render_maze(cfg, _take(states, i)))


def test_wildfire_batch_render_matches_host():
    cfg = WildfireConfig(size=8, max_steps=20)
    env = make_wildfire_batch(cfg, B)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(4))
    imgs = np.asarray(
        jax.jit(lambda s: render_wildfire_batch(cfg, s))(states)
    )
    for i in range(B):
        np.testing.assert_array_equal(
            imgs[i], render_wildfire(cfg, _take(states, i))
        )
