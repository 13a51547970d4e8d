"""Toroid wrapper + rendering-primitive tests."""

import numpy as np
import gymnasium as gym
import pytest

import gym_multigrid_tpu  # noqa: F401  (registers env ids)
from gym_multigrid_tpu.wrappers import ToroidObservation


def _oracle(env):
    """Literal numpy port of the reference loop (toroid.py:42-68) over our
    state arrays — the independent oracle for the vectorized version."""
    base = env.unwrapped
    from gym_multigrid_tpu.envs.collect import AGENT, BALL, WALL

    w, h = base.width, base.height
    depth = base.num_ball_types + len(base.agents)
    obj = np.asarray(base._state.grid_obj).reshape(h, w)
    col = np.asarray(base._state.grid_color).reshape(h, w)
    outs = []
    for a in base.agents:
        pos = a.pos
        tor = np.zeros((w, h, depth), dtype="float32")
        for i in range(w):
            for j in range(h):
                nx, ny = (i - pos[0]) % w, (j - pos[1]) % h
                o = obj[j, i]
                if o == WALL:
                    tor[ny, nx, depth - 1] = 1
                elif o == BALL:
                    tor[ny, nx, col[j, i]] = 1
                elif o == AGENT and not (i == pos[0] and j == pos[1]):
                    tor[ny, nx, depth - 2] = 1
        outs.append(tor)
    return outs


def test_toroid_matches_loop_oracle():
    env = ToroidObservation(gym.make("multigrid-collect-quadrants-v0"))
    obs, _ = env.reset(seed=3)
    assert isinstance(obs, list) and len(obs) == 2
    want = _oracle(env)
    for got, exp in zip(obs, want):
        assert got.shape == (10, 10, 5)
        np.testing.assert_array_equal(got, exp)
    # And again mid-episode.
    obs, *_ = env.step([0, 1])
    for got, exp in zip(obs, _oracle(env)):
        np.testing.assert_array_equal(got, exp)


def test_toroid_space():
    env = ToroidObservation(gym.make("multigrid-collect-v0"))
    assert env.observation_space.shape == (10, 10, 5)


def test_rendering_primitives():
    from gym_multigrid_tpu.utils.rendering import (
        downsample,
        fill_coords,
        point_in_circle,
        point_in_rect,
        point_in_triangle,
        rotate_fn,
    )

    img = np.zeros((96, 96, 3), dtype=np.float64)
    fill_coords(img, point_in_rect(0, 1, 0, 1), (10, 20, 30))
    assert (img == [10, 20, 30]).all()
    fill_coords(img, point_in_circle(0.5, 0.5, 0.3), (255, 0, 0))
    assert (img[48, 48] == [255, 0, 0]).all()
    assert (img[0, 0] == [10, 20, 30]).all()
    tri = rotate_fn(
        point_in_triangle((0.12, 0.19), (0.87, 0.50), (0.12, 0.81)),
        cx=0.5, cy=0.5, theta=np.pi / 2,
    )
    fill_coords(img, tri, (0, 255, 0), bg_color=(1, 1, 1))
    small = downsample(img, 3)
    assert small.shape == (32, 32, 3)

    # Scalar-only predicates still work (reference-style user callables).
    img2 = np.zeros((12, 12, 3))
    fill_coords(img2, lambda x, y: bool(x < 0.5), (5, 5, 5))
    assert (img2[:, :6] == 5).all() and (img2[:, 6:] == 0).all()


def test_profiling_utils(tmp_path):
    import jax
    import jax.numpy as jnp

    from gym_multigrid_tpu.utils.profiling import (
        annotate,
        sol_report,
        state_nbytes,
        trace,
    )

    with trace(str(tmp_path)):
        with annotate("phase"):
            jax.block_until_ready(jnp.ones(8) * 2)
    import os

    assert any(os.scandir(tmp_path))  # xplane trace written

    est = sol_report(
        env_steps_per_s=8192 * 1000.0, state_bytes=8_190_000, batch_size=8192
    )
    # 1000 batched steps/s * 2 * 8.19MB = 16.38GB/s of 819GB/s = 2%
    assert est.sol_fraction == pytest.approx(0.02, rel=0.01)
    assert state_nbytes({"a": np.zeros((2, 3), np.float32)}) == 24


def test_window_headless_and_import_path():
    """Window (reference utils/window.py:15-93) draws headlessly via Agg,
    and the reference import path gym_multigrid_tpu.utils.window works."""
    from gym_multigrid_tpu.render.window import Window
    from gym_multigrid_tpu.utils.window import Window as WindowShim

    assert WindowShim is Window
    w = Window("test")
    w.show_img(np.zeros((4, 4, 3), np.uint8))
    w.show_img(np.full((4, 4, 3), 255, np.uint8))  # reuses the imshow obj
    w.set_caption("caption")
    w.reg_key_handler(lambda evt: None)
    w.show(block=True)  # no-op on Agg: must not block
    w.close()
