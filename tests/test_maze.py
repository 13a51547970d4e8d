"""Maze env tests: reference-suite port + golden semantics + differential
checks against the reference package (reference tests/test_maze.py:6-20)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs import MazeSingleAgentEnv
from gym_multigrid_tpu.envs.maze import MazeConfig, MazeState, make_maze

from _reference import load_reference

MAP_PATH = os.path.join(os.path.dirname(__file__), "assets", "board_maze.txt")

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")


def _state(pos, seed=0):
    return MazeState(
        pos=jnp.asarray(pos, dtype=jnp.int32),
        dir=jnp.int32(3),
        step_count=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )


def test_maze():
    env = MazeSingleAgentEnv(
        map_path=MAP_PATH, max_steps=200, step_penalty_ratio=0
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == env._field_map.shape and obs.dtype == np.float64
    for _ in range(201):
        obs, reward, terminated, truncated, info = env.step(
            env.action_space.sample()
        )
        if terminated or truncated:
            break
    assert terminated or truncated
    assert len(env.agent_traj) == len(env.rewards) + 1
    env.render()


def test_maze_semantics():
    cfg = MazeConfig.from_map_path(MAP_PATH)
    fns = make_maze(cfg)
    fm = cfg.field_map
    flag = np.argwhere(fm == 2)[0]

    # Step onto the flag: +flag_reward - step_penalty, terminated.
    st = _state([int(flag[0]), int(flag[1]) - 1])
    st2, obs, r, term, trunc, info = fns.step_fn(st, 3)  # right
    np.testing.assert_array_equal(np.asarray(st2.pos), flag)
    assert float(r) == pytest.approx(cfg.flag_reward - cfg.step_penalty)
    assert bool(term)
    assert float(info["d_a_f"]) == 0.0

    # Obstacle blocks when penalty == 0.
    ob = np.argwhere(fm == 3)[2]
    nb = [int(ob[0]), int(ob[1]) - 1]
    if fm[nb[0], nb[1]] == 0:
        st = _state(nb)
        st2, *_ = fns.step_fn(st, 3)
        np.testing.assert_array_equal(np.asarray(st2.pos), nb)

    # With penalty enabled the agent walks in, pays, terminates.
    cfg_p = MazeConfig.from_map_path(MAP_PATH, obstacle_penalty_ratio=0.5)
    fns_p = make_maze(cfg_p)
    if fm[nb[0], nb[1]] == 0:
        st = _state(nb)
        st2, obs, r, term, trunc, info = fns_p.step_fn(st, 3)
        np.testing.assert_array_equal(np.asarray(st2.pos), ob)
        assert float(r) == pytest.approx(-cfg_p.obstacle_penalty - cfg_p.step_penalty)
        assert bool(term)

    # Bounds: corner agent walking off the board stays put.
    st = _state([0, 0])
    st2, *_ = fns.step_fn(st, 1)  # left
    np.testing.assert_array_equal(np.asarray(st2.pos), [0, 0])

    # Stay action is a no-op.
    st = _state([1, 1])
    st2, *_ = fns.step_fn(st, 0)
    np.testing.assert_array_equal(np.asarray(st2.pos), [1, 1])


def test_maze_seeding():
    env = MazeSingleAgentEnv(map_path=MAP_PATH)
    o1, _ = env.reset(seed=5)
    p1 = np.asarray(env.agents[0].pos).copy()
    o2, _ = env.reset(seed=5)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(p1, np.asarray(env.agents[0].pos))


@needs_ref
@pytest.mark.parametrize("option", ["positional", "map"])
def test_maze_obs_matches_reference(option):
    from gym_multigrid.envs.maze import MazeSingleAgentEnv as RefEnv

    ref_env = RefEnv(map_path=MAP_PATH, observation_option=option)
    ref_env.reset()
    pos = [1, 1]
    ref_env.agents[0].pos = np.array(pos)
    ref_obs = ref_env._get_obs()
    ref_info = ref_env._get_info()

    cfg = MazeConfig.from_map_path(MAP_PATH, observation_option=option)
    fns = make_maze(cfg)
    st = _state(pos)
    obs = fns.obs_fn(st)
    info = fns.info_fn(st)

    if option == "positional":
        for k in ref_obs:
            np.testing.assert_array_equal(
                np.asarray(obs[k]), np.asarray(ref_obs[k]), err_msg=k
            )
    else:
        # float64 is applied at the adapter edge (jax core is f32).
        np.testing.assert_array_equal(
            np.asarray(obs, dtype=np.float64), np.asarray(ref_obs)
        )
    for k, v in ref_info.items():
        assert float(info[k]) == pytest.approx(v), k


@needs_ref
@pytest.mark.parametrize(
    "option,penalty", [("map", 0.0), ("positional", 0.0), ("map", 0.5)]
)
def test_maze_deterministic_trajectory_matches_reference(option, penalty):
    """Whole-trajectory differential: maze is fully deterministic given
    the action, so random action scripts from the reference's own spawn
    must reproduce obs/reward/termination/info step for step (blocked
    moves, obstacle penalties, and the terminal flag/obstacle step
    included)."""
    from gym_multigrid.envs.maze import MazeSingleAgentEnv as RefEnv

    ref_env = RefEnv(
        map_path=MAP_PATH,
        observation_option=option,
        obstacle_penalty_ratio=penalty,
    )
    np.random.seed(7)
    ref_env.reset()
    start = [int(ref_env.agents[0].pos[0]), int(ref_env.agents[0].pos[1])]

    cfg = MazeConfig.from_map_path(
        MAP_PATH,
        observation_option=option,
        obstacle_penalty_ratio=penalty,
    )
    fns = make_maze(cfg)
    st = _state(start)

    rng = np.random.RandomState(13)
    for t in range(60):
        a = int(rng.randint(0, 5))
        ref_obs, ref_rew, ref_term, ref_trunc, ref_info = ref_env.step(a)
        st, obs, rew, term, trunc, info = fns.step_fn(st, jnp.int32(a))
        if option == "positional":
            for k in ref_obs:
                np.testing.assert_array_equal(
                    np.asarray(obs[k]), np.asarray(ref_obs[k]),
                    err_msg=f"step {t} obs[{k}]",
                )
        else:
            np.testing.assert_array_equal(
                np.asarray(obs, dtype=np.float64), np.asarray(ref_obs),
                err_msg=f"step {t}",
            )
        assert float(rew) == pytest.approx(float(ref_rew)), f"step {t}"
        assert bool(term) == bool(ref_term), f"step {t}"
        assert bool(trunc) == bool(ref_trunc), f"step {t}"
        for k, v in ref_info.items():
            assert float(info[k]) == pytest.approx(v), f"step {t} info {k}"
        if ref_term or ref_trunc:
            break


def test_config_validation_errors_early():
    with pytest.raises(ValueError, match="observation_option"):
        MazeConfig.from_map_path(MAP_PATH, observation_option="bogus")
    with pytest.raises(ValueError, match="max_steps"):
        MazeConfig.from_map_path(MAP_PATH, max_steps=0)
