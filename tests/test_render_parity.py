"""Golden-image render parity: the sprite-bank renderer (render/tiles.py)
must reproduce the live reference renderer's pixels on identical states
(reference grid.py:132-221, object.py:80-372, agent.py:105-117).

The sprite geometry constants already match digit-for-digit; these tests
prove the rendered output does too.
"""

import numpy as np
import pytest

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference not available")

MAP_PATH = "tests/assets/board.txt"


def _diff_stats(a, b):
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    return float(d.mean()), int(d.max()), float((d > 2).mean())


def test_collect_frame_matches_reference_renderer():
    """Render our Collect state through BOTH renderers: rebuild the same
    board inside a reference Grid (walls/balls/agents at our state's
    cells) and compare the reference's Grid.render output against ours."""
    import gymnasium as gym

    import gym_multigrid_tpu  # noqa: F401
    from gym_multigrid_tpu.envs.collect import AGENT, BALL, WALL

    env = gym.make("multigrid-collect-quadrants-v0")
    env.reset(seed=7)
    ours = env.unwrapped.render()
    state = env.unwrapped._state
    cfg = env.unwrapped.cfg

    from gym_multigrid.core.agent import Agent as RefAgent
    from gym_multigrid.core.grid import Grid as RefGrid
    from gym_multigrid.core.object import Ball as RefBall, Wall as RefWall
    from gym_multigrid.core.world import CollectWorld as RefWorld

    obj = np.asarray(state.grid_obj).reshape(cfg.height, cfg.width)
    color = np.asarray(state.grid_color).reshape(cfg.height, cfg.width)
    g = RefGrid(cfg.width, cfg.height, RefWorld)
    agent_serial = 0
    for j in range(cfg.height):
        for i in range(cfg.width):
            o, c = int(obj[j, i]), int(color[j, i])
            if o == WALL:
                g.set(i, j, RefWall(RefWorld))
            elif o == BALL:
                g.set(i, j, RefBall(RefWorld, index=c, reward=1))
            elif o == AGENT:
                a = RefAgent(RefWorld, agent_serial)
                a.pos = (i, j)
                a.dir = 3
                a.color = [
                    k for k, v in RefWorld.COLOR_TO_IDX.items() if v == c
                ][0]
                g.set(i, j, a)
                agent_serial += 1
    theirs = g.render(tile_size=32)

    assert ours.shape == theirs.shape
    mean_d, max_d, frac = _diff_stats(ours, theirs)
    # Same predicates, same supersampling: pixels agree exactly up to
    # uint8 rounding of the 3x3 mean.
    assert mean_d < 0.5 and frac < 0.001, (mean_d, max_d, frac)


def test_ctf_frame_matches_reference_renderer():
    """Reference CtFMvNEnv renders its post-reset state; our adapter is
    forced to the identical state and must produce the same frame."""
    import jax
    import jax.numpy as jnp

    from gym_multigrid.envs.ctf import CtFMvNEnv as RefEnv

    from gym_multigrid_tpu.envs import CtFMvNEnv
    from gym_multigrid_tpu.envs.ctf import CtfState

    renv = RefEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        render_mode="rgb_array",
        observation_option="flattened",
    )
    renv.reset(seed=11)
    theirs = renv.render()

    ours_env = CtFMvNEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        render_mode="rgb_array",
        observation_option="flattened",
    )
    ours_env.reset(seed=0)
    pos = np.asarray([list(a.pos) for a in renv.agents], dtype=np.int32)
    ours_env._state = CtfState(
        pos=jnp.asarray(pos),
        dir=jnp.asarray([int(a.dir) for a in renv.agents], jnp.int32),
        terminated=jnp.zeros((4,), bool),
        collided=jnp.zeros((4,), bool),
        step_count=jnp.int32(0),
        key=jax.random.PRNGKey(0),
    )
    ours = ours_env.render()

    assert ours.shape == theirs.shape
    mean_d, max_d, frac = _diff_stats(ours, theirs)
    assert mean_d < 0.5 and frac < 0.001, (mean_d, max_d, frac)
