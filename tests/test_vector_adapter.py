"""Gymnasium VectorEnv facade over the jitted batch (NextStep autoreset)."""

import numpy as np
import pytest

from gym_multigrid_tpu.adapters.vector_adapter import make_vector_env


@pytest.mark.parametrize("family", ["collect", "ctf", "maze", "wildfire"])
def test_vector_env_api(family):
    venv = make_vector_env(family, num_envs=6)
    obs, info = venv.reset(seed=0)
    assert obs.shape[0] == 6
    if hasattr(venv.observation_space, "shape") and venv.observation_space.shape:
        assert tuple(obs.shape) == tuple(venv.observation_space.shape)
    actions = venv.action_space.sample()
    obs2, rew, term, trunc, info = venv.step(actions)
    assert obs2.shape == obs.shape
    assert rew.shape[0] == 6
    assert term.shape == trunc.shape == (6,)
    assert np.isfinite(rew).all()


def test_vector_env_autoreset_next_step():
    """Gymnasium 1.x NextStep semantics: the finishing step reports the
    final transition; the next step runs from a fresh episode."""
    venv = make_vector_env("collect", num_envs=4, max_steps=5)
    venv.reset(seed=1)
    done_seen = False
    for t in range(5):
        _, _, term, trunc, _ = venv.step(venv.action_space.sample())
    assert trunc.all()  # 5-step horizon hits on step 5 in lockstep
    # the in-graph auto-reset already replaced the states
    assert int(np.asarray(venv.states.step_count).max()) == 0
    # next step runs from the fresh episode: step_count = 1, no dones
    _, _, term, trunc, _ = venv.step(venv.action_space.sample())
    assert not term.any() and not trunc.any()
    assert int(np.asarray(venv.states.step_count).min()) == 1


def test_vector_env_seed_determinism():
    v1 = make_vector_env("wildfire", num_envs=3, size=8)
    v2 = make_vector_env("wildfire", num_envs=3, size=8)
    o1, _ = v1.reset(seed=9)
    o2, _ = v2.reset(seed=9)
    np.testing.assert_array_equal(o1, o2)
