"""Deterministic step-trajectory differential: our Collect core vs the
live reference, stepped side by side.

Collect's only nondeterminism inside a step is the random agent move
order (global np.random permutation, reference collect_game.py:186) and
respawn placement.  With respawn off and scripted actions that keep the
two agents in disjoint half-boards (they never contend for a cell or
enter each other's cells), the transition is order-independent, so whole
trajectories — full-grid obs, rewards, info counters, termination — must
match the reference exactly.

The board is forced FROM our reset INTO the reference grid (the same
direction test_ctf_differential.py uses), so every reset seed yields a
fresh shared layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_multigrid_tpu.core.world import CollectWorld
from gym_multigrid_tpu.envs.collect import CollectConfig, make_collect

from _reference import load_reference

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")

BALL = CollectWorld.OBJECT_TO_IDX["ball"]

# CollectActions: north/east/south/west = 0/1/2/3.  Agent 0 works the
# west half (x <= 4), agent 1 the east half (x >= 3 moving away): they
# are never adjacent to a shared target, so the reference's random move
# order cannot matter.
N, E, S, W = 0, 1, 2, 3
SCRIPT = (
    [(N, E)] * 3          # a0 north along x=1; a1 east to (5, 8)
    + [(E, N)] * 3        # a0 to (4, 5); a1 north along x=5
    + [(N, E), (W, N), (N, E), (W, N), (S, W), (E, N), (N, E), (S, S)]
    + [(W, E), (N, S), (E, N), (S, E), (N, N), (E, S)]
)


def _force_reference_board(renv, state):
    """Overwrite the reference env's interior with OUR reset layout."""
    from gym_multigrid.core.object import Ball  # ref package (sys.path)

    go = np.asarray(state.grid_obj)
    gc = np.asarray(state.grid_color)
    for y in range(1, 9):
        for x in range(1, 9):
            renv.grid.set(x, y, None)
    for i in range(go.shape[0]):
        x, y = i % 10, i // 10
        if go[i] == BALL:
            renv.grid.set(x, y, Ball(renv.world, int(gc[i]), 1.0))
    for a, (x, y) in zip(renv.agents, np.asarray(state.agent_pos)):
        a.pos = np.array([int(x), int(y)])
        renv.grid.set(int(x), int(y), a)


@needs_ref
@pytest.mark.parametrize("seed", [3, 11, 42])
def test_collect_deterministic_trajectory_matches_reference(seed):
    from gym_multigrid.envs.collect_game import CollectGameQuadrants

    cfg = CollectConfig(layout="quadrants")
    reset_fn, step_fn, encode_fn = make_collect(cfg)
    st = reset_fn(jax.random.PRNGKey(seed))

    renv = CollectGameQuadrants(
        size=10,
        num_balls=[5, 5, 5],
        agents_index=[3, 5],
        balls_index=[0, 1, 2],
        balls_reward=[1.0, 1.0, 1.0],
        respawn=False,
    )
    import random as pyrandom

    pyrandom.seed(0)
    np.random.seed(0)
    renv.reset(seed=0)
    _force_reference_board(renv, st)

    assert np.array_equal(
        np.asarray(renv.grid.encode()), np.asarray(encode_fn(st))
    ), "forced boards must encode identically before stepping"

    for t, acts in enumerate(SCRIPT):
        ref_obs, ref_rew, ref_term, ref_trunc, ref_info = renv.step(
            list(acts)
        )
        st, obs, rew, term, trunc, _ = step_fn(st, jnp.asarray(acts))
        assert np.array_equal(np.asarray(ref_obs), np.asarray(obs)), (
            f"obs diverged at step {t} (seed {seed}, actions {acts})"
        )
        np.testing.assert_allclose(
            np.asarray(rew), np.asarray(ref_rew), atol=0, err_msg=f"step {t}"
        )
        assert bool(term) == bool(ref_term)
        assert bool(trunc) == bool(ref_trunc)
        counts = np.asarray(st.info_counts)
        for i in range(2):
            for c in range(3):
                assert (
                    ref_info[f"agent{i + 1}ball{c + 1}"] == counts[i, c]
                ), f"info counter agent{i + 1}ball{c + 1} at step {t}"
