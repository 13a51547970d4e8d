"""Scripted-policy tests: A* equivalence, closed-form optimal step, borders.

The production a_star (policy/ctf/utils.py) claims output-identity with the
reference's heap-based A* (lexicographically smallest shortest path).  We
verify that claim two ways: against the reference implementation itself
(when available) and against the closed-form next-step rule baked into the
jitted CtF policies.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.ctf import _optimal_action
from gym_multigrid_tpu.policy.ctf.heuristic import PatrolPolicy, FightPolicy
from gym_multigrid_tpu.policy.ctf.utils import a_star, manhattan_distance
from gym_multigrid_tpu.utils.map import load_text_map

from _reference import load_reference

MAP_PATH = os.path.join(os.path.dirname(__file__), "assets", "board.txt")

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")


def _pairs(shape, step=2):
    cells = [(r, c) for r in range(shape[0]) for c in range(shape[1])]
    sub = cells[::step]
    return [(s, e) for s in sub for e in cells[:: step + 1]]


def test_a_star_is_shortest_and_valid():
    fm = load_text_map(MAP_PATH)
    for start, end in _pairs(fm.shape, step=3):
        path = a_star(start, end, fm)
        assert path[0] == tuple(start) and path[-1] == tuple(end)
        assert len(path) == manhattan_distance(start, end) + 1
        for a, b in zip(path, path[1:]):
            assert manhattan_distance(a, b) == 1


@needs_ref
def test_a_star_matches_reference():
    from gym_multigrid.policy.ctf.utils import a_star as ref_a_star

    fm = load_text_map(MAP_PATH)
    rng = np.random.default_rng(0)
    cells = [(r, c) for r in range(fm.shape[0]) for c in range(fm.shape[1])]
    for _ in range(150):
        s = cells[rng.integers(len(cells))]
        e = cells[rng.integers(len(cells))]
        assert a_star(s, e, fm) == [
            tuple(p) for p in ref_a_star(s, e, fm)
        ], (s, e)


@needs_ref
def test_a_star_matches_reference_with_blocked_cells():
    """Maps containing the magic blocked value 8 (never on CtF maps, but the
    algorithm supports it)."""
    from gym_multigrid.policy.ctf.utils import a_star as ref_a_star

    rng = np.random.default_rng(1)
    for trial in range(10):
        fm = np.zeros((7, 7))
        blocked = rng.choice(49, size=8, replace=False)
        fm.flat[blocked] = 8
        for _ in range(30):
            s = (int(rng.integers(7)), int(rng.integers(7)))
            e = (int(rng.integers(7)), int(rng.integers(7)))
            if fm[e] == 8 and s != e:
                continue  # unreachable goal: both return []
            got = a_star(s, e, fm)
            want = [tuple(p) for p in ref_a_star(s, e, fm)]
            assert got == want, (trial, s, e)


def test_optimal_action_matches_a_star_next_step():
    """The in-graph closed-form rule equals "follow a_star path[1]" for every
    (start, target) pair on the board (heuristic.py:140-173 semantics)."""
    fm = load_text_map(MAP_PATH)
    act_of_dir = {(0, 0): 0, (0, -1): 1, (-1, 0): 2, (0, 1): 3, (1, 0): 4}
    fn = jax.jit(_optimal_action)
    for start, end in _pairs(fm.shape, step=2):
        path = a_star(start, end, fm)
        nxt = path[1] if len(path) > 1 else end
        want = act_of_dir[(nxt[0] - start[0], nxt[1] - start[1])]
        got = int(fn(jnp.asarray(start), jnp.asarray(end)))
        assert got == want, (start, end)


@needs_ref
def test_patrol_border_matches_reference():
    from gym_multigrid.policy.ctf.heuristic import PatrolPolicy as RefPatrol

    fm = load_text_map(MAP_PATH)
    ours = PatrolPolicy(field_map=fm, ego_agent="red")
    theirs = RefPatrol(field_map=fm, ego_agent="red")
    assert [tuple(int(x) for x in p) for p in ours.border] == [
        tuple(int(x) for x in p) for p in theirs.border
    ]
    assert sorted(map(tuple, ours.obstacle)) == sorted(
        tuple(int(x) for x in p) for p in theirs.obstacle
    )


@needs_ref
def test_fight_target_matches_reference():
    from gym_multigrid.policy.ctf.heuristic import FightPolicy as RefFight

    fm = load_text_map(MAP_PATH)
    obs = {"blue_agent": np.array([2, 3, 7, 7]), "red_agent": np.array([5, 5])}
    ours = FightPolicy(field_map=fm)
    theirs = RefFight(field_map=fm)
    for curr in [(5, 5), (0, 0), (9, 9), (4, 5)]:
        assert tuple(ours.get_target(obs, curr)) == tuple(
            theirs.get_target(obs, curr)
        )
