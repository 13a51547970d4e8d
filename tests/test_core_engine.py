"""Host-side object model / MultiGridEnv base engine tests.

This layer is the extension surface reference users subclass
(multigrid.py:21-607); the tests exercise a custom env built from
WorldObjs, the default-action dispatch, partial observations and the
encode/visibility machinery — including differential checks against the
reference where it is runnable.
"""

import numpy as np
import pytest

from gym_multigrid_tpu.core import (
    Agent,
    Ball,
    Box,
    DefaultActions,
    DefaultWorld,
    Door,
    Flag,
    Floor,
    Goal,
    Grid,
    Key,
    Wall,
    behavior_tables,
)
from gym_multigrid_tpu.multigrid import MultiGridEnv

from _reference import load_reference

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")


class FourWallsEnv(MultiGridEnv):
    """Minimal custom env: perimeter walls, one goal, one ball."""

    def __init__(self, partial_obs=False, **kw):
        self.collected = 0
        agents = [Agent(DefaultWorld, index=3, view_size=5)]
        super().__init__(
            agents=agents,
            grid_size=8,
            max_steps=50,
            partial_obs=partial_obs,
            agent_view_size=5,
            world=DefaultWorld,
            **kw,
        )

    def _gen_grid(self, width, height):
        self.grid = Grid(width, height, self.world)
        self.grid.wall_rect(0, 0, width, height)
        self.put_obj(Goal(self.world, index=0), width - 2, height - 2)
        self.put_obj(Ball(self.world, index=1), 3, 3)
        self.place_agent(self.agents[0], pos=(1, 1))

    def _handle_pickup(self, i, rewards, fwd_pos, fwd_cell):
        if fwd_cell is not None and fwd_cell.can_pickup():
            if self.agents[i].carrying is None:
                self.agents[i].carrying = fwd_cell
                self.grid.set(*fwd_pos, None)
                self.collected += 1


def test_custom_env_reset_and_obs():
    env = FourWallsEnv()
    obs, info = env.reset(seed=0)
    assert len(obs) == 1
    assert obs[0].shape == (8, 8, 6)
    # Perimeter is wall id everywhere
    wall_id = DefaultWorld.OBJECT_TO_IDX["wall"]
    assert (obs[0][0, :, 0] == wall_id).all()
    assert obs[0][1, 1, 0] == DefaultWorld.OBJECT_TO_IDX["agent"]


def test_default_actions_move_and_rotate():
    env = FourWallsEnv()
    env.reset(seed=0)
    a = env.agents[0]
    assert a.dir == 3  # place_agent default
    # rotate right: dir 3 -> 0 (facing +x), forward moves east
    env.step([DefaultActions.right])
    assert a.dir == 0
    env.step([DefaultActions.forward])
    np.testing.assert_array_equal(a.pos, [2, 1])
    # forward into the wall is blocked
    env.step([DefaultActions.left])  # dir 3 = up (towards y=0, wall)
    env.step([DefaultActions.forward])
    np.testing.assert_array_equal(a.pos, [2, 1])


def test_pickup_hook_and_carrying():
    env = FourWallsEnv()
    env.reset(seed=0)
    a = env.agents[0]
    a.pos = np.array([3, 2])
    env.grid.set(3, 2, a)
    env.grid.set(1, 1, None)
    a.dir = 1  # facing +y -> (3, 3) ball
    env.step([DefaultActions.pickup])
    assert env.collected == 1
    assert a.carrying is not None and a.carrying.type == "ball"
    assert env.grid.get(3, 3) is None


def test_goal_reward_and_termination():
    env = FourWallsEnv()
    env.reset(seed=0)
    a = env.agents[0]
    a.pos = np.array([6, 5])
    env.grid.set(6, 5, a)
    env.grid.set(1, 1, None)
    a.dir = 1  # facing the goal at (6, 6)
    obs, rewards, terminated, truncated, info = env.step([DefaultActions.forward])
    assert terminated
    # _reward = 1 - 0.9 * step_count / max_steps (multigrid.py:218-223)
    assert rewards[0] == pytest.approx(1 - 0.9 * 1 / 50)


def test_partial_obs_pipeline():
    """The upstream gen_obs is broken (SURVEY.md §2.2); ours must work."""
    env = FourWallsEnv(partial_obs=True)
    obs, _ = env.reset(seed=0)
    assert obs[0].shape == (5, 5, 6)
    # Agent sits bottom-center of its own view with the current-agent bit.
    me = obs[0][5 // 2, 5 - 1]
    assert me[0] == DefaultWorld.OBJECT_TO_IDX["agent"]
    assert me[5] == 1


def test_process_vis_blocks_behind_walls():
    g = Grid(7, 7, DefaultWorld)
    g.horz_wall(0, 3)
    mask = g.copy().process_vis((3, 6))
    assert mask[3, 6]
    # Everything strictly above the wall row is occluded.
    assert not mask[:, :3].any()


def test_door_key_box_flag_semantics():
    w = DefaultWorld
    d = Door(w, "blue", is_locked=True)
    assert not d.can_overlap() and not d.see_behind()

    class E:  # minimal toggle env stub
        carrying = Key(w, "blue")
        grid = Grid(3, 3, w)

    assert d.toggle(E(), (1, 1))
    assert d.is_open and d.can_overlap()

    b = Box(w, "red", contains=Ball(w, index=0))
    env = E()
    b.toggle(env, (1, 1))
    assert env.grid.get(1, 1).type == "ball"

    from gym_multigrid_tpu.core import MazeWorld

    f = Flag(MazeWorld, index=0, type="flag", color="red", bg_color="white")
    assert f.can_overlap() and f.can_pickup()


def test_ascii_dump():
    env = FourWallsEnv()
    env.reset(seed=0)
    s = str(env)
    lines = s.split("\n")
    assert len(lines) == 8
    assert lines[0] == "xG" * 8  # grey walls
    assert "aG" in s or "aB" in s or "aP" in s  # the agent shows up


def test_render_object_model():
    env = FourWallsEnv()
    env.reset(seed=0)
    img = env.render()
    assert img.shape == (8 * 32, 8 * 32, 3)
    img2 = env.render(highlight=True)
    assert img2.shape == img.shape


def test_behavior_tables_match_objects():
    w = DefaultWorld
    t = behavior_tables(w)
    ball_id = w.OBJECT_TO_IDX["ball"]
    wall_id = w.OBJECT_TO_IDX["wall"]
    assert t["can_overlap"][ball_id] and t["can_pickup"][ball_id]
    assert not t["can_overlap"][wall_id] and t["opaque"][wall_id]


@needs_ref
def test_encode_matches_reference():
    """Same hand-built grid encodes identically in both object models."""
    import gym_multigrid.core.grid as rg
    import gym_multigrid.core.object as ro
    import gym_multigrid.core.world as rw

    def build(G, O, W):
        g = G(6, 6, W)
        g.wall_rect(0, 0, 6, 6)
        g.set(2, 2, O["Ball"](W, 1))
        g.set(3, 3, O["Door"](W, "blue", is_locked=True))
        g.set(4, 2, O["Key"](W, "blue"))
        return g

    ours = build(
        Grid,
        {"Ball": Ball, "Door": Door, "Key": Key},
        DefaultWorld,
    )
    theirs = build(
        rg.Grid,
        {"Ball": ro.Ball, "Door": ro.Door, "Key": ro.Key},
        rw.DefaultWorld,
    )
    np.testing.assert_array_equal(ours.encode(), theirs.encode())
    np.testing.assert_array_equal(
        ours.encode_for_agents((2, 2)), theirs.encode_for_agents((2, 2))
    )


def test_process_vis_matches_sequential_semantics():
    """The vectorized row-sweep must reproduce the reference's sequential
    shadow-cast exactly (reference grid.py:286-323) on random wall
    layouts.  The oracle below IS that sequential algorithm."""
    import numpy as np
    from gym_multigrid_tpu.core import Wall

    def oracle(see, agent_pos):
        w, h = see.shape
        mask = np.zeros((w, h), dtype=bool)
        mask[agent_pos] = True
        for j in reversed(range(h)):
            for i in range(w - 1):
                if mask[i, j] and see[i, j]:
                    mask[i + 1, j] = True
                    if j > 0:
                        mask[i + 1, j - 1] = True
                        mask[i, j - 1] = True
            for i in reversed(range(1, w)):
                if mask[i, j] and see[i, j]:
                    mask[i - 1, j] = True
                    if j > 0:
                        mask[i - 1, j - 1] = True
                        mask[i, j - 1] = True
        return mask

    rng = np.random.default_rng(0)
    for trial in range(25):
        w, h = int(rng.integers(3, 9)), int(rng.integers(3, 9))
        g = Grid(w, h, DefaultWorld)
        see = np.ones((w, h), dtype=bool)
        for _ in range(int(rng.integers(0, w * h // 2))):
            i, j = int(rng.integers(0, w)), int(rng.integers(0, h))
            g.set(i, j, Wall(DefaultWorld))
            see[i, j] = False
        pos = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        want = oracle(see, pos)
        got = g.copy().process_vis(pos)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_highlight_cone_matches_per_cell_oracle():
    """The vectorized view->board coordinate map behind render(highlight=
    True) must mark exactly the cells a per-cell walk of the view cone
    marks (reference multigrid.py:564-595 semantics), for every facing."""
    env = FourWallsEnv(partial_obs=True)
    env.reset(seed=0)
    for d in range(4):
        for a in env.agents:
            a.dir = d
        _, vis_masks = env.gen_obs_grid()

        # independent oracle: walk every view cell
        want = {}
        for i, a in enumerate(env.agents):
            V = a.view_size
            fx, fy = int(a.dir_vec[0]), int(a.dir_vec[1])
            rx, ry = int(a.right_vec[0]), int(a.right_vec[1])
            cx = int(a.pos[0]) + fx * (V - 1) - rx * (V // 2)
            cy = int(a.pos[1]) + fy * (V - 1) - ry * (V // 2)
            for u in range(V):
                for v in range(V):
                    if not vis_masks[i][u, v]:
                        continue
                    x = cx + rx * u - fx * v
                    y = cy + ry * u - fy * v
                    if 0 <= x < env.width and 0 <= y < env.height:
                        want.setdefault((x, y), []).append(i)

        img = env.render(highlight=True)  # exercises the vectorized path
        assert img is not None

        # re-derive the vectorized mapping exactly as render() does
        got = {}
        for i, a in enumerate(env.agents):
            V = a.view_size
            ahead = np.asarray(a.dir_vec, dtype=int)
            right = np.asarray(a.right_vec, dtype=int)
            corner = np.asarray(a.pos, dtype=int) + ahead * (V - 1) \
                - right * (V // 2)
            u, v = np.meshgrid(np.arange(V), np.arange(V), indexing="ij")
            cells = (
                corner[None, None]
                + u[..., None] * right[None, None]
                - v[..., None] * ahead[None, None]
            )
            on_board = np.logical_and.reduce([
                cells[..., 0] >= 0, cells[..., 0] < env.width,
                cells[..., 1] >= 0, cells[..., 1] < env.height,
            ])
            for x, y in cells[np.asarray(vis_masks[i], bool) & on_board]:
                got.setdefault((int(x), int(y)), []).append(i)
        assert got == want, f"facing {d}"
