"""Maze env family — TPU-native functional engine.

Reference parity target: gym_multigrid/envs/maze.py (MazeSingleAgentEnv,
maze.py:26-377).  Single agent, static map of background/flag/obstacle
cells; the whole dynamic state is one (2,) position.

Semantics preserved exactly (verified in tests/test_maze.py):

* Moves stay/left/down/right/up with the same vectors as CtF
  (maze.py:276-288); bounds check pos[0] against shape[0] and pos[1]
  against shape[1] (maze.py:290-295 — unlike CtF, the maze env checks the
  natural axis order).
* Obstacles block when obstacle_penalty == 0 (Obstacle.can_overlap,
  object.py:200-201); background and flags always overlap.
* Reward: +flag_reward on any flag cell (terminated); -obstacle_penalty on
  an obstacle cell when the penalty is enabled (terminated); step penalty
  -flag_reward*step_penalty_ratio every step (maze.py:331-369).
* Spawn: uniform over background cells (maze.py:202-205 uses the *global*
  np.random stream — a documented reference quirk, SURVEY.md §2.3; here the
  draw comes from the env's own key).
* Obs: "positional" dict of int64 coordinate arrays, or "map" — the encoded
  grid as float64, NOT transposed (maze.py:245-260; verified upstream).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from gym_multigrid_tpu.core.constants import CTF_ACTION_TO_VEC
from gym_multigrid_tpu.core.world import MazeWorld

_W = MazeWorld.OBJECT_TO_IDX
BACKGROUND = _W["background"]
M_AGENT = _W["agent"]
FLAG = _W["flag"]
M_OBSTACLE = _W["obstacle"]

NUM_ACTIONS = 5


@dataclass(frozen=True)
class MazeConfig:
    """Static Maze configuration (hashable -> usable as a jit constant)."""

    map_data: tuple[tuple[int, ...], ...]
    max_steps: int = 100
    flag_reward: float = 1.0
    obstacle_penalty_ratio: float = 0.0
    step_penalty_ratio: float = 0.01
    observation_option: Literal["positional", "map"] = "map"

    def __post_init__(self):
        if self.observation_option not in ("positional", "map"):
            # An unknown option would silently fall through to the
            # positional branch (obs_fn selection is a ternary).
            raise ValueError(
                f"observation_option must be 'positional' or 'map', "
                f"got {self.observation_option!r}"
            )
        if self.max_steps < 1:
            raise ValueError(f"max_steps must be >= 1, got {self.max_steps}")

    @classmethod
    def from_map_path(cls, map_path: str, **kwargs) -> "MazeConfig":
        from gym_multigrid_tpu.utils.map import load_text_map

        fm = load_text_map(map_path).astype(int)
        return cls(map_data=tuple(tuple(row) for row in fm), **kwargs)

    @property
    def field_map(self) -> np.ndarray:
        return np.asarray(self.map_data, dtype=np.int64)

    @property
    def obstacle_penalty(self) -> float:
        return self.obstacle_penalty_ratio * self.flag_reward

    @property
    def step_penalty(self) -> float:
        return self.step_penalty_ratio * self.flag_reward


@jax.tree_util.register_dataclass
@dataclass
class MazeState:
    pos: jax.Array  # (2,) int32
    dir: jax.Array  # () int32 render-facing
    step_count: jax.Array  # () int32
    key: jax.Array


@dataclass(frozen=True)
class MazeFns:
    reset_fn: callable  # key -> MazeState
    step_fn: callable  # (state, action) -> (state', obs, r, term, trunc, info)
    obs_fn: callable  # state -> obs pytree
    info_fn: callable  # state -> {d_a_f, d_a_ob}


def make_maze(cfg: MazeConfig) -> MazeFns:
    fm = cfg.field_map
    S0, S1 = fm.shape
    background = np.argwhere(fm == BACKGROUND)
    flags = np.argwhere(fm == FLAG)
    obstacles = np.argwhere(fm == M_OBSTACLE)

    background_j = jnp.asarray(background, dtype=jnp.int32)
    flags_j = jnp.asarray(flags, dtype=jnp.int32)
    obstacles_j = jnp.asarray(obstacles.reshape(-1, 2), dtype=jnp.int32)
    flag_mask = jnp.asarray(fm == FLAG)
    obstacle_mask = jnp.asarray(fm == M_OBSTACLE)
    if cfg.obstacle_penalty != 0:
        can_enter = jnp.ones_like(flag_mask)
    else:
        can_enter = jnp.asarray(fm != M_OBSTACLE)
    action_vec = jnp.asarray(CTF_ACTION_TO_VEC)
    shape_max = jnp.asarray([S0 - 1, S1 - 1], dtype=jnp.int32)
    # Action -> render dir (same mapping as CtF; delta vs DIR_TO_VEC).
    act_to_dir = jnp.asarray([3, 3, 2, 1, 0], dtype=jnp.int32)

    # Point queries as one-hot compare+reduce over flattened static tables
    # (single-element dynamic gathers lower poorly on TPU).
    cell_iota = jnp.arange(S0 * S1, dtype=jnp.int32)

    def _cell(mask, p):
        q = jnp.clip(p, 0, shape_max)
        flat = q[0] * S1 + q[1]
        return jnp.sum(
            jnp.where(cell_iota == flat, mask.reshape(-1), False).astype(
                jnp.int32
            )
        ) > 0

    def reset_fn(key: jax.Array) -> MazeState:
        key, k = jax.random.split(key)
        idx = jax.random.randint(k, (), 0, background_j.shape[0])
        return MazeState(
            pos=background_j[idx],
            dir=jnp.int32(3),
            step_count=jnp.int32(0),
            key=key,
        )

    def step_fn(state: MazeState, action: jax.Array):
        action = jnp.clip(jnp.asarray(action).reshape(()).astype(jnp.int32), 0, 4)
        nxt = state.pos + action_vec[action]
        inb = (nxt[0] >= 0) & (nxt[1] >= 0) & (nxt[0] < S0) & (nxt[1] < S1)
        can_move = inb & _cell(can_enter, nxt) & (action != 0)
        pos = jnp.where(can_move, nxt, state.pos)
        dir = jnp.where(can_move, act_to_dir[action], state.dir)

        on_flag = _cell(flag_mask, pos)
        reward = cfg.flag_reward * on_flag.astype(jnp.float32)
        terminated = on_flag
        if cfg.obstacle_penalty != 0:
            on_obs = _cell(obstacle_mask, pos)
            reward = reward - cfg.obstacle_penalty * on_obs.astype(jnp.float32)
            terminated = terminated | on_obs
        reward = reward - cfg.step_penalty

        step_count = state.step_count + 1
        truncated = step_count >= cfg.max_steps
        new_state = MazeState(
            pos=pos, dir=dir, step_count=step_count, key=state.key
        )
        return (
            new_state,
            obs_fn(new_state),
            reward,
            terminated,
            truncated,
            info_fn(new_state),
        )

    # ---- observations ----------------------------------------------------
    base_map_np = np.zeros(fm.shape, dtype=np.float64)
    base_map_np[fm == BACKGROUND] = BACKGROUND
    base_map_np[fm == M_OBSTACLE] = M_OBSTACLE
    base_map_np[fm == FLAG] = FLAG
    base_map = jnp.asarray(base_map_np)

    def obs_map(state: MazeState) -> jax.Array:
        """Encoded map, NOT transposed (maze.py:245-260).

        The reference returns float64; the jitted core emits jax's default
        float (f32 under standard config) and the gym adapter casts to
        float64 at the host edge (maze_adapter._np_obs).
        """
        return base_map.at[state.pos[0], state.pos[1]].set(M_AGENT)

    def obs_positional(state: MazeState):
        return {
            "agent": state.pos,
            "background": background_j.reshape(-1),
            "flag": flags_j.reshape(-1),
            "obstacle": obstacles_j.reshape(-1),
        }

    obs_fn = obs_map if cfg.observation_option == "map" else obs_positional

    def info_fn(state: MazeState):
        p = state.pos.astype(jnp.float32)

        def d_area(area):
            if area.shape[0] == 0:
                return jnp.float32(jnp.inf)
            return jnp.min(jnp.linalg.norm(area.astype(jnp.float32) - p, axis=1))

        return {"d_a_f": d_area(flags_j), "d_a_ob": d_area(obstacles_j)}

    return MazeFns(
        reset_fn=reset_fn, step_fn=step_fn, obs_fn=obs_fn, info_fn=info_fn
    )


def make_maze_partial_encode(
    cfg: MazeConfig, view_size: int = 7, see_through_walls: bool = True
):
    """Agent-FOV observation: ``fn(state) -> (1, V, V, 3)`` uint8.

    The in-graph counterpart of the host ``MultiGridEnv.gen_obs`` pipeline
    for the Maze world (reference multigrid.py:485-545 — dead code
    upstream, fixed host-side here).  Cell encodes mirror the reference
    ``_gen_grid`` painting (maze.py:182-197): white Floor background, grey
    Obstacles, red Flags, and the single blue agent.  Defaults follow the
    reference env's declaration ``see_through_walls=True`` (maze.py:107),
    under which the shipped view_size=100 makes the FOV the whole padded
    board — any odd ``view_size`` is supported here, with out-of-bounds
    cells reading as grey obstacles (the Maze world has no wall type; the
    board edge uses its canonical impassable object, core/grid.py slice
    boundary rule).  Differentially tested against the host pipeline in
    tests/test_partial_obs.py.
    """
    from gym_multigrid_tpu.core.world import MazeWorld
    from gym_multigrid_tpu.envs.partial_obs import make_partial_obs_fn

    fm = cfg.field_map
    W, H = fm.shape
    CI = MazeWorld.COLOR_TO_IDX

    typ = np.zeros((W, H), np.int32)
    col = np.zeros((W, H), np.int32)
    col[fm == BACKGROUND] = CI["white"]
    typ[fm == M_OBSTACLE] = M_OBSTACLE
    col[fm == M_OBSTACLE] = CI["grey"]
    typ[fm == FLAG] = FLAG
    col[fm == FLAG] = CI["red"]
    base_typ = jnp.asarray(typ)
    base_col = jnp.asarray(col)

    obs_fn = make_partial_obs_fn(
        W, H, view_size,
        wall_encode=(M_OBSTACLE, CI["grey"], 0),
        see_through_walls=see_through_walls,
    )

    def encode_partial(state: MazeState) -> jax.Array:
        x, y = state.pos[0], state.pos[1]
        typ_d = base_typ.at[x, y].set(M_AGENT)
        col_d = base_col.at[x, y].set(CI["blue"])
        ch2 = jnp.zeros((W, H), jnp.int32).at[x, y].set(state.dir)
        planes = jnp.stack([typ_d, col_d, ch2])
        # Obstacles are can_see_through=True (reference object.py:190);
        # nothing in-bounds blocks sight even when see_through_walls=False.
        opaque = jnp.zeros((W, H), bool)
        return obs_fn(planes, opaque, state.pos, state.dir)[None]

    return encode_partial


@functools.cache
def cached_maze(cfg: MazeConfig) -> MazeFns:
    fns = make_maze(cfg)
    return MazeFns(
        reset_fn=jax.jit(fns.reset_fn),
        step_fn=jax.jit(fns.step_fn),
        obs_fn=jax.jit(fns.obs_fn),
        info_fn=jax.jit(fns.info_fn),
    )


def __getattr__(name):
    # Import-path parity with the reference (gym_multigrid/envs/maze.py).
    if name == "MazeSingleAgentEnv":
        from gym_multigrid_tpu.adapters.maze_adapter import MazeSingleAgentEnv

        return MazeSingleAgentEnv
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# ---------------------------------------------------------------------------
# Batched slab math (shared by the XLA batch step and the Pallas kernels,
# ops/pallas_maze.py — same house style as envs/wildfire.py)
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class MazeTables(NamedTuple):
    """Static per-config tables (hashable; closed over by the kernels)."""

    s0: int
    s1: int
    n_cells: int
    flag_reward: float
    obstacle_penalty: float
    step_penalty: float
    max_steps: int
    action_d0: tuple[int, ...]  # row (pos[0]) deltas per action
    action_d1: tuple[int, ...]


def maze_tables(cfg: MazeConfig) -> MazeTables:
    fm = cfg.field_map
    return MazeTables(
        s0=int(fm.shape[0]),
        s1=int(fm.shape[1]),
        n_cells=int(fm.size),
        flag_reward=float(cfg.flag_reward),
        obstacle_penalty=float(cfg.obstacle_penalty),
        step_penalty=float(cfg.step_penalty),
        max_steps=int(cfg.max_steps),
        action_d0=tuple(int(v[0]) for v in CTF_ACTION_TO_VEC),
        action_d1=tuple(int(v[1]) for v in CTF_ACTION_TO_VEC),
    )


def maze_static_inputs(cfg: MazeConfig):
    """(cells (3, N) i32 [can_enter, flag, obstacle], bg (2, n_bg) i32)."""
    fm = cfg.field_map
    N = fm.size
    cells = np.zeros((3, N), dtype=np.int32)
    if cfg.obstacle_penalty != 0:
        cells[0] = 1
    else:
        cells[0] = (fm != M_OBSTACLE).reshape(-1)
    cells[1] = (fm == FLAG).reshape(-1)
    cells[2] = (fm == M_OBSTACLE).reshape(-1)
    bg = np.argwhere(fm == BACKGROUND).astype(np.int32).T.copy()
    return jnp.asarray(cells), jnp.asarray(bg)


def maze_step_math(t: MazeTables, pos, dirs, acts, cells):
    """One maze transition for a (B, ·) slab.  Pure jax, Mosaic-safe.

    pos: (B, 2) i32; dirs: (B, 1) i32; acts: (B, 1) i32
    cells: (3, N) i32 static rows.
    Returns (pos, dirs, reward (B,1) f32, terminated (B,1) i32).
    """
    B = pos.shape[0]
    N = t.n_cells
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    p0, p1 = pos[:, 0:1], pos[:, 1:2]
    acts = jnp.clip(acts.astype(jnp.int32), 0, NUM_ACTIONS - 1)

    d0 = jnp.zeros_like(acts)
    d1 = jnp.zeros_like(acts)
    for a in range(NUM_ACTIONS):
        m = acts == a
        d0 = jnp.where(m, t.action_d0[a], d0)
        d1 = jnp.where(m, t.action_d1[a], d1)
    n0, n1 = p0 + d0, p1 + d1
    inb = (n0 >= 0) & (n1 >= 0) & (n0 < t.s0) & (n1 < t.s1)

    def cell_flag(row, c0, c1):
        q0 = jnp.clip(c0, 0, t.s0 - 1)
        q1 = jnp.clip(c1, 0, t.s1 - 1)
        flat = q0 * t.s1 + q1
        return (
            jnp.sum(
                jnp.where(lane == flat, cells[row][None, :], 0),
                axis=1,
                keepdims=True,
            )
            > 0
        )

    # stay (action 0) never moves (maze.py:276-288 + can_move gate in
    # step_fn above); blocked moves keep pos and dir.
    can_move = inb & cell_flag(0, n0, n1) & (acts != 0)
    p0 = jnp.where(can_move, n0, p0)
    p1 = jnp.where(can_move, n1, p1)
    new_dir = jnp.zeros_like(acts)
    for a, d in enumerate((3, 3, 2, 1, 0)):
        new_dir = jnp.where(acts == a, d, new_dir)
    dirs = jnp.where(can_move, new_dir, dirs)

    on_flag = cell_flag(1, p0, p1)
    reward = t.flag_reward * on_flag.astype(jnp.float32)
    terminated = on_flag
    if t.obstacle_penalty != 0:
        on_obs = cell_flag(2, p0, p1)
        reward = reward - t.obstacle_penalty * on_obs.astype(jnp.float32)
        terminated = terminated | on_obs
    reward = reward - t.step_penalty

    return (
        jnp.concatenate([p0, p1], axis=1),
        dirs,
        reward,
        terminated.astype(jnp.int32),
    )


def maze_reset_math(t: MazeTables, rnd, bg):
    """Uniform spawn over background cells (maze.py:202-205 semantics).

    rnd: (B, 1) uniforms; bg: (2, n_bg) i32.  Returns (pos (B,2), dirs)."""
    B = rnd.shape[0]
    n_bg = bg.shape[1]
    j = jnp.minimum((rnd * n_bg).astype(jnp.int32), n_bg - 1)
    # one-hot reduce instead of an unrolled per-cell select chain (same
    # values, O(1) ops instead of O(n_bg) — matters inside unrolled
    # multi-step kernels).  Both coordinates ride ONE reduce as a packed
    # x|y<<8 word (coords < 256): this reset runs discarded on every
    # not-done step of the episode paths, and its two reduces were 17%
    # of maze device time in the 2026-08-20 xplane profile.
    # Packing needs both coordinates to fit a byte; larger custom maps
    # would silently bleed x into the y field otherwise.
    assert t.s0 <= 256 and t.s1 <= 256, "packed spawn lookup needs dims <= 256"
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, n_bg), 1)
    hit = lane == j
    pk = bg[0] | (bg[1] << 8)  # (n_bg,) static per config
    p = jnp.sum(jnp.where(hit, pk[None, :], 0), axis=1, keepdims=True)
    return (
        jnp.concatenate([p & 255, p >> 8], axis=1),
        jnp.full_like(j, 3),
    )


def make_maze_step_batch(cfg: MazeConfig, use_pallas: bool = False):
    """Whole-batch maze step (BatchedEnv.step_batch contract)."""
    t = maze_tables(cfg)
    cells, bg = maze_static_inputs(cfg)
    fns = make_maze(cfg)

    if use_pallas:
        from gym_multigrid_tpu.ops.pallas_maze import maze_step_slab

        def run_math(pos, dirs, acts):
            return maze_step_slab(t, pos, dirs, acts, cells)

    else:

        def run_math(pos, dirs, acts):
            return maze_step_math(t, pos, dirs, acts, cells)

    def step_batch(states: MazeState, actions: jax.Array):
        B = states.pos.shape[0]
        # The maze transition consumes no randomness (maze.py:271-307 is
        # deterministic given the action); keys advance only on reset, same
        # as the per-env step_fn — skipping the B per-step threefry splits
        # is worth ~10% throughput at batch 8192.
        pos, dirs, reward, term = run_math(
            states.pos.reshape(B, 2),
            states.dir.reshape(B, 1),
            jnp.asarray(actions).reshape(B, 1).astype(jnp.int32),
        )
        step_count = states.step_count + 1
        new_states = MazeState(
            pos=pos,
            dir=dirs.reshape(B),
            step_count=step_count,
            key=states.key,
        )
        obs = jax.vmap(fns.obs_fn)(new_states)
        info = jax.vmap(fns.info_fn)(new_states)
        return (
            new_states,
            obs,
            reward[:, 0],
            term[:, 0].astype(bool),
            step_count >= cfg.max_steps,
            info,
        )

    return step_batch
