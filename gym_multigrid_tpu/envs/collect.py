"""Collect env family — TPU-native functional engine.

Reference parity target: gym_multigrid/envs/collect_game.py (CollectGameEnv
and its layout subclasses) + the shared machinery in multigrid.py.  The
re-design replaces the mutable ``Grid`` of Python objects with two flat int
planes (object id, color id) in HBM; ``reset`` and ``step`` are pure
functions built from a static placement plan so the whole transition jits,
vmaps over an env batch and shards over a TPU mesh.

Semantics preserved exactly (per-cell transition, reward, termination):

* NESW moves (reference core/agent.py:230-264 via collect_game.py:191-207).
* Random agent move order per step; later movers see earlier movers' grid
  (np.random.permutation at collect_game.py:186 -> jax.random.permutation).
* Pickup: ball removed, (optional) respawn sampled uniformly over empty
  cells of the respawn rect *before* the agent moves in — so the vacated
  ball cell is a legal respawn target but the agent's pre-move cell is not
  (reference order collect_game.py:132-147: grid.set(None) -> _respawn ->
  move).  Faithful quirk: if the respawn lands on that vacated cell, the
  agent's subsequent move overwrites the new ball and the board permanently
  loses one ball, exactly like the reference (collect_game.py:169-176 sets
  the agent unconditionally after _handle_pickup).
* Reward += ball.reward flat, no decay (collect_game.py:121-127).
* terminated iff (not respawn) and collected == num_balls
  (collect_game.py:208-209); truncated at max_steps (210-211).
* Obs = full-grid uint8 (W, H, 3) encode (grid.py:223-252): channel 0 object
  id, channel 1 color id, channel 2 = agent direction (always 3 in Collect:
  place_agent dir default, multigrid.py:374, never mutated by
  CollectGameEnv.move_agent).

Known reference bugs resolved to documented intent (SURVEY.md §2.2): the
``num_balls`` int/list isinstance checks and the kwargs-less
``CollectGameQuadrantsRespawn.__init__`` are fixed so every registered id
constructs; layout semantics follow the subclass bodies verbatim (including
CollectGameRooms' extra balls, collect_game.py:349-362).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from gym_multigrid_tpu.core.constants import COLLECT_ACTION_TO_VEC, COLOR_TO_IDX
from gym_multigrid_tpu.core.world import CollectWorld
from gym_multigrid_tpu.ops.sampling import get_flat, masked_uniform_choice, set_flat

# CollectWorld object ids (core/world.py:54-64)
EMPTY = CollectWorld.OBJECT_TO_IDX["empty"]
WALL = CollectWorld.OBJECT_TO_IDX["wall"]
BALL = CollectWorld.OBJECT_TO_IDX["ball"]
AGENT = CollectWorld.OBJECT_TO_IDX["agent"]
WALL_COLOR = COLOR_TO_IDX["grey"]
AGENT_DIR = 3  # place_agent default direction (multigrid.py:374)

Layout = Literal["even", "quadrants", "rooms", "quadrants_respawn"]


@dataclass(frozen=True)
class CollectConfig:
    """Static Collect configuration (hashable -> usable as a jit constant).

    Field semantics mirror the reference ctor kwargs
    (collect_game.py:17-72 and gym_multigrid/__init__.py registrations).
    """

    size: int = 10
    num_balls: int = 15
    agents_index: tuple[int, ...] = (3, 5)
    balls_index: tuple[int, ...] = (0, 1, 2)
    balls_reward: tuple[float, ...] = (1.0, 1.0, 1.0)
    respawn: bool = False
    max_steps: int = 100
    layout: Layout = "even"
    fixed_horizon: bool = False  # CollectGameRoomsFixedHorizon (collect_game.py:364-370)

    def __post_init__(self):
        # Early, readable errors; impossible placements would otherwise
        # surface as degenerate masked picks deep inside reset tracing.
        # (num_balls % num_ball_types floors silently, like the
        # reference's num_balls_per_type division, collect_game.py:264.)
        if self.size < 4:
            raise ValueError(
                f"size must be >= 4 (walled perimeter + interior), "
                f"got {self.size}"
            )
        if len(self.agents_index) < 1:
            raise ValueError("agents_index must name at least one agent")
        if len(self.balls_index) < 1:
            raise ValueError("balls_index must name at least one ball type")
        if len(self.balls_reward) < len(self.balls_index):
            raise ValueError(
                f"balls_reward has {len(self.balls_reward)} entries for "
                f"{len(self.balls_index)} ball types"
            )
        if self.max_steps < 1:
            raise ValueError(f"max_steps must be >= 1, got {self.max_steps}")
        # Layout-aware capacity: every group of balls sharing a placement
        # rect must fit that rect's non-wall cells, and everything placed
        # (incl. the rooms layout's extra balls) must fit the free board.
        from collections import Counter

        wall = _wall_mask(self)
        plan = build_plan(self)
        rects = np.asarray(plan.ball_rects, dtype=bool)
        for key, cnt in Counter(r.tobytes() for r in rects).items():
            rect = np.frombuffer(key, dtype=bool)
            avail = int((rect & ~wall).sum())
            if cnt > avail:
                raise ValueError(
                    f"layout {self.layout!r} places {cnt} balls into a "
                    f"region with only {avail} free cells "
                    f"(size={self.size}, num_balls={self.num_balls})"
                )
        free = int((~wall).sum())
        if len(plan.ball_colors) + len(self.agents_index) > free:
            raise ValueError(
                f"{len(plan.ball_colors)} balls + "
                f"{len(self.agents_index)} agents cannot fit the {free} "
                f"free cells of a {self.size}x{self.size} "
                f"{self.layout!r} board"
            )

    @property
    def width(self) -> int:
        return self.size

    @property
    def height(self) -> int:
        return self.size

    @property
    def num_agents(self) -> int:
        return len(self.agents_index)

    @property
    def num_ball_types(self) -> int:
        return len(self.balls_index)

    @property
    def num_cells(self) -> int:
        return self.size * self.size


@jax.tree_util.register_dataclass
@dataclass
class CollectState:
    """Per-env state pytree. Grid planes are flat, idx = y*W + x
    (same cell layout as reference Grid.grid, grid.py:56-64)."""

    grid_obj: jax.Array  # (N,) int32 object ids
    grid_color: jax.Array  # (N,) int32 color ids
    # Reward-table slot of the ball occupying each cell (0 where no ball):
    # the reference pays each Ball *instance* its constructor reward
    # (collect_game.py:146 fwd_cell.reward), which per-color tables cannot
    # express when colors repeat or respawn rewards differ from placement
    # rewards (quadrants_respawn originals are hardcoded reward 1,
    # collect_game.py:391, while respawns pay balls_reward[color], :409).
    grid_slot: jax.Array  # (N,) int32
    agent_pos: jax.Array  # (n_agents, 2) int32 (x, y)
    collected: jax.Array  # () int32
    step_count: jax.Array  # () int32
    info_counts: jax.Array  # (n_agents, num_ball_types) int32
    key: jax.Array  # PRNG key


def _rect_mask(
    width: int, height: int, top: tuple[int, int], size: tuple[int, int]
) -> np.ndarray:
    """Flat bool mask of the inclusive sampling rect used by place_obj.

    Reference place_obj samples x in [top0, min(top0+size0, W-1)] and
    y in [top1, min(top1+size1, H-1)], both inclusive because _rand_int is
    stdlib random.randint (multigrid.py:225-230, 316-321).
    """
    x0, y0 = max(top[0], 0), max(top[1], 0)
    x1 = min(x0 + size[0], width - 1)
    y1 = min(y0 + size[1], height - 1)
    mask = np.zeros((height, width), dtype=bool)
    mask[y0 : y1 + 1, x0 : x1 + 1] = True
    return mask.reshape(-1)


def _wall_mask(cfg: CollectConfig) -> np.ndarray:
    """(H*W,) flat bool: perimeter walls + rooms inner walls."""
    w, h = cfg.width, cfg.height
    m = np.zeros((h, w), dtype=bool)  # [y, x]
    m[0, :] = m[h - 1, :] = True
    m[:, 0] = m[:, w - 1] = True
    if cfg.layout in ("rooms",):
        # Inner walls (collect_game.py:315-320; uses `width` for both axes)
        ws = w // 2 - 1
        m[w // 2, 0:ws] = True  # horz_wall(0, w//2, ws)
        m[w // 2, w - ws : w] = True  # horz_wall(w-ws, w//2, ws)
        m[0:ws, w // 2] = True  # vert_wall(w//2, 0, ws)
        m[w - ws : w, w // 2] = True  # vert_wall(w//2, w-ws, ws)
    return m.reshape(-1)


@dataclass(frozen=True)
class _PlacementPlan:
    """Static reset program: sequential uniform-empty placements."""

    # Per-ball: color id, reward, flat rect mask. Order matters (sequential
    # rejection sampling in the reference depends on prior placements).
    ball_colors: tuple[int, ...]
    ball_rewards: tuple[float, ...]
    ball_rects: np.ndarray  # (n_balls, N) bool
    balls_before_agents: bool
    # Agents: one of fixed positions / uniform-empty rects / coord choice.
    agent_fixed: tuple[tuple[int, int], ...] | None
    agent_choice_coords: np.ndarray | None  # (n_choices, 2) or None
    # Respawn rect per ball color id (N,) — whole grid for plain respawn,
    # the color's partition for quadrants_respawn (collect_game.py:401-409).
    respawn_rects: np.ndarray  # (max_color+1, N) bool


def build_plan(cfg: CollectConfig) -> _PlacementPlan:
    w, h = cfg.width, cfg.height
    n = cfg.num_cells
    full = _rect_mask(w, h, (0, 0), (w, h))

    colors: list[int] = []
    rewards: list[float] = []
    rects: list[np.ndarray] = []
    agent_fixed = None
    agent_choice = None
    balls_before_agents = True

    num_types = cfg.num_ball_types
    per_type = cfg.num_balls // num_types

    if cfg.layout == "even":
        # collect_game.py:236-259
        for t in range(num_types):
            for _ in range(per_type):
                colors.append(cfg.balls_index[t])
                rewards.append(cfg.balls_reward[t])
                rects.append(full)
    elif cfg.layout == "quadrants":
        # collect_game.py:266-300
        partitions = [(0, 0), (w // 2 - 1, h // 2 - 1), (w // 2 - 1, 0), (0, h // 2)]
        psize = (w // 2 - 1, h // 2 - 1)
        for t in range(num_types):
            for _ in range(per_type):
                colors.append(cfg.balls_index[t])
                rewards.append(cfg.balls_reward[t])
                rects.append(_rect_mask(w, h, partitions[t], psize))
        agent_fixed = tuple((1 + i, h - 2) for i in range(cfg.num_agents))
    elif cfg.layout == "rooms":
        # collect_game.py:306-362 — agents first, then balls (with the
        # reference's extra ball into partitions[3] at each type boundary).
        balls_before_agents = False
        partitions = [(0, 0), (w // 2 + 1, w // 2 + 1), (w // 2 + 1, 0), (0, w // 2 + 1)]
        psize = (w // 2 - 1, w // 2 - 1)
        num_ball = round(cfg.num_balls / num_types)
        top = partitions[0]
        index = 0
        for ball in range(cfg.num_balls):
            if ball % num_ball == 0:
                index = ball // num_ball
                top = partitions[index]
                colors.append(cfg.balls_index[index])
                rewards.append(cfg.balls_reward[index])
                rects.append(_rect_mask(w, h, partitions[3], psize))
            colors.append(cfg.balls_index[index])
            rewards.append(cfg.balls_reward[index])
            rects.append(_rect_mask(w, h, top, psize))
        agent_choice = np.array(
            [
                (w // 2, w // 2),
                (w // 2 - 1, w // 2 - 1),
                (w // 2 - 1, w // 2 + 1),
                (w // 2 + 1, w // 2 + 1),
                (w // 2 + 1, w // 2 - 1),
            ],
            dtype=np.int32,
        )
    elif cfg.layout == "quadrants_respawn":
        # collect_game.py:376-399 — ball color = partition index, reward 1.
        partitions = [(0, 0), (w // 2 - 1, h // 2 - 1), (w // 2 - 1, 0)]
        psize = (w // 2 + 1, h // 2 + 1)
        npt = cfg.num_balls // len(partitions)
        top = partitions[0]
        index = 0
        for ball in range(cfg.num_balls):
            if ball % npt == 0:
                index = ball // npt
                top = partitions[index]
            colors.append(index)
            rewards.append(1.0)
            rects.append(_rect_mask(w, h, top, psize))
        agent_fixed = tuple((1 + i, h - 2) for i in range(cfg.num_agents))
    else:
        raise ValueError(f"unknown layout {cfg.layout}")

    max_color = max(list(cfg.balls_index) + colors)
    respawn_rects = np.tile(full, (max_color + 1, 1))
    if cfg.layout == "quadrants_respawn":
        partitions = [(0, 0), (w // 2 - 1, h // 2 - 1), (w // 2 - 1, 0)]
        psize = (w // 2 + 1, h // 2 + 1)
        for c, top in enumerate(partitions):
            if c <= max_color:
                respawn_rects[c] = _rect_mask(w, h, top, psize)

    return _PlacementPlan(
        ball_colors=tuple(colors),
        ball_rewards=tuple(rewards),
        ball_rects=np.stack(rects) if rects else np.zeros((0, n), dtype=bool),
        balls_before_agents=balls_before_agents,
        agent_fixed=agent_fixed,
        agent_choice_coords=agent_choice,
        respawn_rects=respawn_rects,
    )


def reward_slot_tables(cfg: CollectConfig, plan: _PlacementPlan):
    """Per-slot reward/info tables.

    Slot layout: [0, n_balls) = placement order (originals pay their
    placement reward, plan.ball_rewards — per Ball instance like the
    reference); [n_balls, n_balls + n_colors) = respawned balls of color c
    (they pay balls_reward[color], collect_game.py:129-130, 409).  Info
    counters are keyed by the ball's color id like the reference
    (_handle_pickup uses COLOR_TO_IDX[color], collect_game.py:141-147),
    clamped into the counter table.
    """
    max_color = plan.respawn_rects.shape[0] - 1
    nb_r = len(cfg.balls_reward)
    nt = cfg.num_ball_types

    def respawn_reward(c):
        # balls_reward[color]; the reference would IndexError for color ids
        # beyond the list — clamp to implement the evident intent.
        return float(cfg.balls_reward[min(c, nb_r - 1)])

    slot_rewards = np.array(
        list(plan.ball_rewards)
        + [respawn_reward(c) for c in range(max_color + 1)],
        dtype=np.float32,
    )
    slot_info = np.array(
        [min(int(c), nt - 1) for c in plan.ball_colors]
        + [min(c, nt - 1) for c in range(max_color + 1)],
        dtype=np.int32,
    )
    return slot_rewards, slot_info, len(plan.ball_colors)


def make_collect(cfg: CollectConfig):
    """Build (reset_fn, step_fn, encode_fn) closures over static tables.

    All three are pure and jit/vmap/shard_map-compatible.
    """
    plan = build_plan(cfg)
    w, h = cfg.width, cfg.height
    n = cfg.num_cells
    n_agents = cfg.num_agents

    wall = jnp.asarray(_wall_mask(cfg))
    ball_rects = jnp.asarray(plan.ball_rects)
    respawn_rects = jnp.asarray(plan.respawn_rects)
    max_color = plan.respawn_rects.shape[0] - 1
    slot_rewards_np, slot_info_np, n_balls_planned = reward_slot_tables(cfg, plan)
    slot_rewards = jnp.asarray(slot_rewards_np)
    slot_info = jnp.asarray(slot_info_np)
    agent_colors = jnp.asarray(np.array(cfg.agents_index, dtype=np.int32))
    action_vec = jnp.asarray(COLLECT_ACTION_TO_VEC)

    def _flat(x, y):
        return y * w + x

    def _place_uniform(grid_obj, grid_color, grid_slot, key, rect, color_id, slot_id):
        """One sequential uniform-empty ball placement (replaces place_obj).

        Guarded against an empty mask: the reference would spin forever in
        rejection sampling (multigrid.py:308-312); here the placement
        becomes a no-op instead of corrupting a wall cell.
        """
        mask = rect & (grid_obj == EMPTY)
        ok = jnp.any(mask)
        idx = masked_uniform_choice(key, mask)
        grid_obj = set_flat(grid_obj, idx, BALL, ok)
        grid_color = set_flat(grid_color, idx, color_id, ok)
        grid_slot = set_flat(grid_slot, idx, slot_id, ok)
        return grid_obj, grid_color, grid_slot

    def reset_fn(key: jax.Array) -> CollectState:
        key, *ball_keys = jax.random.split(key, 1 + len(plan.ball_colors))
        key, *agent_keys = jax.random.split(key, 1 + n_agents)

        grid_obj = jnp.where(wall, WALL, EMPTY).astype(jnp.int32)
        grid_color = jnp.where(wall, WALL_COLOR, 0).astype(jnp.int32)
        grid_slot = jnp.zeros((n,), dtype=jnp.int32)
        agent_pos = jnp.zeros((n_agents, 2), dtype=jnp.int32)

        ball_color_arr = jnp.asarray(np.array(plan.ball_colors, dtype=np.int32))

        def place_balls(grid_obj, grid_color, grid_slot):
            if not plan.ball_colors:
                return grid_obj, grid_color, grid_slot

            # One traced body scanned over the static placement plan — same
            # sequential semantics as the reference's per-ball place_obj
            # loop, but O(1) trace/compile size.
            def body(carry, xs):
                g_obj, g_col, g_slot = carry
                k, rect, color, slot = xs
                g_obj, g_col, g_slot = _place_uniform(
                    g_obj, g_col, g_slot, k, rect, color, slot
                )
                return (g_obj, g_col, g_slot), None

            (grid_obj, grid_color, grid_slot), _ = jax.lax.scan(
                body,
                (grid_obj, grid_color, grid_slot),
                (
                    jnp.stack(ball_keys),
                    ball_rects,
                    ball_color_arr,
                    jnp.arange(len(plan.ball_colors), dtype=jnp.int32),
                ),
            )
            return grid_obj, grid_color, grid_slot

        def place_agents(grid_obj, grid_color, grid_slot, agent_pos):
            for i in range(n_agents):
                if plan.agent_fixed is not None:
                    # put_obj: unconditional overwrite (multigrid.py:341-348)
                    x, y = plan.agent_fixed[i]
                    idx = jnp.int32(_flat(x, y))
                    pos = jnp.array([x, y], dtype=jnp.int32)
                elif plan.agent_choice_coords is not None:
                    # _rand_elem over possible_coords (collect_game.py:330-332;
                    # _rand_int is inclusive -> uniform over all entries)
                    coords = jnp.asarray(plan.agent_choice_coords)
                    j = jax.random.randint(agent_keys[i], (), 0, coords.shape[0])
                    pos = coords[j]
                    idx = _flat(pos[0], pos[1])
                else:
                    # place_obj rejection sampling == uniform over empty
                    mask = (grid_obj == EMPTY)
                    idx = masked_uniform_choice(agent_keys[i], mask)
                    pos = jnp.stack([idx % w, idx // w]).astype(jnp.int32)
                grid_obj = set_flat(grid_obj, idx, AGENT)
                grid_color = set_flat(grid_color, idx, agent_colors[i])
                grid_slot = set_flat(grid_slot, idx, 0)
                agent_pos = agent_pos.at[i].set(pos)
            return grid_obj, grid_color, grid_slot, agent_pos

        if plan.balls_before_agents:
            grid_obj, grid_color, grid_slot = place_balls(
                grid_obj, grid_color, grid_slot
            )
            grid_obj, grid_color, grid_slot, agent_pos = place_agents(
                grid_obj, grid_color, grid_slot, agent_pos
            )
        else:
            grid_obj, grid_color, grid_slot, agent_pos = place_agents(
                grid_obj, grid_color, grid_slot, agent_pos
            )
            grid_obj, grid_color, grid_slot = place_balls(
                grid_obj, grid_color, grid_slot
            )

        return CollectState(
            grid_obj=grid_obj,
            grid_color=grid_color,
            grid_slot=grid_slot,
            agent_pos=agent_pos,
            collected=jnp.int32(0),
            step_count=jnp.int32(0),
            info_counts=jnp.zeros((n_agents, cfg.num_ball_types), dtype=jnp.int32),
            key=key,
        )

    def step_fn(state: CollectState, actions: jax.Array):
        """One env step. actions: (n_agents,) int32.

        Returns (state', obs, rewards(n_agents,), terminated, truncated,
        info_counts).
        """
        key, k_perm = jax.random.split(state.key)
        key, *k_spawn = jax.random.split(key, 1 + n_agents)
        perm = jax.random.permutation(k_perm, n_agents)

        grid_obj = state.grid_obj
        grid_color = state.grid_color
        grid_slot = state.grid_slot
        agent_pos = state.agent_pos
        collected = state.collected
        info_counts = state.info_counts
        rewards = jnp.zeros((n_agents,), dtype=jnp.float32)

        # Sequential random-order move resolution: later movers see earlier
        # movers' grid (collect_game.py:186-207). n_agents is tiny & static
        # -> unroll; each iteration is a handful of VPU-friendly masked ops.
        for t in range(n_agents):
            i = perm[t]
            act = actions[i]
            pos = agent_pos[i]
            # Unknown action ids fall through the reference's if/elif chain
            # as a no-op (collect_game.py:191-207) — don't clamp-index.
            valid = (act >= 0) & (act < 4)
            delta = jnp.where(valid, action_vec[jnp.clip(act, 0, 3)], 0)
            nxt = pos + delta
            # Perimeter walls guarantee in-bounds; clamp defensively so the
            # gather is always valid (reference asserts, grid.py:61-64).
            nxt = jnp.clip(nxt, 0, jnp.array([w - 1, h - 1]))
            nidx = _flat(nxt[0], nxt[1])
            oidx = _flat(pos[0], pos[1])

            cell = get_flat(grid_obj, nidx)
            is_ball = cell == BALL
            do_move = is_ball | (cell == EMPTY)

            ball_color = get_flat(grid_color, nidx)
            ball_color = jnp.clip(ball_color, 0, max_color)
            ball_slot = jnp.clip(
                get_flat(grid_slot, nidx), 0, slot_rewards.shape[0] - 1
            )

            # 1) pickup: remove ball (collect_game.py:140)
            grid_obj = set_flat(grid_obj, nidx, EMPTY, is_ball)
            grid_color = set_flat(grid_color, nidx, 0, is_ball)
            grid_slot = set_flat(grid_slot, nidx, 0, is_ball)
            # 2) respawn before the agent moves in (collect_game.py:129-144);
            # guarded no-op when the partition has no empty cell (the
            # reference would spin forever, multigrid.py:308-312)
            if cfg.respawn:
                rmask = respawn_rects[ball_color] & (grid_obj == EMPTY)
                ok = is_ball & jnp.any(rmask)
                ridx = masked_uniform_choice(k_spawn[t], rmask)
                grid_obj = set_flat(grid_obj, ridx, BALL, ok)
                grid_color = set_flat(grid_color, ridx, ball_color, ok)
                # respawned balls pay balls_reward[color]
                # (collect_game.py:129-130, 409)
                grid_slot = set_flat(
                    grid_slot, ridx, n_balls_planned + ball_color, ok
                )
            # bookkeeping (collect_game.py:145-147): reward is the picked
            # Ball instance's own reward, via its slot
            collected = collected + is_ball.astype(jnp.int32)
            rewards = rewards.at[i].add(
                jnp.where(is_ball, slot_rewards[ball_slot], 0.0)
            )
            islot = slot_info[ball_slot]
            bump = (
                jax.nn.one_hot(i, n_agents, dtype=jnp.int32)[:, None]
                * jax.nn.one_hot(islot, cfg.num_ball_types, dtype=jnp.int32)[None, :]
            )
            info_counts = info_counts + jnp.where(is_ball, bump, 0)
            # 3) move (collect_game.py:174-181)
            grid_obj = set_flat(grid_obj, nidx, AGENT, do_move)
            grid_color = set_flat(grid_color, nidx, agent_colors[i], do_move)
            grid_slot = set_flat(grid_slot, nidx, 0, do_move)
            grid_obj = set_flat(grid_obj, oidx, EMPTY, do_move)
            grid_color = set_flat(grid_color, oidx, 0, do_move)
            agent_pos = agent_pos.at[i].set(jnp.where(do_move, nxt, pos))

        step_count = state.step_count + 1
        if cfg.respawn or cfg.fixed_horizon:
            terminated = jnp.bool_(False)
        else:
            terminated = collected == cfg.num_balls
        truncated = step_count >= cfg.max_steps

        new_state = CollectState(
            grid_obj=grid_obj,
            grid_color=grid_color,
            grid_slot=grid_slot,
            agent_pos=agent_pos,
            collected=collected,
            step_count=step_count,
            info_counts=info_counts,
            key=key,
        )
        obs = encode_fn(new_state)
        return new_state, obs, rewards, terminated, truncated, info_counts

    def encode_fn(state: CollectState) -> jax.Array:
        """Full-grid (W, H, 3) uint8 encode (grid.py:223-252).

        array[x, y] = (obj, color, dir if agent else 0); Collect agents keep
        dir == 3 forever (multigrid.py:374; move_agent never touches dir).
        """
        obj = state.grid_obj.reshape(h, w).T
        color = state.grid_color.reshape(h, w).T
        ch2 = jnp.where(obj == AGENT, AGENT_DIR, 0)
        return jnp.stack([obj, color, ch2], axis=-1).astype(jnp.uint8)

    return reset_fn, step_fn, encode_fn


def make_collect_partial_encode(
    cfg: CollectConfig, view_size: int = 7, see_through_walls: bool = False
):
    """Batched agent-FOV observations: ``fn(state) -> (n_agents, V, V, 3)``.

    The in-graph counterpart of the host ``MultiGridEnv.gen_obs`` pipeline
    (reference multigrid.py:485-545 — dead code upstream, fixed host-side
    here): view slice + rotate-to-face-up + shadow-cast visibility + masked
    encode, vmappable over envs.  Collect agents always face dir 3
    (multigrid.py:374 place_agent default; move_agent never turns), matching
    the host engine.  Differentially tested against the host pipeline in
    tests/test_partial_obs.py.
    """
    from gym_multigrid_tpu.envs.partial_obs import make_partial_obs_fn

    w = h = cfg.size
    obs_fn = make_partial_obs_fn(
        w, h, view_size,
        wall_encode=(WALL, WALL_COLOR, 0),
        see_through_walls=see_through_walls,
    )

    def encode_partial(state: CollectState) -> jax.Array:
        obj = state.grid_obj.reshape(h, w).T  # xy-indexed (W, H)
        color = state.grid_color.reshape(h, w).T
        ch2 = jnp.where(obj == AGENT, AGENT_DIR, 0)
        planes = jnp.stack([obj, color, ch2])
        opaque = obj == WALL  # walls are the only sight blockers in Collect
        dirs = jnp.full((state.agent_pos.shape[0],), AGENT_DIR, jnp.int32)
        return jax.vmap(
            lambda p, d: obs_fn(planes, opaque, p, d)
        )(state.agent_pos, dirs)

    return encode_partial


@functools.cache
def cached_collect(cfg: CollectConfig):
    """Memoized (reset, step, encode) with jit applied."""
    reset_fn, step_fn, encode_fn = make_collect(cfg)
    return jax.jit(reset_fn), jax.jit(step_fn), jax.jit(encode_fn)


def __getattr__(name):
    # Import-path parity with the reference
    # (gym_multigrid/envs/collect_game.py defines the Env classes).
    _adapter_classes = (
        "CollectGameEnv",
        "CollectGameEvenDist",
        "CollectGameQuadrants",
        "CollectGameRooms",
        "CollectGameRoomsFixedHorizon",
        "CollectGameQuadrantsRespawn",
    )
    if name in _adapter_classes:
        from gym_multigrid_tpu.adapters import gym_adapter

        return getattr(gym_adapter, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
