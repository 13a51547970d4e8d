"""Capture-the-Flag env family — TPU-native functional engine.

Reference parity target: gym_multigrid/envs/ctf.py (Ctf1v1Env, ctf.py:50-654;
CtFMvNEnv, ctf.py:657-1433).  The re-design observes that *all* CtF state
beyond agent positions / per-agent terminated flags is static per map:
territories, flags and obstacles never move, and the grid an agent sees is
"static map + current agent positions".  The whole step is therefore a
handful of masked vector ops over tiny arrays — no grid scatter at all —
which jits, vmaps over an env batch and shards over a TPU mesh.

Semantics preserved exactly (verified against the reference in
tests/test_ctf.py):

* Moves: stay/left/down/right/up -> (0,0),(0,-1),(-1,0),(0,1),(1,0)
  (ctf.py:458-470, 1189-1201); bounds check replicates the reference's
  width/height index order verbatim (ctf.py:472-477 checks pos[0] against
  ``width`` = field_map.shape[1]); blocked by zero-penalty obstacles and by
  any agent (defeated agents keep blocking, agent objects stay on the grid).
* Move order: 1v1 blue-then-red (ctf.py:503-510); MvN a fresh uniform
  permutation of all agents per step, terminated agents skip
  (ctf.py:1240-1251).  Later movers see earlier movers' positions.
* MvN collision flag: with obstacle_penalty != 0, bumping into *any* agent
  cell sets a sticky ``collided`` (ctf.py:1231-1238) — including bumping
  into yourself via ``stay`` (the reference reads its own grid cell) — and
  every collided blue costs obstacle_penalty *per step* while the flag stays
  set (ctf.py:1316-1332).  Penalty-bearing obstacles are can_overlap
  (object.py:200-201), so walking onto an obstacle never sets collided.
* Red actions come from scripted policies evaluated on the *pre-move*
  positional observation (ctf.py:556-559, 1297-1301), compiled in-graph via
  the closed-form optimal-step rule (see _optimal_action) that matches the
  reference A*'s tie-breaking exactly (policy/ctf/utils.py docstring).
* Battles: pairwise Euclidean distance <= battle_range, sequential over
  (blue, red) pairs in row-major order with mid-loop terminated updates
  (ctf.py:1358-1420); outcome Bernoulli with p(blue) from the
  (blue-in-own, red-in-own) truth table (50/50 on TT/FF, randomness on TF,
  1-randomness on FT; ctf.py:609-627).  Own-territory membership includes
  the own flag cell (ctf.py:133-141).
* Rewards: +-flag_reward on flag-cell match (all agents checked, including
  terminated); +-battle_reward per battle; -obstacle_penalty (1v1: blue on
  an obstacle cell ends the episode, ctf.py:638-647 intent — the reference
  crashes on ndarray membership there; MvN: per collided blue per step);
  step penalty -step_penalty (1v1) / -step_penalty*num_blue (MvN).
* terminated: any flag captured; 1v1 blue losing a battle; MvN all blue
  terminated.  truncated at max_steps.

Known deviations (documented intent, SURVEY.md §2.2): invalid action ids are
clamped to [0, 4] instead of raising, and the 1v1 obstacle-penalty branch
implements its evident intent instead of the reference's ValueError-on-
ndarray-membership crash.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Literal, TypeAlias, TypedDict

import jax
import jax.numpy as jnp
import numpy as np

from gym_multigrid_tpu.core.constants import CTF_ACTION_TO_VEC
from gym_multigrid_tpu.core.world import CtfWorld

_W = CtfWorld.OBJECT_TO_IDX
BLUE_TERRITORY = _W["blue_territory"]
RED_TERRITORY = _W["red_territory"]
BLUE_AGENT = _W["blue_agent"]
RED_AGENT = _W["red_agent"]
BLUE_FLAG = _W["blue_flag"]
RED_FLAG = _W["red_flag"]
OBSTACLE = _W["obstacle"]

A_STAY, A_LEFT, A_DOWN, A_RIGHT, A_UP = 0, 1, 2, 3, 4
NUM_ACTIONS = 5

ObservationOption = Literal["positional", "map", "flattened"]


# -- public typing surface (reference gym_multigrid/envs/ctf.py:18-48) ------
#
# Reference users annotate against these names; the adapter's dict obs /
# game_stats carry exactly these keys (adapters/ctf_adapter.py).  int64
# arrays, matching the adapter's _np_obs/_get_dict_obs dtypes.


class ObservationDict(TypedDict):
    """1v1 positional observation (single red opponent)."""

    blue_agent: np.ndarray
    red_agent: np.ndarray
    blue_flag: np.ndarray
    red_flag: np.ndarray
    blue_territory: np.ndarray
    red_territory: np.ndarray
    obstacle: np.ndarray
    is_red_agent_defeated: int


class MultiAgentObservationDict(TypedDict):
    """MvN positional observation (flattened agent position lists)."""

    blue_agent: np.ndarray
    red_agent: np.ndarray
    blue_flag: np.ndarray
    red_flag: np.ndarray
    blue_territory: np.ndarray
    red_territory: np.ndarray
    obstacle: np.ndarray
    terminated_agents: np.ndarray


#: Any CtF observation: positional dicts or the map/flattened arrays.
Observation: TypeAlias = (
    "ObservationDict | MultiAgentObservationDict | np.ndarray"
)


class GameStats(TypedDict):
    """Cumulative per-episode event flags (adapter ``.game_stats``)."""

    blue_agent_defeated: list[bool]
    red_agent_defeated: list[bool]
    blue_flag_captured: bool
    red_flag_captured: bool


@dataclass(frozen=True)
class PolicySpec:
    """Static id of an in-graph scripted red policy.

    Mirrors the concrete classes in policy/ctf/heuristic.py; ``randomness``
    is the probability of taking the optimal action
    (reference heuristic.py:84-106).
    """

    kind: Literal["rw", "fight", "capture", "patrol", "patrol_fight"] = "rw"
    randomness: float = 0.75

    def __post_init__(self):
        kinds = ("rw", "fight", "capture", "patrol", "patrol_fight")
        if self.kind not in kinds:
            # Without this, an unknown kind surfaces much later as a
            # NameError inside the traced policy body.
            raise ValueError(
                f"unknown scripted-policy kind {self.kind!r}; "
                f"expected one of {kinds} (custom policies: pass a "
                "BaseAgentPolicy subclass to the adapter instead)"
            )
        if not 0.0 <= self.randomness <= 1.0:
            raise ValueError(
                f"randomness must be in [0, 1], got {self.randomness}"
            )


@dataclass(frozen=True)
class CtfConfig:
    """Static CtF configuration (hashable -> usable as a jit constant).

    ``map_data`` holds the transposed text map exactly as ``load_text_map``
    returns it (utils/map.py; reference utils/map.py:22-39): entry [i][j]
    uses the same (i, j) positions the reference env manipulates.
    """

    map_data: tuple[tuple[int, ...], ...]
    num_blue_agents: int = 1
    num_red_agents: int = 1
    variant: Literal["1v1", "mvn"] = "mvn"
    enemy_policies: tuple[PolicySpec, ...] = (PolicySpec("rw"),)
    battle_range: float = 1.0
    randomness: float = 0.75
    flag_reward: float = 1.0
    battle_reward_ratio: float = 0.25
    obstacle_penalty_ratio: float = 0.0
    step_penalty_ratio: float = 0.01
    max_steps: int = 100
    observation_option: ObservationOption = "positional"
    observation_scaling: float = 1.0

    def __post_init__(self):
        if self.variant not in ("1v1", "mvn"):
            raise ValueError(
                f"variant must be '1v1' or 'mvn', got {self.variant!r}"
            )
        if self.num_blue_agents < 1 or self.num_red_agents < 1:
            raise ValueError(
                "need at least one agent per team, got "
                f"{self.num_blue_agents} blue / {self.num_red_agents} red"
            )
        if self.variant == "1v1" and (
            self.num_blue_agents != 1 or self.num_red_agents != 1
        ):
            raise ValueError(
                "variant='1v1' requires exactly one agent per team "
                f"(got {self.num_blue_agents}v{self.num_red_agents}); "
                "use variant='mvn'"
            )
        if self.max_steps < 1:
            raise ValueError(f"max_steps must be >= 1, got {self.max_steps}")
        if len(self.enemy_policies) != self.num_red_agents:
            # Previously only a bare assert deep in make_ctf (stripped
            # under python -O).
            raise ValueError(
                f"enemy_policies has {len(self.enemy_policies)} specs for "
                f"{self.num_red_agents} red agents"
            )

    @classmethod
    def from_map_path(cls, map_path: str, **kwargs) -> "CtfConfig":
        from gym_multigrid_tpu.utils.map import load_text_map

        fm = load_text_map(map_path).astype(int)
        return cls(map_data=tuple(tuple(row) for row in fm), **kwargs)

    @property
    def field_map(self) -> np.ndarray:
        return np.asarray(self.map_data, dtype=np.int64)

    @property
    def num_agents(self) -> int:
        return self.num_blue_agents + self.num_red_agents

    @property
    def battle_reward(self) -> float:
        return self.battle_reward_ratio * self.flag_reward

    @property
    def obstacle_penalty(self) -> float:
        return self.obstacle_penalty_ratio * self.flag_reward

    @property
    def step_penalty(self) -> float:
        return self.step_penalty_ratio * self.flag_reward


@jax.tree_util.register_dataclass
@dataclass
class CtfState:
    """Per-env state pytree — everything else about the world is static."""

    pos: jax.Array  # (n_agents, 2) int32, blue agents first
    dir: jax.Array  # (n_agents,) int32, render-facing (agent.py:176-182)
    terminated: jax.Array  # (n_agents,) bool
    collided: jax.Array  # (n_agents,) bool, sticky (MvN obstacle_penalty)
    step_count: jax.Array  # () int32
    key: jax.Array  # PRNG key


@dataclass(frozen=True)
class _Tables:
    """Host-precomputed static tables baked into the jitted functions."""

    fm: np.ndarray  # (S0, S1) field map
    blue_flag: np.ndarray  # (2,)
    red_flag: np.ndarray  # (2,)
    blue_territory: np.ndarray  # (n_bt, 2) row-major + flag appended
    red_territory: np.ndarray  # (n_rt, 2)
    obstacle: np.ndarray  # (n_ob, 2)
    can_enter: np.ndarray  # (S0, S1) bool (static cells only)
    blue_mask: np.ndarray  # (S0, S1) bool own-territory incl. flag
    red_mask: np.ndarray  # (S0, S1) bool
    obstacle_mask: np.ndarray  # (S0, S1) bool


@functools.cache
def build_tables(cfg: CtfConfig) -> _Tables:
    fm = cfg.field_map
    blue_flag = np.argwhere(fm == BLUE_FLAG)[0]
    red_flag = np.argwhere(fm == RED_FLAG)[0]
    # Territory lists: np.where row-major order with the flag cell appended
    # (ctf.py:133-141) — index order matters for closest-target tie-breaks.
    blue_territory = np.concatenate(
        [np.argwhere(fm == BLUE_TERRITORY), blue_flag[None]], axis=0
    )
    red_territory = np.concatenate(
        [np.argwhere(fm == RED_TERRITORY), red_flag[None]], axis=0
    )
    obstacle = np.argwhere(fm == OBSTACLE)

    blue_mask = fm == BLUE_TERRITORY
    blue_mask[tuple(blue_flag)] = True
    red_mask = fm == RED_TERRITORY
    red_mask[tuple(red_flag)] = True

    # Cells an agent may enter, agents aside: everything except obstacles
    # with zero penalty (Obstacle.can_overlap <=> penalty != 0,
    # object.py:200-201; unpainted cells are empty -> enterable).
    if cfg.obstacle_penalty != 0:
        can_enter = np.ones_like(fm, dtype=bool)
    else:
        can_enter = fm != OBSTACLE

    return _Tables(
        fm=fm,
        blue_flag=blue_flag,
        red_flag=red_flag,
        blue_territory=blue_territory,
        red_territory=red_territory,
        obstacle=obstacle,
        can_enter=can_enter,
        blue_mask=blue_mask,
        red_mask=red_mask,
        obstacle_mask=fm == OBSTACLE,
    )


def _optimal_action(curr: jax.Array, target: jax.Array) -> jax.Array:
    """First step of the reference-A*-optimal path, closed form.

    The reference a_star returns the lexicographically smallest
    Manhattan-shortest path (policy/ctf/utils.py docstring); with no blocked
    cells its second node has a closed form: decreasing row moves come
    first (smaller row sorts first), then column moves, then increasing row
    moves.  Mapping to actions (heuristic.py:160-173):

      dr < 0            -> down  (-1, 0)
      dr >= 0, dc != 0  -> left/right by sign(dc)
      dr > 0,  dc == 0  -> up    (+1, 0)
      dr = dc = 0       -> stay
    """
    dr = target[0] - curr[0]
    dc = target[1] - curr[1]
    col = jnp.where(dc < 0, A_LEFT, A_RIGHT)
    return jnp.where(
        (dr == 0) & (dc == 0),
        A_STAY,
        jnp.where(dr < 0, A_DOWN, jnp.where(dc != 0, col, A_UP)),
    ).astype(jnp.int32)


def _build_red_policy(spec: PolicySpec, cfg: CtfConfig, t: _Tables):
    """Compile one scripted policy into a pure function.

    fn(pos, terminated, curr_pos, key) -> () int32 action.  ``pos`` and
    ``terminated`` are the pre-move state arrays (the reference evaluates
    policies on the pre-move dict obs, ctf.py:1297-1301).
    """
    n_blue = cfg.num_blue_agents

    if spec.kind == "rw":

        def rw(pos, terminated, curr, key):
            return jax.random.randint(key, (), 0, NUM_ACTIONS, dtype=jnp.int32)

        return rw

    blue_flag = jnp.asarray(t.blue_flag, dtype=jnp.int32)
    red_mask = jnp.asarray(t.red_mask)

    if spec.kind in ("patrol", "patrol_fight"):
        # Border + multiplicity-weighted on-border target pool, computed by
        # the host policy class (identical lists; heuristic.py:321-391).
        from gym_multigrid_tpu.policy.ctf.heuristic import PatrolPolicy

        pp = PatrolPolicy(field_map=t.fm, ego_agent="red")
        border_np = np.asarray(pp.border, dtype=np.int32).reshape(-1, 2)
        targets_np = np.asarray(pp.patrol_targets(), dtype=np.int32).reshape(-1, 2)
        border = jnp.asarray(border_np)
        patrol_pool = jnp.asarray(targets_np)

    def target_fn(pos, terminated, curr, k_target):
        if spec.kind == "capture":
            return blue_flag
        if spec.kind == "fight":
            d = jnp.linalg.norm((pos[:n_blue] - curr).astype(jnp.float32), axis=1)
            return pos[:n_blue][jnp.argmin(d)]
        # patrol / patrol_fight
        on_border = jnp.any(jnp.all(border == curr, axis=1))
        choice = patrol_pool[
            jax.random.randint(k_target, (), 0, patrol_pool.shape[0])
        ]
        d = jnp.linalg.norm((border - curr).astype(jnp.float32), axis=1)
        closest = border[jnp.argmin(d)]
        patrol_target = jnp.where(on_border, choice, closest)
        if spec.kind == "patrol":
            return patrol_target
        # patrol_fight: chase the closest opponent once any opponent stands
        # in ego (red) territory (heuristic.py:434-463).
        bpos = jnp.clip(
            pos[:n_blue], 0, jnp.asarray(t.fm.shape, dtype=jnp.int32) - 1
        )
        opp_in_ego = jnp.any(red_mask[bpos[:, 0], bpos[:, 1]])
        d = jnp.linalg.norm((pos[:n_blue] - curr).astype(jnp.float32), axis=1)
        fight_target = pos[:n_blue][jnp.argmin(d)]
        return jnp.where(opp_in_ego, fight_target, patrol_target)

    def destination(pos, terminated, curr, key):
        k_target, k_gate, k_rand = jax.random.split(key, 3)
        target = target_fn(pos, terminated, curr, k_target)
        optimal = _optimal_action(curr, target)
        random_act = jax.random.randint(k_rand, (), 0, NUM_ACTIONS, dtype=jnp.int32)
        take_optimal = jax.random.bernoulli(k_gate, spec.randomness)
        return jnp.where(take_optimal, optimal, random_act)

    return destination


@dataclass(frozen=True)
class CtfFns:
    """Bundle of pure functions for one CtF config."""

    reset_fn: callable  # key -> CtfState
    step_fn: callable  # (state, blue_actions) -> (state', obs, r, term, trunc, info)
    step_actions_fn: callable  # (state, all_actions) -> same; host policies
    red_actions_fn: callable  # (state, key) -> (n_red,) int32
    obs_fn: callable  # state -> obs pytree
    info_fn: callable  # state -> dict of 11 distance scalars


def make_ctf(cfg: CtfConfig) -> CtfFns:
    t = build_tables(cfg)
    n_blue, n_red = cfg.num_blue_agents, cfg.num_red_agents
    n_agents = cfg.num_agents
    mvn = cfg.variant == "mvn"
    S0, S1 = t.fm.shape
    # Reference bounds order: pos[0] checked against width = shape[1],
    # pos[1] against height = shape[0] (ctf.py:472-477, 1203-1208).
    bound0, bound1 = S1, S0

    specs = tuple(cfg.enemy_policies)
    assert len(specs) == n_red, "one PolicySpec per red agent"
    policy_fns = [_build_red_policy(s, cfg, t) for s in specs]

    can_enter = jnp.asarray(t.can_enter)
    blue_mask = jnp.asarray(t.blue_mask)
    red_mask = jnp.asarray(t.red_mask)
    obstacle_mask = jnp.asarray(t.obstacle_mask)
    blue_flag = jnp.asarray(t.blue_flag, dtype=jnp.int32)
    red_flag = jnp.asarray(t.red_flag, dtype=jnp.int32)
    blue_territory = jnp.asarray(t.blue_territory, dtype=jnp.int32)
    red_territory = jnp.asarray(t.red_territory, dtype=jnp.int32)
    obstacle_arr = jnp.asarray(t.obstacle.reshape(-1, 2), dtype=jnp.int32)
    action_vec = jnp.asarray(CTF_ACTION_TO_VEC)
    shape_max = jnp.asarray([S0 - 1, S1 - 1], dtype=jnp.int32)

    n_battles = n_blue * n_red if mvn else 1

    # Static (N,) flattened cell-property tables; point queries run as
    # one-hot compare+reduce over the lane axis (a dynamic 1-element gather
    # lowers poorly on TPU).
    n_cells = S0 * S1
    cell_iota = jnp.arange(n_cells, dtype=jnp.int32)

    def _cell(mask, p):
        q = jnp.clip(p, 0, shape_max)
        flat = q[0] * S1 + q[1]
        return jnp.sum(
            jnp.where(cell_iota == flat, mask.reshape(-1), False).astype(
                jnp.int32
            )
        ) > 0

    def reset_fn(key: jax.Array) -> CtfState:
        key, k_b, k_r = jax.random.split(key, 3)
        if mvn:
            # Non-overlapping spawn cells per team (ctf.py:1033-1048).
            bidx = jax.random.choice(
                k_b, blue_territory.shape[0], (n_blue,), replace=False
            )
            ridx = jax.random.choice(
                k_r, red_territory.shape[0], (n_red,), replace=False
            )
        else:
            # Independent uniform draws (ctf.py:314-323).
            bidx = jax.random.randint(k_b, (n_blue,), 0, blue_territory.shape[0])
            ridx = jax.random.randint(k_r, (n_red,), 0, red_territory.shape[0])
        pos = jnp.concatenate([blue_territory[bidx], red_territory[ridx]], axis=0)
        return CtfState(
            pos=pos.astype(jnp.int32),
            # place_agent dir default (multigrid.py:371-373)
            dir=jnp.full((n_agents,), 3, dtype=jnp.int32),
            terminated=jnp.zeros((n_agents,), dtype=bool),
            collided=jnp.zeros((n_agents,), dtype=bool),
            step_count=jnp.int32(0),
            key=key,
        )

    def red_actions_fn(state: CtfState, key: jax.Array) -> jax.Array:
        keys = jax.random.split(key, n_red)
        acts = [
            policy_fns[i](state.pos, state.terminated, state.pos[n_blue + i], keys[i])
            for i in range(n_red)
        ]
        return jnp.stack(acts)

    def _transition(state: CtfState, actions: jax.Array, key: jax.Array):
        """Shared move/battle/reward core.  ``actions``: (n_agents,) int32."""
        k_perm, k_bat = jax.random.split(key)
        battle_keys = jax.random.split(k_bat, n_battles)

        actions = jnp.clip(actions.astype(jnp.int32), 0, NUM_ACTIONS - 1)
        pos = state.pos
        dirs = state.dir
        term = state.terminated
        coll = state.collided
        # Action -> render direction: left->3, down->2, right->1, up->0
        # (delta matched against DIR_TO_VEC, agent.py:176-182); stay never
        # moves (self-blocked), so slot 0 is unused.
        act_to_dir = jnp.asarray([3, 3, 2, 1, 0], dtype=jnp.int32)

        if mvn:
            perm = jax.random.permutation(k_perm, n_agents)
        else:
            perm = jnp.arange(n_agents)

        # Sequential random-order moves; later movers see earlier movers'
        # positions (ctf.py:1240-1251).  n_agents is tiny & static -> unroll.
        for ti in range(n_agents):
            i = perm[ti]
            alive = ~term[i]
            p = pos[i]
            nxt = p + action_vec[actions[i]]
            inb = (
                (nxt[0] >= 0) & (nxt[1] >= 0) & (nxt[0] < bound0) & (nxt[1] < bound1)
            )
            static_ok = _cell(can_enter, nxt)
            # Any agent on the target cell blocks — including the mover
            # itself on ``stay`` (the reference reads its own grid cell,
            # Agent.can_overlap() is False).
            occupied = jnp.any(jnp.all(pos == nxt[None, :], axis=1))
            if mvn and cfg.obstacle_penalty != 0:
                coll = coll.at[i].set(coll[i] | (alive & inb & occupied))
            can_move = alive & inb & static_ok & ~occupied
            pos = pos.at[i].set(jnp.where(can_move, nxt, p))
            dirs = dirs.at[i].set(
                jnp.where(can_move, act_to_dir[actions[i]], dirs[i])
            )

        reward = jnp.float32(0.0)
        episode_term = jnp.bool_(False)

        # MvN sticky collision penalty + termination (ctf.py:1316-1332).
        if mvn and cfg.obstacle_penalty != 0:
            reward = reward - cfg.obstacle_penalty * jnp.sum(
                coll[:n_blue].astype(jnp.float32)
            )
            term = term | coll

        # Flag captures — all agents checked, terminated included
        # (ctf.py:1334-1356; 576-594).
        blue_on_rf = jnp.all(pos[:n_blue] == red_flag[None, :], axis=1)
        red_on_bf = jnp.all(pos[n_blue:] == blue_flag[None, :], axis=1)
        red_flag_captured = jnp.any(blue_on_rf)
        blue_flag_captured = jnp.any(red_on_bf)
        reward = reward + cfg.flag_reward * jnp.sum(blue_on_rf.astype(jnp.float32))
        reward = reward - cfg.flag_reward * jnp.sum(red_on_bf.astype(jnp.float32))
        episode_term = episode_term | red_flag_captured | blue_flag_captured

        # Battles: sequential over (blue, red) pairs in row-major order with
        # mid-loop terminated updates (ctf.py:1358-1420 / 596-636).
        battle_blue_lost = jnp.zeros((n_blue,), dtype=bool)
        battle_red_lost = jnp.zeros((n_red,), dtype=bool)
        kb = 0
        for b in range(n_blue):
            for r in range(n_red):
                if not mvn and (b, r) != (0, 0):
                    continue
                pb, pr = pos[b], pos[n_blue + r]
                dist = jnp.linalg.norm((pb - pr).astype(jnp.float32))
                eligible = (
                    (dist <= cfg.battle_range) & ~term[b] & ~term[n_blue + r]
                )
                bin_own = _cell(blue_mask, pb)
                rin_own = _cell(red_mask, pr)
                p_blue = jnp.where(
                    bin_own == rin_own,
                    0.5,
                    jnp.where(bin_own, cfg.randomness, 1.0 - cfg.randomness),
                )
                blue_win = jax.random.bernoulli(battle_keys[kb], p_blue)
                kb += 1
                win = eligible & blue_win
                lose = eligible & ~blue_win
                reward = reward + cfg.battle_reward * win.astype(jnp.float32)
                reward = reward - cfg.battle_reward * lose.astype(jnp.float32)
                term = term.at[n_blue + r].set(term[n_blue + r] | win)
                battle_red_lost = battle_red_lost.at[r].set(
                    battle_red_lost[r] | win
                )
                battle_blue_lost = battle_blue_lost.at[b].set(
                    battle_blue_lost[b] | lose
                )
                if mvn:
                    term = term.at[b].set(term[b] | lose)
                else:
                    # 1v1: blue losing ends the episode (ctf.py:633-636).
                    episode_term = episode_term | lose

        if mvn:
            episode_term = episode_term | jnp.all(term[:n_blue])
            reward = reward - cfg.step_penalty * n_blue
        else:
            if cfg.obstacle_penalty != 0:
                on_obs = _cell(obstacle_mask, pos[0])
                reward = reward - cfg.obstacle_penalty * on_obs.astype(jnp.float32)
                episode_term = episode_term | on_obs
            reward = reward - cfg.step_penalty

        step_count = state.step_count + 1
        truncated = step_count >= cfg.max_steps

        new_state = CtfState(
            pos=pos,
            dir=dirs,
            terminated=term,
            collided=coll,
            step_count=step_count,
            key=state.key,
        )
        info = info_fn(new_state)
        info = dict(
            info,
            red_flag_captured=red_flag_captured,
            blue_flag_captured=blue_flag_captured,
            agent_terminated=term,
            battle_blue_lost=battle_blue_lost,
            battle_red_lost=battle_red_lost,
        )
        return new_state, obs_fn(new_state), reward, episode_term, truncated, info

    def step_fn(state: CtfState, blue_actions: jax.Array):
        """One step with in-graph scripted red policies (the fast path)."""
        key, k_red, k_step = jax.random.split(state.key, 3)
        state = CtfState(
            pos=state.pos,
            dir=state.dir,
            terminated=state.terminated,
            collided=state.collided,
            step_count=state.step_count,
            key=key,
        )
        blue_actions = jnp.asarray(blue_actions).reshape(n_blue)
        red = red_actions_fn(state, k_red)
        actions = jnp.concatenate([blue_actions.astype(jnp.int32), red])
        return _transition(state, actions, k_step)

    def step_actions_fn(state: CtfState, actions: jax.Array):
        """One step with externally supplied actions for ALL agents (host
        fallback for user-defined Python policies)."""
        new_key, k_step = jax.random.split(state.key)
        state = CtfState(
            pos=state.pos,
            dir=state.dir,
            terminated=state.terminated,
            collided=state.collided,
            step_count=state.step_count,
            key=new_key,
        )
        return _transition(state, jnp.asarray(actions).reshape(n_agents), k_step)

    # ---- observations ----------------------------------------------------
    bt_flat = jnp.asarray(t.blue_territory.reshape(-1), dtype=jnp.int32)
    rt_flat = jnp.asarray(t.red_territory.reshape(-1), dtype=jnp.int32)
    ob_flat = jnp.asarray(t.obstacle.reshape(-1), dtype=jnp.int32)

    base_map_np = np.zeros(t.fm.shape, dtype=np.int32)
    for (i, j) in t.blue_territory:
        base_map_np[i, j] = BLUE_TERRITORY
    for (i, j) in t.red_territory:
        base_map_np[i, j] = RED_TERRITORY
    for (i, j) in t.obstacle.reshape(-1, 2):
        base_map_np[i, j] = OBSTACLE
    base_map_np[tuple(t.blue_flag)] = BLUE_FLAG
    base_map_np[tuple(t.red_flag)] = RED_FLAG
    base_map = jnp.asarray(base_map_np)

    def encode_map(state: CtfState) -> jax.Array:
        """Static base + agent overwrite, transposed int map
        (ctf.py:399-432, 1137-1163)."""
        m = base_map
        for a in range(n_agents):
            ok = BLUE_AGENT if a < n_blue else RED_AGENT
            v = jnp.where(state.terminated[a], OBSTACLE, ok)
            m = m.at[state.pos[a, 0], state.pos[a, 1]].set(v)
        return m.T

    def obs_positional(state: CtfState):
        if mvn:
            return {
                "blue_agent": state.pos[:n_blue].reshape(-1),
                "red_agent": state.pos[n_blue:].reshape(-1),
                "blue_flag": blue_flag,
                "red_flag": red_flag,
                "blue_territory": bt_flat,
                "red_territory": rt_flat,
                "obstacle": ob_flat,
                "terminated_agents": state.terminated.astype(jnp.int32),
            }
        return {
            "blue_agent": state.pos[0],
            "red_agent": state.pos[1],
            "blue_flag": blue_flag,
            "red_flag": red_flag,
            "blue_territory": bt_flat,
            "red_territory": rt_flat,
            "obstacle": ob_flat,
            "is_red_agent_defeated": state.terminated[1].astype(jnp.int32),
        }

    def obs_flattened(state: CtfState) -> jax.Array:
        tail = (
            state.terminated.astype(jnp.int32)
            if mvn
            else state.terminated[1:2].astype(jnp.int32)
        )
        return jnp.concatenate(
            [
                state.pos[:n_blue].reshape(-1),
                state.pos[n_blue:].reshape(-1),
                blue_flag,
                red_flag,
                bt_flat,
                rt_flat,
                ob_flat,
                tail,
            ]
        )

    if cfg.observation_option == "positional":
        obs_fn = obs_positional
    elif cfg.observation_option == "map":
        obs_fn = encode_map
    elif cfg.observation_option == "flattened":
        obs_fn = obs_flattened
    else:
        raise ValueError(f"Invalid observation_option: {cfg.observation_option}")

    def info_fn(state: CtfState):
        """The 11 distance features (ctf.py:434-451, 1165-1182).

        Parity note: like the reference, ``d_ba_ra`` etc. use agents[0] and
        agents[1] — in MvN with >=2 blue agents, agents[1] is the *second
        blue* agent, not a red one (reference bug kept for parity).
        """
        p0 = state.pos[0].astype(jnp.float32)
        p1 = state.pos[1].astype(jnp.float32)
        bf = blue_flag.astype(jnp.float32)
        rf = red_flag.astype(jnp.float32)

        def d(a, b):
            return jnp.linalg.norm(a - b)

        def d_area(p, area):
            return jnp.min(jnp.linalg.norm(area.astype(jnp.float32) - p, axis=1))

        bt = blue_territory
        rt = red_territory
        return {
            "d_ba_ra": d(p0, p1),
            "d_ba_bf": d(p0, bf),
            "d_ba_rf": d(p0, rf),
            "d_ra_bf": d(p1, bf),
            "d_ra_rf": d(p1, rf),
            "d_bf_rf": d(bf, rf),
            "d_ba_bb": d_area(p0, bt),
            "d_ba_rb": d_area(p0, rt),
            "d_ra_bb": d_area(p1, bt),
            "d_ra_rb": d_area(p1, rt),
            "d_ba_ob": (
                d_area(p0, obstacle_arr)
                if obstacle_arr.shape[0] > 0
                else jnp.float32(jnp.inf)
            ),
        }

    return CtfFns(
        reset_fn=reset_fn,
        step_fn=step_fn,
        step_actions_fn=step_actions_fn,
        red_actions_fn=red_actions_fn,
        obs_fn=obs_fn,
        info_fn=info_fn,
    )


def make_ctf_partial_encode(
    cfg: CtfConfig, view_size: int = 7, see_through_walls: bool = False
):
    """Batched agent-FOV observations: ``fn(state) -> (n_agents, V, V, 3)``.

    The in-graph counterpart of the host ``MultiGridEnv.gen_obs`` pipeline
    for the CtF world (reference multigrid.py:485-545 — dead code
    upstream, fixed host-side here): view slice + rotate-to-face-up +
    shadow-cast visibility + masked 3-dim grid encode.  Cell encodes
    mirror the reference ``_gen_grid`` painting (ctf.py:279-323): Floor
    territory (light_blue/light_red), grey Obstacles (can_see_through, so
    nothing in-bounds blocks sight), Flags, and agents typed
    blue_agent/red_agent whose color greys on defeat (ctf.py:1409-1418).
    Out-of-view-bounds cells read as sight-blocking grey obstacles — the
    CtF world has no wall type, so the board edge uses its canonical
    impassable object (core/grid.py slice boundary rule).
    Differentially tested against the host pipeline in
    tests/test_partial_obs.py.
    """
    from gym_multigrid_tpu.envs.partial_obs import make_partial_obs_fn

    t = build_tables(cfg)
    W, H = t.fm.shape
    CI = CtfWorld.COLOR_TO_IDX
    n_agents = cfg.num_agents
    n_blue = cfg.num_blue_agents

    typ = np.zeros((W, H), np.int32)
    col = np.zeros((W, H), np.int32)
    for (i, j) in t.blue_territory:
        typ[i, j], col[i, j] = BLUE_TERRITORY, CI["light_blue"]
    for (i, j) in t.red_territory:
        typ[i, j], col[i, j] = RED_TERRITORY, CI["light_red"]
    for (i, j) in t.obstacle.reshape(-1, 2):
        typ[i, j], col[i, j] = OBSTACLE, CI["grey"]
    typ[tuple(t.blue_flag)], col[tuple(t.blue_flag)] = BLUE_FLAG, CI["blue"]
    typ[tuple(t.red_flag)], col[tuple(t.red_flag)] = RED_FLAG, CI["red"]
    base_typ = jnp.asarray(typ)
    base_col = jnp.asarray(col)

    obs_fn = make_partial_obs_fn(
        W, H, view_size,
        wall_encode=(OBSTACLE, CI["grey"], 0),
        see_through_walls=see_through_walls,
    )

    agent_typ = np.array(
        [BLUE_AGENT if a < n_blue else RED_AGENT for a in range(n_agents)],
        np.int32,
    )
    live_col = np.array(
        [CI["blue"] if a < n_blue else CI["red"] for a in range(n_agents)],
        np.int32,
    )
    dead_col = np.array(
        [CI["blue_grey"] if a < n_blue else CI["red_grey"]
         for a in range(n_agents)],
        np.int32,
    )

    def encode_partial(state: CtfState) -> jax.Array:
        typ_d, col_d = base_typ, base_col
        ch2 = jnp.zeros((W, H), jnp.int32)
        for a in range(n_agents):
            x, y = state.pos[a, 0], state.pos[a, 1]
            c = jnp.where(state.terminated[a], dead_col[a], live_col[a])
            typ_d = typ_d.at[x, y].set(agent_typ[a])
            col_d = col_d.at[x, y].set(c)
            ch2 = ch2.at[x, y].set(state.dir[a])
        planes = jnp.stack([typ_d, col_d, ch2])
        # Obstacles are can_see_through=True (reference object.py:190);
        # no in-bounds cell blocks sight.
        opaque = jnp.zeros((W, H), bool)
        return jax.vmap(
            lambda p, d: obs_fn(planes, opaque, p, d)
        )(state.pos, state.dir)

    return encode_partial


@functools.cache
def cached_ctf(cfg: CtfConfig) -> CtfFns:
    """Memoized jitted function bundle."""
    fns = make_ctf(cfg)
    return CtfFns(
        reset_fn=jax.jit(fns.reset_fn),
        step_fn=jax.jit(fns.step_fn),
        step_actions_fn=jax.jit(fns.step_actions_fn),
        red_actions_fn=jax.jit(fns.red_actions_fn),
        obs_fn=jax.jit(fns.obs_fn),
        info_fn=jax.jit(fns.info_fn),
    )


def __getattr__(name):
    # Import-path parity with the reference (gym_multigrid/envs/ctf.py
    # defines the Env classes in this module); lazy to avoid a circular
    # import with the adapter layer.
    if name in ("Ctf1v1Env", "CtFMvNEnv"):
        from gym_multigrid_tpu.adapters import ctf_adapter

        return getattr(ctf_adapter, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
