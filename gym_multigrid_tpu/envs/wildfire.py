"""Wildfire env family — spreading-state dynamics, TPU-native.

DESIGN NOTE.  The reference README lists "Wildfire" with **no code at the
pinned snapshot** (reference README.md:43 is a bare heading; SURVEY.md §7.3),
so unlike Collect/CtF/Maze there is nothing to be bit-exact to.  Semantics
are fixed here:

* Cells: empty / tree / fire / burnt (WildfireWorld, core/world.py).
  Agents are firefighters moving with the CtF action set
  (stay/left/down/right/up) over any cell.
* Per step, in order:
    1. Agents move (uniform random order, sequential like the other
       families; other agents block).
    2. Extinguish: a fire cell under an agent becomes burnt;
       +ext_reward each.
    3. Spread: every tree with >= 1 burning 4-neighbor ignites with
       probability 1 - (1 - p_spread)^n (independent chance per burning
       neighbor); -burn_penalty per new ignition.
    4. Burnout: every fire cell (that wasn't just ignited) turns to burnt
       with probability p_burnout.
    5. -step_penalty.
* terminated when no fire remains; truncated at max_steps.
* Obs: full-grid (W, H, 3) uint8 in the family encode convention
  (type, color, agent-dir), like Collect.

TPU mapping: the spread step is a 4-neighbor count — one shifted-add
stencil over the whole board — plus a per-cell Bernoulli; the entire
transition is a fixed-shape fused elementwise program, ideal for vmapped
batches (the per-agent move loop is the only sequential part, tiny and
unrolled).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gym_multigrid_tpu.core.constants import COLOR_TO_IDX, CTF_ACTION_TO_VEC
from gym_multigrid_tpu.core.world import WildfireWorld

_W = WildfireWorld.OBJECT_TO_IDX
EMPTY = _W["empty"]
TREE = _W["tree"]
FIRE = _W["fire"]
BURNT = _W["burnt"]
W_AGENT = _W["agent"]

TREE_COLOR = COLOR_TO_IDX["green"]
FIRE_COLOR = COLOR_TO_IDX["red"]
BURNT_COLOR = COLOR_TO_IDX["grey"]

NUM_ACTIONS = 5


@dataclass(frozen=True)
class WildfireConfig:
    size: int = 16
    num_agents: int = 2
    agents_index: tuple[int, ...] = (4, 5)  # blue, purple
    tree_density: float = 0.6
    num_initial_fires: int = 2
    p_spread: float = 0.3
    p_burnout: float = 0.1
    ext_reward: float = 1.0
    burn_penalty: float = 0.1
    step_penalty: float = 0.0
    max_steps: int = 100

    @property
    def width(self) -> int:
        return self.size

    @property
    def height(self) -> int:
        return self.size


@jax.tree_util.register_dataclass
@dataclass
class WildfireState:
    cells: jax.Array  # (H, W) int32 cell type (empty/tree/fire/burnt)
    agent_pos: jax.Array  # (n_agents, 2) int32 (x, y)
    step_count: jax.Array  # () int32
    extinguished: jax.Array  # () int32 cumulative
    key: jax.Array


@dataclass(frozen=True)
class WildfireFns:
    reset_fn: callable
    step_fn: callable
    encode_fn: callable


def make_wildfire(cfg: WildfireConfig) -> WildfireFns:
    h, w = cfg.height, cfg.width
    n_agents = cfg.num_agents
    action_vec = jnp.asarray(CTF_ACTION_TO_VEC)  # (dy-ish, dx-ish) pairs
    agent_colors = jnp.asarray(np.array(cfg.agents_index, dtype=np.int32))

    def reset_fn(key: jax.Array) -> WildfireState:
        key, k_tree, k_fire, k_agent = jax.random.split(key, 4)
        trees = jax.random.bernoulli(k_tree, cfg.tree_density, (h, w))
        cells = jnp.where(trees, TREE, EMPTY).astype(jnp.int32)
        # Ignite num_initial_fires cells, preferring trees (Gumbel top-k
        # over the tree mask -> uniform among trees without replacement).
        g = jax.random.gumbel(k_fire, (h * w,))
        scores = jnp.where(trees.reshape(-1), g, g - 1e9)
        fire_idx = jax.lax.top_k(scores, cfg.num_initial_fires)[1]
        fire_mask = (
            jnp.zeros((h * w,), dtype=bool).at[fire_idx].set(True).reshape(h, w)
        )
        cells = jnp.where(fire_mask & trees, FIRE, cells)
        # Agents spawn uniformly at distinct cells.
        spawn = jax.random.choice(k_agent, h * w, (n_agents,), replace=False)
        agent_pos = jnp.stack([spawn % w, spawn // w], axis=1).astype(jnp.int32)
        return WildfireState(
            cells=cells,
            agent_pos=agent_pos,
            step_count=jnp.int32(0),
            extinguished=jnp.int32(0),
            key=key,
        )

    def step_fn(state: WildfireState, actions: jax.Array):
        key, k_perm, k_cells = jax.random.split(state.key, 3)
        actions = jnp.clip(
            jnp.asarray(actions).reshape(n_agents).astype(jnp.int32), 0, 4
        )
        pos = state.agent_pos
        cells = state.cells

        # 1. moves — sequential random order, other agents block
        perm = jax.random.permutation(k_perm, n_agents)
        for t in range(n_agents):
            i = perm[t]
            p = pos[i]
            delta = action_vec[actions[i]]
            nxt = p + jnp.stack([delta[1], delta[0]])  # (x, y) move
            nxt = jnp.clip(nxt, 0, jnp.asarray([w - 1, h - 1]))
            occupied = jnp.any(jnp.all(pos == nxt[None, :], axis=1))
            moved = ~occupied & jnp.any(nxt != p)
            pos = pos.at[i].set(jnp.where(moved, nxt, p))

        # 2. extinguish — agent occupancy as one-hot lane compares (a tiny
        # dynamic scatter lowers poorly on TPU)
        flat = (pos[:, 1] * w + pos[:, 0])  # (n_agents,)
        cell_idx = jnp.arange(h * w, dtype=jnp.int32)
        agent_mask = jnp.zeros((h * w,), dtype=bool)
        for i in range(n_agents):
            agent_mask = agent_mask | (cell_idx == flat[i])
        agent_mask = agent_mask.reshape(h, w)
        put_out = agent_mask & (cells == FIRE)
        n_ext = jnp.sum(put_out.astype(jnp.int32))
        cells = jnp.where(put_out, BURNT, cells)

        # 3+4. spread + burnout share ONE uniform field: ignition reads it
        # at TREE cells, burnout at FIRE cells — disjoint sets, so the
        # per-cell draws stay independent with half the PRNG work.
        # (jnp.roll wraps, so zero the wrapped rows/cols: the board edge is
        # not toroidal.)
        u = jax.random.uniform(k_cells, (h, w))
        fire = (cells == FIRE).astype(jnp.float32)
        up = jnp.roll(fire, 1, axis=0).at[0, :].set(0.0)
        down = jnp.roll(fire, -1, axis=0).at[h - 1, :].set(0.0)
        left = jnp.roll(fire, 1, axis=1).at[:, 0].set(0.0)
        right = jnp.roll(fire, -1, axis=1).at[:, w - 1].set(0.0)
        n_burning = up + down + left + right
        p_ignite = 1.0 - (1.0 - cfg.p_spread) ** n_burning
        ignite = (cells == TREE) & (u < p_ignite)
        n_ignited = jnp.sum(ignite.astype(jnp.int32))

        burnout = (cells == FIRE) & (u < cfg.p_burnout)
        cells = jnp.where(burnout, BURNT, jnp.where(ignite, FIRE, cells))

        reward = (
            cfg.ext_reward * n_ext.astype(jnp.float32)
            - cfg.burn_penalty * n_ignited.astype(jnp.float32)
            - cfg.step_penalty
        )
        rewards = jnp.full((n_agents,), reward / n_agents, dtype=jnp.float32)

        step_count = state.step_count + 1
        terminated = ~jnp.any(cells == FIRE)
        truncated = step_count >= cfg.max_steps

        new_state = WildfireState(
            cells=cells,
            agent_pos=pos,
            step_count=step_count,
            extinguished=state.extinguished + n_ext,
            key=key,
        )
        info = {
            "extinguished": new_state.extinguished,
            "burning": jnp.sum((cells == FIRE).astype(jnp.int32)),
            "burnt": jnp.sum((cells == BURNT).astype(jnp.int32)),
        }
        return new_state, encode_fn(new_state), rewards, terminated, truncated, info

    def encode_fn(state: WildfireState) -> jax.Array:
        """(W, H, 3) uint8: (type, color, dir) like the other families."""
        cells = state.cells
        color = jnp.zeros_like(cells)
        color = jnp.where(cells == TREE, TREE_COLOR, color)
        color = jnp.where(cells == FIRE, FIRE_COLOR, color)
        color = jnp.where(cells == BURNT, BURNT_COLOR, color)
        typ = cells
        for i in range(n_agents):
            x, y = state.agent_pos[i, 0], state.agent_pos[i, 1]
            typ = typ.at[y, x].set(W_AGENT)
            color = color.at[y, x].set(agent_colors[i])
        ch2 = jnp.where(typ == W_AGENT, 3, 0)
        return jnp.stack([typ.T, color.T, ch2.T], axis=-1).astype(jnp.uint8)

    return WildfireFns(reset_fn=reset_fn, step_fn=step_fn, encode_fn=encode_fn)


@functools.cache
def cached_wildfire(cfg: WildfireConfig) -> WildfireFns:
    fns = make_wildfire(cfg)
    return WildfireFns(
        reset_fn=jax.jit(fns.reset_fn),
        step_fn=jax.jit(fns.step_fn),
        encode_fn=jax.jit(fns.encode_fn),
    )


def __getattr__(name):
    if name == "WildfireEnv":
        from gym_multigrid_tpu.adapters.wildfire_adapter import WildfireEnv

        return WildfireEnv
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
