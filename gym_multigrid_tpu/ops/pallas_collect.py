"""Collect slab math: Pallas kernels + the XLA episode rollout (the
benchmark hot path — `bench.py`'s driver metric runs
:func:`make_collect_episode_rollout`).

One set of batched "slab" transition functions over (B, cells) planes
serves every execution mode:

* ``collect_step_slab`` / ``collect_reset_slab`` — fused Pallas
  kernels, the bit-compared second-backend validation layer
  (tests/test_pallas.py).  Each program instance owns a (BLK, cells)
  slab; all randomness is drawn OUTSIDE with jax.random and passed in,
  so ``_step_math`` doubles as the pure-jax reference spec.
* ``_collect_ms_math_packed`` / ``make_collect_episode_rollout`` — the
  measured headline: K unrolled steps per plain-XLA chunk program on
  ONE packed (obj|color<<4|slot<<8) plane, carried packed through chunk
  and episode boundaries, with the fused reset in-graph.  (Multi-step
  episode KERNEL variants existed through round 4 and were pruned after
  the slab-width sweep — artifacts/kernel_vs_xla.md; the round-5
  optimization chain is documented in artifacts/collect_r5.md.)

Distribution parity with envs/collect.py is exact: the move order of two
agents is a fair coin, and ``floor(u * count)`` over the masked prefix sum
is uniform over empty cells — the same distributions the reference's
rejection sampling induces (SURVEY.md §2.3).

Supported: n_agents in (1, 2) (every shipped Collect config).  Other agent
counts fall back to the standard XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512  # envs per program instance (single-step kernel)
MS_BLK = 128  # envs per program instance (reset kernel; its 17-placement
# program stacks per-placement temporaries in scoped VMEM)


class _Tables(NamedTuple):
    """Static per-config tables (hashable, closed over by the kernel)."""

    width: int
    height: int
    n_cells: int
    empty: int
    ball: int
    agent: int
    agent_colors: tuple[int, ...]
    respawn: bool
    respawn_rects: tuple[tuple[bool, ...], ...]  # (n_colors, n_cells)
    action_dx: tuple[int, ...]
    action_dy: tuple[int, ...]
    #: first reward-table slot for respawned balls (= number of planned
    #: placements); a respawned ball of color c carries slot base + c
    respawn_slot_base: int



def _prefix_sum_lanes(x):
    """Inclusive int32 prefix sum along lanes — log2(C) shifted adds.
    Bit-identical to the tril-matmul form (0/1 counts are exact either
    way); used by plain-XLA consumers so the respawn/reset picks cost no
    (B,C)x(C,C) MXU matmuls.  Mosaic kernels keep the tril form."""
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :n]
        s *= 2
    return x


class _MixedTril(NamedTuple):
    """Marker for the mixed-precision prefix matmul: bf16 operands (half
    the mask-plane write) with f32 MXU accumulation and an f32 cum plane
    (no bf16 relayouts in the downstream compares)."""

    tril: jax.Array  # (C, C) bf16


def _prefix_counts(mask, tril):
    """(inclusive prefix sum, total count) of a (B, C) bool mask.

    tril = (C, C) f32/bf16 prefix matmul (Mosaic/MXU form), a
    :class:`_MixedTril` (bf16 operands, f32 output), or None (XLA
    shifted-adds form).  ``cum`` comes back in the matmul's own output
    dtype — counts <= C <= 256 are exact integers in f32 and bf16, so
    consumers compare against ``(r + 1).astype(cum.dtype)`` instead of
    paying a whole-plane convert back to int32 (the convert was a top
    VMEM-write op in the 2026-08-20 collect xplane trace).  ``count`` is
    the (B, 1) int32 total."""
    if tril is None:
        cum = _prefix_sum_lanes(mask.astype(jnp.int32))
    elif isinstance(tril, _MixedTril):
        out = (
            jnp.int32 if tril.tril.dtype == jnp.int8 else jnp.float32
        )
        cum = jnp.dot(
            mask.astype(tril.tril.dtype), tril.tril,
            preferred_element_type=out,
        )
    else:
        # bf16 tril: counts <= C <= 256 are exact integers in bf16 (8
        # mantissa bits) with f32 MXU accumulation, and the materialized
        # (B, C) cum plane is half the HBM bytes of the f32 form.
        cum = jnp.dot(
            mask.astype(tril.dtype), tril,
            preferred_element_type=tril.dtype,
        )
    # The total count IS the last lane of the inclusive prefix sum — a
    # separate sum-reduce of the mask was 17% of collect's device time
    # (2026-08-20 xplane trace) for a value already computed.
    return cum, cum[:, -1:].astype(jnp.int32)


def _step_math(t: _Tables, go, gc, gs, pos, acts, rnd, rects=None, tril=None):
    """One Collect transition for a (B, cells) slab.

    go/gc:  (B, C) int32 object/color planes
    gs:     (B, C) int32 reward-table slot plane (per-Ball-instance rewards,
            see envs/collect.py reward_slot_tables)
    pos:    (B, 2*n_agents) int32 [a0x, a0y, a1x, a1y, ...]
    acts:   (B, n_agents) int32
    rnd:    (B, 3) float32 uniforms [move-order, spawn_slot0, spawn_slot1]
    rects:  (n_colors, C) bool respawn partitions (required iff t.respawn;
            passed explicitly so the kernel has no captured constants)
    tril:   (C, C) float32 lower-triangular ones — prefix sums run as one
            MXU matmul (Pallas TPU has no cumsum lowering; counts <= C are
            exact in f32)

    Returns (go, gc, gs, pos, picked) with picked: (B, n_agents) int32 —
    the reward-table SLOT of the ball agent i picked up this step, or -1.
    """
    B, C = go.shape
    n_agents = acts.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    w = t.width

    # Move order: for 2 agents a fair coin; 1 agent trivial.
    if n_agents == 2:
        first = (rnd[:, 0:1] < 0.5).astype(jnp.int32)  # (B,1): 0 or 1
    else:
        first = jnp.zeros((B, 1), dtype=jnp.int32)

    picked = [jnp.full((B, 1), -1, dtype=jnp.int32) for _ in range(n_agents)]
    pos_cols = [pos[:, 2 * i : 2 * i + 2] for i in range(n_agents)]

    agent_colors = np.array(t.agent_colors, dtype=np.int32)

    for slot in range(n_agents):
        # The slot-th mover: agent id varies per row (first or 1-first).
        if n_agents == 2:
            i_vec = jnp.where(slot == 0, first, 1 - first)  # (B,1)
            sel = (i_vec == 1).astype(jnp.int32)

            def pick(a, b):  # per-row select between agent0/agent1 values
                return jnp.where(i_vec == 0, a, b)

            act = pick(acts[:, 0:1], acts[:, 1:2])
            px = pick(pos_cols[0][:, 0:1], pos_cols[1][:, 0:1])
            py = pick(pos_cols[0][:, 1:2], pos_cols[1][:, 1:2])
            my_color = jnp.where(
                i_vec == 0,
                jnp.int32(agent_colors[0]),
                jnp.int32(agent_colors[1 % len(agent_colors)]),
            )
        else:
            i_vec = jnp.zeros((B, 1), jnp.int32)
            act = acts[:, 0:1]
            px = pos_cols[0][:, 0:1]
            py = pos_cols[0][:, 1:2]
            my_color = jnp.int32(agent_colors[0])

        # Invalid ids are a no-op (reference falls through its if/elif
        # chain).  The 4-entry action table is expanded to arithmetic
        # selects — a dynamic gather over a tiny table doesn't vectorize.
        valid = (act >= 0) & (act < 4)
        dx = jnp.zeros_like(act)
        dy = jnp.zeros_like(act)
        for a in range(4):
            m = valid & (act == a)
            dx = jnp.where(m, int(t.action_dx[a]), dx)
            dy = jnp.where(m, int(t.action_dy[a]), dy)
        nx = jnp.clip(px + dx, 0, t.width - 1)
        ny = jnp.clip(py + dy, 0, t.height - 1)
        nidx = ny * w + nx  # (B,1)
        oidx = py * w + px
        hit_n = lane == nidx  # (B,C)
        hit_o = lane == oidx

        cell = jnp.sum(jnp.where(hit_n, go, 0), axis=1, keepdims=True)
        is_ball = cell == t.ball
        do_move = is_ball | (cell == t.empty)
        ball_color = jnp.sum(jnp.where(hit_n, gc, 0), axis=1, keepdims=True)
        ball_slot = jnp.sum(jnp.where(hit_n, gs, 0), axis=1, keepdims=True)

        # pickup: clear the ball cell (collect_game.py:140)
        go = jnp.where(hit_n & is_ball, t.empty, go)
        gc = jnp.where(hit_n & is_ball, 0, gc)
        gs = jnp.where(hit_n & is_ball, 0, gs)

        if t.respawn:
            # respawn BEFORE the agent moves in (collect_game.py:129-144):
            # uniform over empty cells of the picked color's partition.
            n_colors = rects.shape[0]
            bc = jnp.clip(ball_color, 0, n_colors - 1)
            rect = jnp.zeros((B, C), dtype=jnp.bool_)
            for c in range(n_colors):
                rect = rect | ((bc == c) & rects[c][None, :])
            mask = rect & (go == t.empty)
            cum, count = _prefix_counts(mask, tril)
            u = rnd[:, 1 + slot : 2 + slot]
            r = jnp.minimum(
                (u * count.astype(jnp.float32)).astype(jnp.int32), count - 1
            )
            hit_r = (cum == (r + 1).astype(cum.dtype)) & mask
            go = jnp.where(hit_r & is_ball, t.ball, go)
            gc = jnp.where(hit_r & is_ball, ball_color, gc)
            # respawned balls pay balls_reward[color] via slot base+color
            gs = jnp.where(
                hit_r & is_ball, t.respawn_slot_base + ball_color, gs
            )

        # move (collect_game.py:174-181)
        go = jnp.where(hit_n & do_move, t.agent, go)
        gc = jnp.where(hit_n & do_move, my_color, gc)
        gs = jnp.where(hit_n & do_move, 0, gs)
        go = jnp.where(hit_o & do_move, t.empty, go)
        gc = jnp.where(hit_o & do_move, 0, gc)

        new_px = jnp.where(do_move, nx, px)
        new_py = jnp.where(do_move, ny, py)
        picked_here = jnp.where(is_ball, ball_slot, -1)

        if n_agents == 2:
            pos_cols[0] = jnp.where(
                i_vec == 0,
                jnp.concatenate([new_px, new_py], axis=1),
                pos_cols[0],
            )
            pos_cols[1] = jnp.where(
                i_vec == 1,
                jnp.concatenate([new_px, new_py], axis=1),
                pos_cols[1],
            )
            picked[0] = jnp.where(i_vec == 0, picked_here, picked[0])
            picked[1] = jnp.where(i_vec == 1, picked_here, picked[1])
        else:
            pos_cols[0] = jnp.concatenate([new_px, new_py], axis=1)
            picked[0] = picked_here

    pos_out = jnp.concatenate(pos_cols, axis=1)
    picked_out = jnp.concatenate(picked, axis=1)
    return go, gc, gs, pos_out, picked_out


def make_tables(cfg) -> _Tables:
    """Build the static tables from a CollectConfig."""
    from gym_multigrid_tpu.core.constants import COLLECT_ACTION_TO_VEC
    from gym_multigrid_tpu.core.world import CollectWorld
    from gym_multigrid_tpu.envs.collect import build_plan

    plan = build_plan(cfg)
    idx = CollectWorld.OBJECT_TO_IDX
    return _Tables(
        width=cfg.width,
        height=cfg.height,
        n_cells=cfg.num_cells,
        empty=idx["empty"],
        ball=idx["ball"],
        agent=idx["agent"],
        agent_colors=tuple(int(c) for c in cfg.agents_index),
        respawn=cfg.respawn,
        respawn_rects=tuple(
            tuple(bool(b) for b in row) for row in plan.respawn_rects
        ),
        action_dx=tuple(int(v[0]) for v in COLLECT_ACTION_TO_VEC),
        action_dy=tuple(int(v[1]) for v in COLLECT_ACTION_TO_VEC),
        respawn_slot_base=len(plan.ball_colors),
    )


@functools.partial(jax.jit, static_argnums=(0, 7))
def collect_step_slab(t: _Tables, go, gc, gs, pos, acts, rnd, interpret=False):
    """Run the fused step over a full (B, C) batch via pallas_call."""
    B, C = go.shape
    n_agents = acts.shape[1]
    blk = min(BLK, B)
    grid = (pl.cdiv(B, blk),)
    rects = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
    n_colors = rects.shape[0]
    # cum[:, j] = sum_{k <= j} m[:, k]  <=>  m @ tril with tril[k, j] = k<=j
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)

    def kernel(go_ref, gc_ref, gs_ref, pos_ref, acts_ref, rnd_ref, rects_ref,
               tril_ref, go_out, gc_out, gs_out, pos_out, picked_out):
        o, c, sl, p, k = _step_math(
            t, go_ref[:], gc_ref[:], gs_ref[:], pos_ref[:], acts_ref[:],
            rnd_ref[:], rects_ref[:], tril_ref[:],
        )
        go_out[:] = o
        gc_out[:] = c
        gs_out[:] = sl
        pos_out[:] = p
        picked_out[:] = k

    def row_spec(cols):
        return pl.BlockSpec(
            (blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(C),
            row_spec(C),
            row_spec(C),
            row_spec(2 * n_agents),
            row_spec(n_agents),
            row_spec(3),
            # static tables: same block for every program instance
            pl.BlockSpec(
                (n_colors, C), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            row_spec(C),
            row_spec(C),
            row_spec(C),
            row_spec(2 * n_agents),
            row_spec(n_agents),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 2 * n_agents), jnp.int32),
            jax.ShapeDtypeStruct((B, n_agents), jnp.int32),
        ],
        interpret=interpret,
    )(go, gc, gs, pos, acts, rnd, rects, tril)


def make_collect_step_batch(cfg, interpret: bool | None = None,
                            use_kernel: bool = True):
    """Batch-level Collect step (BatchedEnv.step_batch contract).

    use_kernel=True runs the fused Pallas kernel; False runs the identical
    slab math (:func:`_step_math`) as one plain-XLA whole-batch program —
    the default XLA path, faster than vmap(step_one).  Returns None when
    the config is outside the envelope (caller falls back to vmap).
    """
    from gym_multigrid_tpu.envs.collect import (
        CollectState,
        build_plan,
        make_collect,
        reward_slot_tables,
    )

    if cfg.num_agents not in (1, 2):
        if use_kernel:
            import warnings

            warnings.warn(
                f"use_pallas requested but Collect config has "
                f"{cfg.num_agents} agents (kernel envelope: 1 or 2); "
                "falling back to the XLA path",
                stacklevel=2,
            )
        return None
    t = make_tables(cfg)
    if interpret is None:
        # Mosaic lowering needs real TPU hardware; interpret elsewhere.
        interpret = jax.default_backend() == "cpu"
    _, _, encode_one = make_collect(cfg)

    slot_rewards_np, slot_info_np, _ = reward_slot_tables(cfg, build_plan(cfg))
    slot_rewards = jnp.asarray(slot_rewards_np)
    slot_info = jnp.asarray(slot_info_np)

    def step_batch(states: CollectState, actions: jax.Array):
        B = states.grid_obj.shape[0]
        keys = jax.vmap(jax.random.split)(states.key)
        new_key, k_rnd = keys[:, 0], keys[:, 1]
        rnd = jax.vmap(lambda k: jax.random.uniform(k, (3,)))(k_rnd)

        pos = states.agent_pos.reshape(B, -1)
        if use_kernel:
            go, gc, gs, pos, picked = collect_step_slab(
                t,
                states.grid_obj,
                states.grid_color,
                states.grid_slot,
                pos,
                actions.astype(jnp.int32),
                rnd,
                interpret,
            )
        else:
            # Same math, plain XLA whole-batch program.
            C = states.grid_obj.shape[1]
            rects = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
            tril = jnp.asarray(
                np.tril(np.ones((C, C), dtype=np.float32)).T
            )
            go, gc, gs, pos, picked = _step_math(
                t,
                states.grid_obj,
                states.grid_color,
                states.grid_slot,
                pos,
                actions.astype(jnp.int32),
                rnd,
                rects,
                tril,
            )

        got_ball = picked >= 0  # (B, A); picked is the reward-table slot
        ps = jnp.clip(picked, 0, slot_rewards.shape[0] - 1)
        rewards = jnp.where(got_ball, slot_rewards[ps], 0.0)
        n_picked = jnp.sum(got_ball.astype(jnp.int32), axis=1)
        collected = states.collected + n_picked
        # info counters: one-hot (agent, info-slot) bumps
        slots = slot_info[ps]  # (B, A)
        bump = jax.nn.one_hot(
            slots, cfg.num_ball_types, dtype=jnp.int32
        ) * got_ball[..., None].astype(jnp.int32)
        info_counts = states.info_counts + bump

        step_count = states.step_count + 1
        if cfg.respawn or cfg.fixed_horizon:
            terminated = jnp.zeros((B,), dtype=bool)
        else:
            terminated = collected == cfg.num_balls
        truncated = step_count >= cfg.max_steps

        new_states = CollectState(
            grid_obj=go,
            grid_color=gc,
            grid_slot=gs,
            agent_pos=pos.reshape(B, -1, 2),
            collected=collected,
            step_count=step_count,
            info_counts=info_counts,
            key=new_key,
        )
        obs = jax.vmap(encode_one)(new_states)
        return new_states, obs, rewards, terminated, truncated, info_counts

    return step_batch


def _rect_bits(rects):
    """(n_colors, C) bool respawn rects -> one (1, C) int32 bit plane:
    bit c of lane l says lane l belongs to color c's rect.  Lets the
    per-row rect select run as ``(rect_bits >> bc) & 1`` — two (B, C)
    ops instead of an n_colors-long compare/and/or chain (constant-folded
    on the XLA path; hoisted out of the step loop in the kernels)."""
    n_colors = rects.shape[0]
    bits = jnp.zeros((1, rects.shape[1]), jnp.int32)
    for c in range(n_colors):
        bits = bits | (rects[c][None, :].astype(jnp.int32) << c)
    return bits


def _step_math_packed(t: _Tables, p, pos, acts, rnd, rect_bits, tril):
    """:func:`_step_math` on ONE packed (B, C) int32 plane.

    Layout: obj = bits 0-3, color = bits 4-7, reward slot = bits 8+.  All
    Collect values fit (CollectWorld object indices <= 3, color indices
    <= 15, reward slots <= num_balls + num_colors).  Most plane updates
    write obj+color+slot under the SAME mask, so one packed plane turns
    three where-selects (and three loads/stores at chunk boundaries of
    the unrolled multi-step path) into one — the (B, C) slab work is what
    bounds the XLA episode path at batch scale.

    rect_bits is :func:`_rect_bits` of the respawn rects (None when
    t.respawn is False).

    Two boolean identities trim the per-sub-step (B, C) materializations
    vs the three-plane spec (the 2026-08-20 xplane trace showed the path
    VMEM-write-bound at 61%), both pinned bit-exact against
    :func:`_step_math` in tests/test_pallas.py:

    * the pickup-clear write is dropped: it touches only the picked ball
      cell (hit_n & is_ball), and is_ball implies do_move, so the move
      write at hit_n always lands on top of it — the cleared value is
      never observable in the output plane;
    * the respawn mask reads the PRE-pickup plane instead: a lane is
      empty-after-pickup iff it was empty before OR it is the picked
      ball cell, so ``mask = rect & (empty | (hit_n & is_ball))`` — the
      mid-step plane no longer has to exist as a value at all.
    """
    B, C = p.shape
    n_agents = acts.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    w = t.width

    if n_agents == 2:
        first = (rnd[:, 0:1] < 0.5).astype(jnp.int32)
    else:
        first = jnp.zeros((B, 1), dtype=jnp.int32)

    picked = [jnp.full((B, 1), -1, dtype=jnp.int32) for _ in range(n_agents)]
    pos_cols = [pos[:, 2 * i : 2 * i + 2] for i in range(n_agents)]
    agent_colors = np.array(t.agent_colors, dtype=np.int32)
    # Weak-typed mask + .astype(p.dtype) casts below keep the math
    # dtype-generic (an int16 plane was tried and measured 7% slower —
    # see the note in _collect_ms_math — so the plane ships int32, but
    # nothing here should silently upcast if that ever changes).
    obj_mask = 15

    for slot in range(n_agents):
        if n_agents == 2:
            i_vec = jnp.where(slot == 0, first, 1 - first)

            def pick(a, b):
                return jnp.where(i_vec == 0, a, b)

            act = pick(acts[:, 0:1], acts[:, 1:2])
            px = pick(pos_cols[0][:, 0:1], pos_cols[1][:, 0:1])
            py = pick(pos_cols[0][:, 1:2], pos_cols[1][:, 1:2])
            my_color = jnp.where(
                i_vec == 0,
                jnp.int32(agent_colors[0]),
                jnp.int32(agent_colors[1 % len(agent_colors)]),
            )
        else:
            i_vec = jnp.zeros((B, 1), jnp.int32)
            act = acts[:, 0:1]
            px = pos_cols[0][:, 0:1]
            py = pos_cols[0][:, 1:2]
            my_color = jnp.int32(agent_colors[0])

        valid = (act >= 0) & (act < 4)
        dx = jnp.zeros_like(act)
        dy = jnp.zeros_like(act)
        for a in range(4):
            m = valid & (act == a)
            dx = jnp.where(m, int(t.action_dx[a]), dx)
            dy = jnp.where(m, int(t.action_dy[a]), dy)
        nx = jnp.clip(px + dx, 0, t.width - 1)
        ny = jnp.clip(py + dy, 0, t.height - 1)
        nidx = ny * w + nx
        oidx = py * w + px
        hit_n = lane == nidx
        hit_o = lane == oidx

        # One gather-sum of the packed word replaces three plane gathers.
        cell_p = jnp.sum(jnp.where(hit_n, p, 0), axis=1, keepdims=True)
        cell = cell_p & obj_mask
        is_ball = cell == t.ball
        do_move = is_ball | (cell == t.empty)
        ball_color = (cell_p >> 4) & obj_mask
        ball_slot = cell_p >> 8

        if t.respawn:
            # respawn BEFORE the move (collect_game.py:129-144), over the
            # cells empty after the pickup-clear — expressed on the
            # pre-pickup plane (see docstring identity #2).
            n_colors = len(t.respawn_rects)
            bc = jnp.clip(ball_color, 0, n_colors - 1)
            rect = ((rect_bits >> bc) & 1) != 0
            mask = rect & (
                ((p & obj_mask) == t.empty) | (hit_n & is_ball)
            )
            cum, count = _prefix_counts(mask, tril)
            u = rnd[:, 1 + slot : 2 + slot]
            r = jnp.minimum(
                (u * count.astype(jnp.float32)).astype(jnp.int32), count - 1
            )
            # "(r+1)-th set bit" located from cum ALONE: the prefix sum
            # increments exactly at set lanes, so lane l is a set bit iff
            # cum[l] > cum[l-1].  Equivalent to `(cum == r+1) & mask` but
            # leaves `mask` with a single consumer (the dot operand), so
            # the pred mask plane fuses away instead of materializing —
            # it was one of the three per-pick (B, C) buffers in the
            # 2026-08-20 optimized-HLO inspection.  count == 0 rows give
            # r+1 == 0, which can never satisfy cum > prev.
            prev = jnp.pad(cum, ((0, 0), (1, 0)))[:, :C]
            hit_r = (cum == (r + 1).astype(cum.dtype)) & (cum != prev)
            ball_p = (
                t.ball
                | (ball_color << 4)
                | ((t.respawn_slot_base + ball_color) << 8)
            ).astype(p.dtype)
            p = jnp.where(hit_r & is_ball, ball_p, p)

        # move (collect_game.py:174-181); vacated cell has no slot/color.
        # The move write covers the pickup-clear (docstring identity #1):
        # at hit_n & is_ball the agent value lands regardless.
        agent_p = jnp.asarray(t.agent | (my_color << 4), p.dtype)
        p = jnp.where(hit_n & do_move, agent_p, p)
        p = jnp.where(hit_o & do_move, t.empty, p)

        new_px = jnp.where(do_move, nx, px)
        new_py = jnp.where(do_move, ny, py)
        picked_here = jnp.where(is_ball, ball_slot, -1)

        if n_agents == 2:
            pos_cols[0] = jnp.where(
                i_vec == 0,
                jnp.concatenate([new_px, new_py], axis=1),
                pos_cols[0],
            )
            pos_cols[1] = jnp.where(
                i_vec == 1,
                jnp.concatenate([new_px, new_py], axis=1),
                pos_cols[1],
            )
            picked[0] = jnp.where(i_vec == 0, picked_here, picked[0])
            picked[1] = jnp.where(i_vec == 1, picked_here, picked[1])
        else:
            pos_cols[0] = jnp.concatenate([new_px, new_py], axis=1)
            picked[0] = picked_here

    pos_out = jnp.concatenate(pos_cols, axis=1)
    picked_out = jnp.concatenate(picked, axis=1)
    return p, pos_out, picked_out


def pack_planes(go, gc, gs):
    """(go, gc, gs) int32 planes -> one packed plane (obj|color<<4|slot<<8)."""
    return go | (gc << 4) | (gs << 8)


def unpack_planes(p):
    m = jnp.int32(15)
    return p & m, (p >> 4) & m, p >> 8


def _collect_ms_math_packed(t, K, p, pos, packed, rect_bits, tril,
                            rwd_tab, slot_tab, n_types):
    """K Collect steps as plain XLA on an already-packed plane (the
    kernel body's loop, same :func:`_step_math`, with gather-based
    reward/counter accumulation — values identical to the kernel's
    iota-compare selects).  The packed-plane episode rollout carries `p`
    through chunk AND episode boundaries, so pack/unpack happens once
    per whole rollout, not once per chunk launch."""
    B, C = p.shape
    A = pos.shape[1] // 2
    rew = jnp.zeros((B, A), jnp.float32)
    cnt = jnp.zeros((B, A, n_types), jnp.int32)
    for k in range(K):
        if isinstance(packed, tuple):
            # Compact pre-drawn stream ("packedbits"): one u32 word per
            # env step carries both 2-bit actions and the move-order
            # coin; only the two spawn-pick uniforms stay f32.  12 bytes
            # per env step instead of the f32 buffer's 20 — the draw
            # fusions were ~6% of device time on the 2026-08-20 trace.
            # Distribution-identical (disjoint bits of one threefry word
            # are independent fair bits), different stream — SURVEY.md
            # §2.3 parity bar; agreement pinned in tests/test_xla_ms.py.
            words, unif = packed
            w = words[:, k].astype(jnp.int32)
            acts = jnp.stack(
                [(w >> (2 * a)) & 3 for a in range(A)], axis=1
            )
            # first-mover coin: bit 2A set -> rnd col 0 below 0.5
            order = 1.0 - ((w >> (2 * A)) & 1).astype(jnp.float32)
            rnd = jnp.concatenate([order[:, None], unif[:, k]], axis=1)
        elif packed.ndim <= 1:
            # In-loop RNG: `packed` is a PRNG key; per-step draws fuse
            # into their consumers instead of round-tripping a pre-drawn
            # (B, K*(A+3)) buffer through HBM (distribution-identical,
            # different stream layout — SURVEY.md §2.3 parity bar).
            kk = jax.random.fold_in(packed, k)
            k_a, k_r = jax.random.split(kk)
            acts = jax.random.randint(k_a, (B, A), 0, 4)
            rnd = jax.random.uniform(k_r, (B, 3))
        else:
            base = k * (A + 3)
            acts = packed[:, base : base + A].astype(jnp.int32)
            rnd = packed[:, base + A : base + A + 3]
        p, pos, picked = _step_math_packed(
            t, p, pos, acts, rnd, rect_bits, tril
        )
        got = picked >= 0  # (B, A)
        ps = jnp.clip(picked, 0, rwd_tab.shape[0] - 1)
        rew = rew + jnp.where(got, rwd_tab[ps], 0.0)
        bump = jax.nn.one_hot(
            slot_tab[ps], n_types, dtype=jnp.int32
        ) * got[..., None].astype(jnp.int32)
        cnt = cnt + bump
    return p, pos, rew, cnt.reshape(B, A * n_types)


def _collect_ms_math(t, K, go, gc, gs, pos, packed, rects, tril,
                     rwd_tab, slot_tab, n_types):
    """Three-plane facade over :func:`_collect_ms_math_packed`.

    The unrolled K steps run on ONE packed plane (obj|color<<4|slot<<8):
    a third of the slab working set / chunk-boundary traffic of three
    separate planes, and most per-step updates collapse to one select.
    Output-identical to K _step_math steps (pinned in
    tests/test_pallas.py).  (An int16 plane was tried and measured 7%
    SLOWER on-chip: sub-32-bit types pay (16,128)-tile relayouts that
    outweigh the byte savings at C=100 — same lesson as wildfire's int8
    boards needing layout-free draws.)"""
    p, pos, rew, cnt = _collect_ms_math_packed(
        t, K, pack_planes(go, gc, gs), pos, packed, _rect_bits(rects),
        tril, rwd_tab, slot_tab, n_types,
    )
    go, gc, gs = unpack_planes(p)
    return go, gc, gs, pos, rew, cnt


def make_collect_episode_rollout(
    cfg, chunk: int | None = None, interpret=None, use_kernel: bool = False,
    rnd_mode: str = "packed", prefix_mode: str = "adds",
):
    """Whole-episode rollout driver for truncation-only Collect configs.

    Returns rollout(states, key, num_steps) -> (states', metrics) matching
    BatchedEnv.rollout with uniform-random actions.  Requires a config that
    never terminates early (respawn or fixed_horizon) so that lockstep envs
    truncate together; num_steps must be a multiple of max_steps and states
    must be freshly reset (uniform step_count == 0).  Each max_steps episode
    runs as ceil(max_steps/chunk) plain-XLA chunk programs
    (:func:`_collect_ms_math_packed`) with bulk pre-drawn randomness and
    the packed-plane `_reset_math_packed` reset, with the board carried
    packed through the whole rollout.

    The fused multi-step episode KERNELS this factory used to offer were
    pruned in round 5 after the slab-width sweep confirmed they lose
    5-8x at every VMEM-feasible (chunk, BLK) point
    (artifacts/kernel_vs_xla.md); ``use_kernel=True`` warns and runs the
    XLA math.  The single-step kernel (:func:`collect_step_slab`) and
    reset kernel remain as the bit-compared second-backend validation
    layer.
    """
    from gym_multigrid_tpu.envs.collect import _wall_mask, make_collect

    assert cfg.respawn or cfg.fixed_horizon, "early termination breaks lockstep"
    if cfg.num_agents not in (1, 2):
        return None
    if use_kernel:
        import warnings

        warnings.warn(
            "the multi-step episode kernels were pruned (losing 5-8x at "
            "every feasible slab shape — artifacts/kernel_vs_xla.md); "
            "running the identical plain-XLA episode math",
            stacklevel=2,
        )
        use_kernel = False
    t = make_tables(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # chunk: 25 measured fastest for the XLA form on v5e @ 8192
    # (round-5 sweeps: 25 ≈ 50 > 10).
    chunk = chunk or 25
    from gym_multigrid_tpu.envs.collect import build_plan, reward_slot_tables

    slot_rewards_np, slot_info_np, _ = reward_slot_tables(cfg, build_plan(cfg))
    A = cfg.num_agents
    n_types = cfg.num_ball_types
    # Static arrays for the XLA (use_kernel=False) path.
    C = cfg.num_cells
    _ms_rects = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
    # prefix_mode picks the XLA path's prefix-sum form for the respawn
    # picks (bit-identical outputs either way — 0/1 counts <= C are exact
    # in f32): "adds" = log2(C) shifted integer adds (no MXU work, but
    # each stage is a (B, C) intermediate XLA may materialize); "matmul" =
    # one (B,C)x(C,C) MXU matmul per pick (one intermediate, FLOPs ride
    # the otherwise-idle MXU).  The kernels always keep the tril form.
    if prefix_mode in ("matmul", "matmul_bf16", "matmul_mixed", "matmul_s8"):
        assert C <= 256, "bf16/f32 prefix counts need exact ints <= 256"
        _ms_tril = jnp.asarray(
            np.tril(np.ones((C, C), dtype=np.float32)).T,
            dtype=(
                jnp.int8 if prefix_mode == "matmul_s8"
                else jnp.bfloat16
                if prefix_mode in ("matmul_bf16", "matmul_mixed")
                else jnp.float32
            ),
        )
        # "matmul_mixed": bf16 operands (halves the mask-plane write, the
        # binding VMEM-write resource) but f32 MXU accumulation and an
        # f32 cum plane — downstream compares stay f32, avoiding the
        # (16,128)-tile relayouts that made the all-bf16 form measure
        # 498M vs f32's 680M once the int32 convert was removed
        # (2026-08-20 sweep).  "matmul_s8": int8 0/1 operands with int32
        # accumulation — a quarter of the operand bytes, exact at any
        # C (0/1 products can't overflow a 32-bit accumulator), and the
        # cum plane comes out s32 so the downstream compares are native
        # int vector ops.  All forms bit-identical.
        if prefix_mode in ("matmul_mixed", "matmul_s8"):
            _ms_tril = _MixedTril(_ms_tril)
    else:
        _ms_tril = None
    _ms_rwd = jnp.asarray(slot_rewards_np, dtype=jnp.float32)
    _ms_slot = jnp.asarray(slot_info_np, dtype=jnp.int32)

    draw_packed = rnd_mode in ("packed", "packedbits")
    draw_bits = rnd_mode == "packedbits"
    _ms_rect_bits = _rect_bits(_ms_rects) if t.respawn else None
    rt, plan = make_reset_tables(cfg)
    wall_np = np.array(_wall_mask(cfg), dtype=np.bool_)
    _rs_rects_np = plan.ball_rects.copy()
    _rs_rects_np &= ~wall_np[None, :]
    _rs_rects = jnp.asarray(_rs_rects_np)
    _rs_wall_row = jnp.asarray(wall_np)[None, :]
    n_reset_draws = len(rt.ball_colors) + cfg.num_agents

    def _draw_step_rnd(k_launch, B, K):
        if draw_bits:
            # "packedbits": one u32 word (actions + order coin) + two f32
            # spawn uniforms per env step — see _collect_ms_math_packed.
            k_w, k_r = jax.random.split(k_launch)
            words = jax.random.bits(k_w, (B, K), jnp.uint32)
            unif = jax.random.uniform(k_r, (B, K, 2))
            return (words, unif)
        k_a, k_r = jax.random.split(k_launch)
        acts = jax.random.randint(k_a, (B, K, A), 0, 4).astype(jnp.float32)
        rnd = jax.random.uniform(k_r, (B, K, 3))
        # Collect keeps the single packed buffer on BOTH paths: its
        # stride is 5 floats/step, and the unconcatenated tuple form
        # measured 5% SLOWER (fragmented fusion), the opposite of
        # maze/ctf whose strides are larger.
        return jnp.concatenate([acts, rnd], axis=2).reshape(B, K * (A + 3))

    def _one_episode_packed(p, pos, coll, info, keys, key):
        """One max_steps episode on the PACKED plane carry.

        Chunked :func:`_collect_ms_math_packed` steps with bulk pre-drawn
        randomness, then the lockstep truncation reset keyed off the
        per-env state keys.  The plane stays packed through
        chunk AND episode boundaries: the truncation reset writes the
        next episode's board directly in packed form
        (:func:`_reset_math_packed`), so the only pack/unpack in the
        whole rollout is the facade at its entry/exit.

        NEGATIVE RESULT (round 4, measured): an O(n_balls) array-state
        form of this loop (ball positions as (B, 15) columns,
        closed-form rank-skip respawn picks — bit-identical outputs) ran
        185M vs this path's 543M agent-steps/s.  TPU lanes quantize to
        128: a (B, 17) column op costs the same vreg row as (B, 128), so
        "narrow" state buys nothing while the per-slot column ops and
        the 17-stage rank sort multiply op count.  Plane math at C<=128
        is already lane-optimal.
        """
        B = p.shape[0]
        reward_sum = jnp.float32(0.0)
        done = 0
        while done < cfg.max_steps:
            K = min(chunk, cfg.max_steps - done)
            key, k_launch = jax.random.split(key)
            packed = (
                _draw_step_rnd(k_launch, B, K) if draw_packed else k_launch
            )
            p, pos, rew, cnt = _collect_ms_math_packed(
                t, K, p, pos, packed, _ms_rect_bits, _ms_tril,
                _ms_rwd, _ms_slot, n_types,
            )
            reward_sum = reward_sum + jnp.sum(rew)
            coll = coll + jnp.sum(cnt.reshape(B, A, -1), axis=(1, 2))
            info = info + cnt.reshape(B, A, -1)
            done += K
        # truncation reset, in packed form; key handling matches
        # make_collect_reset_batch exactly (same splits, same draws).
        new_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        rnd = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.split(k)[1], (n_reset_draws,)
            )
        )(keys)
        p, pos = _reset_math_packed(rt, _rs_wall_row, _rs_rects, rnd, _ms_tril)
        coll = jnp.zeros((B,), jnp.int32)
        info = jnp.zeros((B, A, n_types), jnp.int32)
        return p, pos, coll, info, new_keys, reward_sum

    def rollout(states, key, num_steps: int):
        assert num_steps % cfg.max_steps == 0
        B = states.grid_obj.shape[0]
        n_eps = num_steps // cfg.max_steps

        # One episode body in the graph, scanned — keeps compile time flat
        # in num_steps (inlining every episode's reset program blows up the
        # HLO otherwise).  Packed-plane carry (see _one_episode_packed);
        # one pack here, one unpack below.
        p0 = pack_planes(
            states.grid_obj, states.grid_color, states.grid_slot
        )

        def body(carry, _):
            p, pos, coll, info, keys, key, reward_sum = carry
            key, k_ep = jax.random.split(key)
            p, pos, coll, info, keys, r = _one_episode_packed(
                p, pos, coll, info, keys, k_ep
            )
            return (p, pos, coll, info, keys, key, reward_sum + r), None

        carry0 = (
            p0,
            states.agent_pos.reshape(B, -1),
            states.collected,
            states.info_counts,
            states.key,
            key,
            jnp.float32(0.0),
        )
        (p, pos, coll, info, keys, key, reward_sum), _ = jax.lax.scan(
            body, carry0, None, length=n_eps
        )
        go, gc, gs = unpack_planes(p)
        states = type(states)(
            grid_obj=go,
            grid_color=gc,
            grid_slot=gs,
            agent_pos=pos.reshape(B, -1, 2),
            collected=coll,
            # every episode in this rollout completed (lockstep
            # truncation), so step_count restarts at 0
            step_count=jnp.zeros((B,), jnp.int32),
            info_counts=info,
            key=keys,
        )
        episodes = jnp.int32(B * n_eps)
        return states, {
            "reward_sum": reward_sum,
            "episodes": episodes,
            "ep_return_sum": reward_sum,
            "run_return": jnp.zeros((B,), jnp.float32),
        }

    return rollout


# ---------------------------------------------------------------------------
# Fused reset kernel
# ---------------------------------------------------------------------------


class _ResetTables(NamedTuple):
    """Static reset program (from envs/collect.build_plan)."""

    n_cells: int
    empty: int
    wall: int
    ball: int
    agent: int
    wall_color: int
    ball_colors: tuple[int, ...]  # per placement
    agent_colors: tuple[int, ...]
    balls_before_agents: bool
    agent_fixed: tuple[tuple[int, int], ...] | None
    agent_choice: tuple[tuple[int, int], ...] | None  # static coord pool
    width: int


def make_reset_tables(cfg):
    from gym_multigrid_tpu.core.constants import COLOR_TO_IDX
    from gym_multigrid_tpu.core.world import CollectWorld
    from gym_multigrid_tpu.envs.collect import build_plan

    plan = build_plan(cfg)
    idx = CollectWorld.OBJECT_TO_IDX
    rt = _ResetTables(
        n_cells=cfg.num_cells,
        empty=idx["empty"],
        wall=idx["wall"],
        ball=idx["ball"],
        agent=idx["agent"],
        wall_color=COLOR_TO_IDX["grey"],
        ball_colors=tuple(int(c) for c in plan.ball_colors),
        agent_colors=tuple(int(c) for c in cfg.agents_index),
        balls_before_agents=plan.balls_before_agents,
        agent_fixed=plan.agent_fixed,
        agent_choice=(
            tuple((int(x), int(y)) for x, y in plan.agent_choice_coords)
            if plan.agent_choice_coords is not None
            else None
        ),
        width=cfg.width,
    )
    return rt, plan


def _masked_pick(mask, u, tril):
    """One-hot over (B, C) ``mask``: floor(u*count)-th set bit, exactly
    uniform per row.  tril = the prefix-sum matmul (Mosaic kernels);
    tril = None = integer log-doubling prefix sum (plain XLA) —
    bit-identical either way."""
    cum, count = _prefix_counts(mask, tril)
    r = jnp.minimum(
        (u * count.astype(jnp.float32)).astype(jnp.int32), count - 1
    )
    return (cum == (r + 1).astype(cum.dtype)) & mask


def _reset_math(rt: _ResetTables, wall_row, ball_rects, rnd, tril):
    """Sequential placement program for a (B, C) slab.

    wall_row:   (1, C) bool static wall mask (row-broadcast)
    ball_rects: (n_balls, C) bool placement rects (sequential order)
    rnd:        (B, n_balls + n_agents) uniforms
    Returns (go, gc, gs, pos) with pos (B, 2*A); gs holds each placed
    ball's reward-table slot (its placement index).
    """
    B = rnd.shape[0]
    C = rt.n_cells
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    go = jnp.where(wall_row, rt.wall, rt.empty) + jnp.zeros((B, C), jnp.int32)
    gc = jnp.where(wall_row, rt.wall_color, 0) + jnp.zeros((B, C), jnp.int32)
    gs = jnp.zeros((B, C), jnp.int32)
    A = len(rt.agent_colors)
    w = rt.width
    pos_cols = []

    def place_balls(go, gc, gs, base):
        for b, color in enumerate(rt.ball_colors):
            mask = ball_rects[b][None, :] & (go == rt.empty)
            hit = _masked_pick(mask, rnd[:, base + b : base + b + 1], tril)
            go = jnp.where(hit, rt.ball, go)
            gc = jnp.where(hit, int(color), gc)
            gs = jnp.where(hit, b, gs)
        return go, gc, gs

    def place_agents(go, gc, gs, base):
        cols = []
        for i, color in enumerate(rt.agent_colors):
            if rt.agent_fixed is not None:
                x, y = rt.agent_fixed[i]
                idx = jnp.full((B, 1), y * w + x, dtype=jnp.int32)
            elif rt.agent_choice is not None:
                u = rnd[:, base + i : base + i + 1]
                n = len(rt.agent_choice)
                j = jnp.minimum((u * n).astype(jnp.int32), n - 1)
                idx = jnp.zeros((B, 1), jnp.int32)
                for k, (x, y) in enumerate(rt.agent_choice):
                    idx = jnp.where(j == k, y * w + x, idx)
            else:
                mask = go == rt.empty
                hit = _masked_pick(mask, rnd[:, base + i : base + i + 1], tril)
                idx = jnp.sum(
                    jnp.where(hit, lane, 0), axis=1, keepdims=True
                )
            hit = lane == idx
            go = jnp.where(hit, rt.agent, go)
            gc = jnp.where(hit, int(color), gc)
            gs = jnp.where(hit, 0, gs)
            cols.append(jnp.concatenate([idx % w, idx // w], axis=1))
        return go, gc, gs, cols

    nb = len(rt.ball_colors)
    if rt.balls_before_agents:
        go, gc, gs = place_balls(go, gc, gs, 0)
        go, gc, gs, pos_cols = place_agents(go, gc, gs, nb)
    else:
        go, gc, gs, pos_cols = place_agents(go, gc, gs, 0)
        go, gc, gs = place_balls(go, gc, gs, A)
    return go, gc, gs, jnp.concatenate(pos_cols, axis=1)


def _reset_math_packed(rt: _ResetTables, wall_row, ball_rects, rnd, tril):
    """:func:`_reset_math` writing the packed (obj|color<<4|slot<<8)
    plane directly — one select per placement instead of three, and the
    packed-plane episode rollout never has to unpack across episode
    boundaries.  pack_planes(*_reset_math(...)) equality is pinned in
    tests/test_pallas.py."""
    B = rnd.shape[0]
    C = rt.n_cells
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    wall_p = rt.wall | (rt.wall_color << 4)
    # (1, C) static board row; the first per-env placement write
    # broadcasts it to (B, C) implicitly — an explicit zeros-add here
    # materialized a whole (B, C) broadcast per reset (1.5% of device
    # time on the 2026-08-20 trace).
    p = jnp.where(wall_row, wall_p, rt.empty).astype(jnp.int32)
    A = len(rt.agent_colors)
    w = rt.width
    obj_mask = 15

    def place_balls(p, base):
        for b, color in enumerate(rt.ball_colors):
            mask = ball_rects[b][None, :] & ((p & obj_mask) == rt.empty)
            hit = _masked_pick(mask, rnd[:, base + b : base + b + 1], tril)
            p = jnp.where(hit, rt.ball | (int(color) << 4) | (b << 8), p)
        return p

    def place_agents(p, base):
        cols = []
        for i, color in enumerate(rt.agent_colors):
            if rt.agent_fixed is not None:
                x, y = rt.agent_fixed[i]
                idx = jnp.full((B, 1), y * w + x, dtype=jnp.int32)
            elif rt.agent_choice is not None:
                u = rnd[:, base + i : base + i + 1]
                n = len(rt.agent_choice)
                j = jnp.minimum((u * n).astype(jnp.int32), n - 1)
                idx = jnp.zeros((B, 1), jnp.int32)
                for k, (x, y) in enumerate(rt.agent_choice):
                    idx = jnp.where(j == k, y * w + x, idx)
            else:
                mask = (p & obj_mask) == rt.empty
                hit = _masked_pick(mask, rnd[:, base + i : base + i + 1], tril)
                idx = jnp.sum(
                    jnp.where(hit, lane, 0), axis=1, keepdims=True
                )
            hit = lane == idx
            p = jnp.where(hit, rt.agent | (int(color) << 4), p)
            cols.append(jnp.concatenate([idx % w, idx // w], axis=1))
        return p, cols

    nb = len(rt.ball_colors)
    if rt.balls_before_agents:
        p = place_balls(p, 0)
        p, pos_cols = place_agents(p, nb)
    else:
        p, pos_cols = place_agents(p, 0)
        p = place_balls(p, A)
    if p.shape[0] != B:  # degenerate all-fixed placement programs
        p = jnp.broadcast_to(p, (B, C))
    return p, jnp.concatenate(pos_cols, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 2, 5))
def collect_reset_slab(rt: _ResetTables, rnd, wall_tuple, ball_rects, tril, interpret=False):
    """Fused whole-board reset for a batch: one kernel, all placements."""
    B = rnd.shape[0]
    C = rt.n_cells
    n_rects = ball_rects.shape[0]
    wall_row = jnp.asarray(np.array(wall_tuple, dtype=np.bool_))[None, :]
    blk = min(MS_BLK, B)
    grid = (pl.cdiv(B, blk),)
    A = len(rt.agent_colors)

    def kernel(rnd_ref, wall_ref, rects_ref, tril_ref, go_out, gc_out,
               gs_out, pos_out):
        go, gc, gs, pos = _reset_math(
            rt, wall_ref[:], rects_ref[:], rnd_ref[:], tril_ref[:]
        )
        go_out[:] = go
        gc_out[:] = gc
        gs_out[:] = gs
        pos_out[:] = pos

    def row_spec(cols):
        return pl.BlockSpec((blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(rnd.shape[1]),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rects, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(C), row_spec(C), row_spec(C), row_spec(2 * A)],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 2 * A), jnp.int32),
        ],
        interpret=interpret,
    )(rnd, wall_row, ball_rects, tril)


def make_collect_reset_batch(
    cfg, interpret: bool | None = None, use_kernel: bool = True
):
    """Batch reset via the fused placement program: keys (B,) -> CollectState.

    Distribution-identical to vmap(reset_fn): every placement is uniform
    over the empty cells of its rect, drawn sequentially.  use_kernel=False
    runs the identical math (:func:`_reset_math`) as plain XLA.
    """
    from gym_multigrid_tpu.envs.collect import CollectState, _wall_mask, build_plan

    if cfg.num_agents not in (1, 2):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rt, plan = make_reset_tables(cfg)
    wall_tuple = tuple(bool(b) for b in _wall_mask(cfg))
    ball_rects_np = plan.ball_rects.copy()
    # Placement masks must exclude walls (place_obj only samples empty
    # cells; walls are non-empty from the start).
    ball_rects_np &= ~np.array(wall_tuple, dtype=bool)[None, :]
    ball_rects = jnp.asarray(ball_rects_np)
    C = cfg.num_cells
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)
    n_draws = len(rt.ball_colors) + cfg.num_agents
    A = cfg.num_agents

    def reset_batch(keys):
        B = keys.shape[0]
        new_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        rnd = jax.vmap(lambda k: jax.random.uniform(jax.random.split(k)[1], (n_draws,)))(keys)
        if use_kernel:
            go, gc, gs, pos = collect_reset_slab(
                rt, rnd, wall_tuple, ball_rects, tril, interpret
            )
        else:
            wall_row = jnp.asarray(np.array(wall_tuple, dtype=np.bool_))[
                None, :
            ]
            go, gc, gs, pos = _reset_math(rt, wall_row, ball_rects, rnd, tril)
        return CollectState(
            grid_obj=go,
            grid_color=gc,
            grid_slot=gs,
            agent_pos=pos.reshape(B, A, 2),
            collected=jnp.zeros((B,), jnp.int32),
            step_count=jnp.zeros((B,), jnp.int32),
            info_counts=jnp.zeros((B, A, cfg.num_ball_types), jnp.int32),
            key=new_keys,
        )

    return reset_batch
