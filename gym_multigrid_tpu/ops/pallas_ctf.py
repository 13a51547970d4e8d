"""Fused Pallas kernel for the CtF step.

The XLA CtF step is a long dependency chain of tiny per-agent ops
(sequential random-order moves, pairwise battles, scripted policies) — at
batch scale it is launch/latency bound.  This kernel runs the whole
transition for a slab of envs in one pass: scripted red policies, the
random-order move loop, flag captures, sequential battles and rewards.

Same testing contract as the Collect kernels: all randomness comes in as
pre-drawn uniforms, the kernel body IS the pure-jax spec
(:func:`_ctf_step_math`), bit-compared in tests/test_pallas_ctf.py, and the
spec itself is trajectory-differentially checked against the reference
via the same deterministic scripts as envs/ctf.py.

Distribution parity with envs/ctf.py (itself distribution-exact to the
reference, SURVEY.md §2.3): a uniform index into the static permutation
table equals jax.random.permutation; ``u < p`` equals the Bernoulli battle
draw; ``floor(u*n)`` equals uniform integer draws.

Envelope: both variants (MvN shuffled move order / 1v1 fixed blue-then-red
with episode-ending battle loss and obstacle cells), n_agents <= 8 (move
order via the A! table up to 4 agents, Fisher-Yates draws beyond).
Outside it ``make_ctf_step_batch`` warns and returns None so the caller
uses the XLA path.
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_multigrid_tpu.ops.sampling import PickState

CTF_BLK = 256  # envs per program instance

A_STAY, A_LEFT, A_DOWN, A_RIGHT, A_UP = 0, 1, 2, 3, 4
NUM_ACTIONS = 5
# stay/left/down/right/up deltas (ctf.py:1189-1201)
_DX = (0, 0, -1, 0, 1)
_DY = (0, -1, 0, 1, 0)
# action -> render dir (envs/ctf.py act_to_dir)
_A2DIR = (3, 3, 2, 1, 0)


class CtfKTables(NamedTuple):
    """Static per-config tables (hashable)."""

    mvn: bool
    s0: int
    s1: int
    n_blue: int
    n_red: int
    bound0: int  # pos[0] upper bound (reference uses shape[1]! ctf.py:472)
    bound1: int
    blue_flag: tuple[int, int]
    red_flag: tuple[int, int]
    battle_range: float
    randomness: float
    flag_reward: float
    battle_reward: float
    obstacle_penalty: float
    step_penalty: float
    max_steps: int
    # per red agent: ("rw"|"fight"|"capture"|"patrol"|"patrol_fight", randomness)
    policies: tuple[tuple[str, float], ...]


def make_ctf_ktables(cfg):
    from gym_multigrid_tpu.envs.ctf import build_tables

    t = build_tables(cfg)
    S0, S1 = t.fm.shape
    return CtfKTables(
        mvn=cfg.variant == "mvn",
        s0=S0,
        s1=S1,
        n_blue=cfg.num_blue_agents,
        n_red=cfg.num_red_agents,
        bound0=S1,
        bound1=S0,
        blue_flag=(int(t.blue_flag[0]), int(t.blue_flag[1])),
        red_flag=(int(t.red_flag[0]), int(t.red_flag[1])),
        battle_range=float(cfg.battle_range),
        randomness=float(cfg.randomness),
        flag_reward=float(cfg.flag_reward),
        battle_reward=float(cfg.battle_reward),
        obstacle_penalty=float(cfg.obstacle_penalty),
        step_penalty=float(cfg.step_penalty),
        max_steps=int(cfg.max_steps),
        policies=tuple(
            (s.kind, float(s.randomness)) for s in cfg.enemy_policies
        ),
    )


def ctf_static_inputs(cfg):
    """Dense per-cell/static arrays the kernel consumes as refs."""
    from gym_multigrid_tpu.envs.ctf import build_tables
    from gym_multigrid_tpu.policy.ctf.heuristic import PatrolPolicy

    t = build_tables(cfg)
    N = t.fm.size
    cells = np.zeros((4, N), dtype=np.int32)
    cells[0] = t.can_enter.reshape(-1)
    cells[1] = t.blue_mask.reshape(-1)
    cells[2] = t.red_mask.reshape(-1)
    cells[3] = t.obstacle_mask.reshape(-1)  # 1v1 obstacle-penalty check

    needs_patrol = any(
        s.kind in ("patrol", "patrol_fight") for s in cfg.enemy_policies
    )
    if needs_patrol:
        pp = PatrolPolicy(field_map=t.fm, ego_agent="red")
        border = np.asarray(pp.border, dtype=np.int32).reshape(-1, 2)
        pool = np.asarray(pp.patrol_targets(), dtype=np.int32).reshape(-1, 2)
    else:
        border = np.zeros((1, 2), dtype=np.int32)
        pool = np.zeros((1, 2), dtype=np.int32)
    # transpose to (2, n) rows so the lane axis carries the list
    return (
        jnp.asarray(cells),
        jnp.asarray(border.T.copy()),
        jnp.asarray(pool.T.copy()),
    )


def n_perm_draws(t: CtfKTables) -> int:
    """Uniform draws for the MvN move-order permutation: one index into
    the A! table for small teams, A-1 Fisher–Yates draws otherwise (the
    table would need A! selects).  Both are exactly uniform permutations
    (distribution-parity with jax.random.permutation, SURVEY.md §2.3)."""
    A = t.n_blue + t.n_red
    return 1 if A <= 4 else A - 1


def rnd_width(t: CtfKTables) -> int:
    """Uniforms per env per step: perm draws + 3 per red policy + battles."""
    return n_perm_draws(t) + 3 * t.n_red + t.n_blue * t.n_red


def _cell_flag(cells_row, flat_idx, lane):
    """(B,1) bool: static per-cell flag at flat_idx via one-hot reduce."""
    return (
        jnp.sum(
            jnp.where(lane == flat_idx, cells_row, 0), axis=1, keepdims=True
        )
        > 0
    )


def _optimal_action_cols(cr, cc, tr, tc):
    """Closed-form reference-A* first step on (B,1) columns
    (envs/ctf.py _optimal_action)."""
    dr = tr - cr
    dc = tc - cc
    col = jnp.where(dc < 0, A_LEFT, A_RIGHT)
    return jnp.where(
        (dr == 0) & (dc == 0),
        A_STAY,
        jnp.where(dr < 0, A_DOWN, jnp.where(dc != 0, col, A_UP)),
    ).astype(jnp.int32)


def _ctf_step_math(t: CtfKTables, pos, dirs, term, coll, blue_actions, rnd,
                   cells, border, pool):
    """One CtF transition (both variants) for a (B, ·) slab.

    pos:  (B, 2*A) i32; dirs/term/coll: (B, A) i32 (0/1 flags)
    blue_actions: (B, n_blue) i32
    rnd:  (B, rnd_width) f32 uniforms
    cells: (4, N) i32 rows [can_enter, blue_mask, red_mask, obstacle_mask]
    border/pool: (2, nb)/(2, np) i32 patrol tables

    Returns (pos, dirs, term, coll, reward(B,1), episode_term(B,1) i32,
    rfc(B,1), bfc(B,1), bbl(B,n_blue), brl(B,n_red)).
    """
    B = pos.shape[0]
    A = t.n_blue + t.n_red
    N = t.s0 * t.s1
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def col(arr, i):
        return arr[:, i : i + 1]

    px = [col(pos, 2 * i) for i in range(A)]
    py = [col(pos, 2 * i + 1) for i in range(A)]
    tm = [col(term, i) for i in range(A)]
    cl = [col(coll, i) for i in range(A)]
    dr_ = [col(dirs, i) for i in range(A)]

    def clip_flat(cx, cy):
        qx = jnp.clip(cx, 0, t.s0 - 1)
        qy = jnp.clip(cy, 0, t.s1 - 1)
        return qx * t.s1 + qy

    # ---- scripted red actions from PRE-move state (ctf.py:1297-1301) ----
    perm_draws = n_perm_draws(t)
    red_acts = []
    for r, (kind, p_opt) in enumerate(t.policies):
        base = perm_draws + 3 * r
        u_t, u_g, u_a = (
            col(rnd, base),
            col(rnd, base + 1),
            col(rnd, base + 2),
        )
        cr, cc = px[t.n_blue + r], py[t.n_blue + r]
        if kind == "rw":
            red_acts.append(
                jnp.minimum(
                    (u_a * NUM_ACTIONS).astype(jnp.int32), NUM_ACTIONS - 1
                )
            )
            continue
        if kind == "capture":
            trow = jnp.full((B, 1), t.blue_flag[0], jnp.int32)
            tcol = jnp.full((B, 1), t.blue_flag[1], jnp.int32)
        else:
            # closest blue agent (ties -> first index, like argmin)
            best_d = None
            trow_f = tcol_f = None
            for b in range(t.n_blue):
                d = (
                    (px[b] - cr).astype(jnp.float32) ** 2
                    + (py[b] - cc).astype(jnp.float32) ** 2
                )
                if best_d is None:
                    best_d, trow_f, tcol_f = d, px[b], py[b]
                else:
                    better = d < best_d
                    trow_f = jnp.where(better, px[b], trow_f)
                    tcol_f = jnp.where(better, py[b], tcol_f)
                    best_d = jnp.minimum(d, best_d)
            trow, tcol = trow_f, tcol_f
        if kind in ("patrol", "patrol_fight"):
            nb = border.shape[1]
            npool = pool.shape[1]
            # on border?
            onb = jnp.zeros((B, 1), dtype=bool)
            for k in range(nb):
                onb = onb | ((cr == border[0, k]) & (cc == border[1, k]))
            # uniform choice over the multiplicity-weighted pool
            j = jnp.minimum((u_t * npool).astype(jnp.int32), npool - 1)
            prow = jnp.zeros((B, 1), jnp.int32)
            pcol = jnp.zeros((B, 1), jnp.int32)
            for k in range(npool):
                prow = jnp.where(j == k, pool[0, k], prow)
                pcol = jnp.where(j == k, pool[1, k], pcol)
            # closest border cell (ties -> first)
            best_d = None
            brow = bcol = None
            for k in range(nb):
                d = (
                    (cr - border[0, k]).astype(jnp.float32) ** 2
                    + (cc - border[1, k]).astype(jnp.float32) ** 2
                )
                if best_d is None:
                    best_d = d
                    brow = jnp.broadcast_to(border[0, k], (B, 1)).astype(jnp.int32)
                    bcol = jnp.broadcast_to(border[1, k], (B, 1)).astype(jnp.int32)
                else:
                    better = d < best_d
                    brow = jnp.where(better, border[0, k], brow)
                    bcol = jnp.where(better, border[1, k], bcol)
                    best_d = jnp.minimum(d, best_d)
            patrol_row = jnp.where(onb, prow, brow)
            patrol_col = jnp.where(onb, pcol, bcol)
            if kind == "patrol":
                trow, tcol = patrol_row, patrol_col
            else:
                # chase once any blue stands in red territory (incl. flag)
                opp_in = jnp.zeros((B, 1), dtype=bool)
                for b in range(t.n_blue):
                    opp_in = opp_in | _cell_flag(
                        cells[2][None, :], clip_flat(px[b], py[b]), lane
                    )
                trow = jnp.where(opp_in, trow, patrol_row)
                tcol = jnp.where(opp_in, tcol, patrol_col)
        optimal = _optimal_action_cols(cr, cc, trow, tcol)
        rand_act = jnp.minimum(
            (u_a * NUM_ACTIONS).astype(jnp.int32), NUM_ACTIONS - 1
        )
        red_acts.append(jnp.where(u_g < p_opt, optimal, rand_act))

    acts = [
        jnp.clip(col(blue_actions, b), 0, NUM_ACTIONS - 1)
        for b in range(t.n_blue)
    ] + red_acts

    # ---- sequential moves: MvN shuffles the order (ctf.py:1240-1251);
    # 1v1 is fixed blue-then-red (ctf.py:503-510) ------------------------
    if t.mvn and A <= 4:
        perms = list(itertools.permutations(range(A)))
        j = jnp.minimum(
            (col(rnd, 0) * len(perms)).astype(jnp.int32), len(perms) - 1
        )
    elif t.mvn:
        # Fisher–Yates: slot k's mover is the floor(u_k * (A-k))-th not-
        # yet-moved agent — uniform over permutations for any team size.
        fy_taken = [jnp.zeros((B, 1), jnp.int32) for _ in range(A)]
    for slot in range(A):
        # the slot-th mover's agent id per row
        if t.mvn and A <= 4:
            i_vec = jnp.zeros((B, 1), jnp.int32)
            for k, perm in enumerate(perms):
                i_vec = jnp.where(j == k, perm[slot], i_vec)
        elif t.mvn:
            remaining = A - slot
            if slot < A - 1:
                u = col(rnd, slot)
                r_pick = jnp.minimum(
                    (u * remaining).astype(jnp.int32), remaining - 1
                )
            else:
                r_pick = jnp.zeros((B, 1), jnp.int32)
            cnt = jnp.zeros((B, 1), jnp.int32)
            i_vec = jnp.zeros((B, 1), jnp.int32)
            sel_done = jnp.zeros((B, 1), dtype=bool)
            for i in range(A):
                untaken = fy_taken[i] == 0
                hit = untaken & (cnt == r_pick) & ~sel_done
                i_vec = jnp.where(hit, i, i_vec)
                sel_done = sel_done | hit
                cnt = cnt + untaken.astype(jnp.int32)
            for i in range(A):
                fy_taken[i] = jnp.maximum(
                    fy_taken[i], (i_vec == i).astype(jnp.int32)
                )
        else:
            i_vec = jnp.full((B, 1), slot, jnp.int32)

        def sel(cols_list):
            out = cols_list[0]
            for i in range(1, A):
                out = jnp.where(i_vec == i, cols_list[i], out)
            return out

        act = sel(acts)
        cr, cc = sel(px), sel(py)
        alive = sel(tm) == 0
        dx = jnp.zeros((B, 1), jnp.int32)
        dy = jnp.zeros((B, 1), jnp.int32)
        for a in range(NUM_ACTIONS):
            dx = jnp.where(act == a, _DX[a], dx)
            dy = jnp.where(act == a, _DY[a], dy)
        nr, nc = cr + dx, cc + dy
        inb = (nr >= 0) & (nc >= 0) & (nr < t.bound0) & (nc < t.bound1)
        static_ok = _cell_flag(cells[0][None, :], clip_flat(nr, nc), lane)
        occupied = jnp.zeros((B, 1), dtype=bool)
        for i in range(A):
            occupied = occupied | ((px[i] == nr) & (py[i] == nc))
        if t.mvn and t.obstacle_penalty != 0:
            hit_agent = alive & inb & occupied
            for i in range(A):
                cl[i] = jnp.where(
                    i_vec == i, jnp.maximum(cl[i], hit_agent.astype(jnp.int32)), cl[i]
                )
        can_move = alive & inb & static_ok & ~occupied
        new_dir = jnp.zeros((B, 1), jnp.int32)
        for a in range(NUM_ACTIONS):
            new_dir = jnp.where(act == a, _A2DIR[a], new_dir)
        for i in range(A):
            mine = i_vec == i
            px[i] = jnp.where(mine & can_move, nr, px[i])
            py[i] = jnp.where(mine & can_move, nc, py[i])
            dr_[i] = jnp.where(mine & can_move, new_dir, dr_[i])

    # ---- collided penalty + termination, MvN only (ctf.py:1316-1332) ----
    reward = jnp.zeros((B, 1), jnp.float32)
    episode_term = jnp.zeros((B, 1), dtype=bool)
    if t.mvn and t.obstacle_penalty != 0:
        for b in range(t.n_blue):
            reward = reward - t.obstacle_penalty * cl[b].astype(jnp.float32)
        for i in range(A):
            tm[i] = jnp.maximum(tm[i], cl[i])

    # ---- flag captures (ctf.py:1334-1356) -------------------------------
    rfc = jnp.zeros((B, 1), dtype=bool)
    bfc = jnp.zeros((B, 1), dtype=bool)
    for b in range(t.n_blue):
        on = (px[b] == t.red_flag[0]) & (py[b] == t.red_flag[1])
        reward = reward + t.flag_reward * on.astype(jnp.float32)
        rfc = rfc | on
    for r in range(t.n_red):
        i = t.n_blue + r
        on = (px[i] == t.blue_flag[0]) & (py[i] == t.blue_flag[1])
        reward = reward - t.flag_reward * on.astype(jnp.float32)
        bfc = bfc | on
    episode_term = episode_term | rfc | bfc

    # ---- battles, row-major sequential (ctf.py:1358-1420) ---------------
    bbl = [jnp.zeros((B, 1), dtype=bool) for _ in range(t.n_blue)]
    brl = [jnp.zeros((B, 1), dtype=bool) for _ in range(t.n_red)]
    ub_base = perm_draws + 3 * t.n_red
    # Own-territory flags depend only on each agent's (fixed, post-move)
    # position — hoisted out of the pair loop so the battle resolution
    # pays n_blue + n_red one-hot reduces instead of 2 * n_blue * n_red
    # (positions don't change mid-battle; tm eligibility stays in-loop,
    # preserving the reference's sequential outcome updates).
    bin_own_l = [
        _cell_flag(cells[1][None, :], clip_flat(px[b], py[b]), lane)
        for b in range(t.n_blue)
    ]
    rin_own_l = [
        _cell_flag(
            cells[2][None, :],
            clip_flat(px[t.n_blue + r], py[t.n_blue + r]),
            lane,
        )
        for r in range(t.n_red)
    ]
    k = 0
    for b in range(t.n_blue):
        for r in range(t.n_red):
            if not t.mvn and (b, r) != (0, 0):
                continue
            i = t.n_blue + r
            d2 = (
                (px[b] - px[i]).astype(jnp.float32) ** 2
                + (py[b] - py[i]).astype(jnp.float32) ** 2
            )
            eligible = (
                (d2 <= t.battle_range * t.battle_range)
                & (tm[b] == 0)
                & (tm[i] == 0)
            )
            bin_own = bin_own_l[b]
            rin_own = rin_own_l[r]
            p_blue = jnp.where(
                bin_own == rin_own,
                0.5,
                jnp.where(bin_own, t.randomness, 1.0 - t.randomness),
            )
            blue_win = col(rnd, ub_base + k) < p_blue
            k += 1
            win = eligible & blue_win
            lose = eligible & ~blue_win
            reward = reward + t.battle_reward * win.astype(jnp.float32)
            reward = reward - t.battle_reward * lose.astype(jnp.float32)
            tm[i] = jnp.maximum(tm[i], win.astype(jnp.int32))
            if t.mvn:
                tm[b] = jnp.maximum(tm[b], lose.astype(jnp.int32))
            else:
                # 1v1: blue losing ends the episode (ctf.py:633-636)
                episode_term = episode_term | lose
            brl[r] = brl[r] | win
            bbl[b] = bbl[b] | lose

    if t.mvn:
        all_blue_dead = jnp.ones((B, 1), dtype=bool)
        for b in range(t.n_blue):
            all_blue_dead = all_blue_dead & (tm[b] == 1)
        episode_term = episode_term | all_blue_dead
        reward = reward - t.step_penalty * t.n_blue
    else:
        # 1v1 obstacle penalty: standing on an obstacle cell costs and
        # ends the episode (ctf.py:640-648)
        if t.obstacle_penalty != 0:
            on_obs = _cell_flag(
                cells[3][None, :], clip_flat(px[0], py[0]), lane
            )
            reward = reward - t.obstacle_penalty * on_obs.astype(jnp.float32)
            episode_term = episode_term | on_obs
        reward = reward - t.step_penalty

    pos_out = jnp.concatenate(
        [v for i in range(A) for v in (px[i], py[i])], axis=1
    )
    return (
        pos_out,
        jnp.concatenate(dr_, axis=1),
        jnp.concatenate(tm, axis=1),
        jnp.concatenate(cl, axis=1),
        reward,
        episode_term.astype(jnp.int32),
        rfc.astype(jnp.int32),
        bfc.astype(jnp.int32),
        # cast bools per column BEFORE concatenating (Mosaic cannot bitcast
        # concatenated i1 vregs)
        jnp.concatenate([b.astype(jnp.int32) for b in bbl], axis=1),
        jnp.concatenate([r.astype(jnp.int32) for r in brl], axis=1),
    )


@functools.partial(jax.jit, static_argnums=(0, 9))
def ctf_step_slab(t: CtfKTables, pos, dirs, term, coll, blue_actions, rnd,
                  cells, border_pool, interpret=False):
    """pallas_call wrapper; border_pool = (border(2,nb), pool(2,np))."""
    B = pos.shape[0]
    A = t.n_blue + t.n_red
    border, pool = border_pool
    blk = min(CTF_BLK, B)
    grid = (pl.cdiv(B, blk),)
    N = t.s0 * t.s1

    def kernel(pos_ref, dirs_ref, term_ref, coll_ref, ba_ref, rnd_ref,
               cells_ref, border_ref, pool_ref, *outs):
        res = _ctf_step_math(
            t, pos_ref[:], dirs_ref[:], term_ref[:], coll_ref[:], ba_ref[:],
            rnd_ref[:], cells_ref[:], border_ref[:], pool_ref[:],
        )
        for o_ref, val in zip(outs, res):
            o_ref[:] = val

    def row_spec(cols):
        return pl.BlockSpec((blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full_spec(r, c):
        return pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_cols = [2 * A, A, A, A, 1, 1, 1, 1, t.n_blue, t.n_red]
    out_dtypes = [jnp.int32] * 4 + [jnp.float32] + [jnp.int32] * 5
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(2 * A),
            row_spec(A),
            row_spec(A),
            row_spec(A),
            row_spec(t.n_blue),
            row_spec(rnd.shape[1]),
            full_spec(4, N),
            full_spec(2, border.shape[1]),
            full_spec(2, pool.shape[1]),
        ],
        out_specs=[row_spec(c) for c in out_cols],
        out_shape=[
            jax.ShapeDtypeStruct((B, c), d)
            for c, d in zip(out_cols, out_dtypes)
        ],
        interpret=interpret,
    )(pos, dirs, term, coll, blue_actions, rnd, cells, border, pool)


def make_ctf_step_batch(cfg, interpret: bool | None = None,
                        use_kernel: bool = True):
    """Batch-level CtF step (BatchedEnv.step_batch contract).

    use_kernel=True runs the fused Pallas kernel; False runs the identical
    slab math as one plain-XLA whole-batch program (much faster than
    vmap(step_one)'s per-agent scalar chains — the default XLA path).
    Returns None when the config is outside the envelope; the caller
    falls back to vmap.
    """
    import warnings

    from gym_multigrid_tpu.envs.ctf import CtfState, make_ctf

    if cfg.num_agents > 8:
        if use_kernel:
            warnings.warn(
                f"use_pallas requested but CtF config has {cfg.num_agents} "
                "agents (kernel envelope: <= 8); falling back to the XLA "
                "path",
                stacklevel=2,
            )
        return None
    if any(
        s.kind not in ("rw", "fight", "capture", "patrol", "patrol_fight")
        for s in cfg.enemy_policies
    ):
        if use_kernel:
            warnings.warn(
                "use_pallas requested but an enemy PolicySpec is outside "
                "the kernel envelope (rw/fight/capture/patrol/"
                "patrol_fight); falling back to the XLA path",
                stacklevel=2,
            )
        return None
    t = make_ctf_ktables(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cells, border, pool = ctf_static_inputs(cfg)
    fns = make_ctf(cfg)
    R = rnd_width(t)
    A = cfg.num_agents

    def step_batch(states: CtfState, blue_actions: jax.Array):
        B = states.pos.shape[0]
        keys = jax.vmap(jax.random.split)(states.key)
        new_key, k_rnd = keys[:, 0], keys[:, 1]
        rnd = jax.vmap(lambda k: jax.random.uniform(k, (R,)))(k_rnd)

        args = (
            states.pos.reshape(B, -1),
            states.dir,
            states.terminated.astype(jnp.int32),
            states.collided.astype(jnp.int32),
            jnp.asarray(blue_actions).reshape(B, -1).astype(jnp.int32),
            rnd,
        )
        if use_kernel:
            (pos, dirs, term, coll, reward, ep_term, rfc, bfc, bbl, brl) = (
                ctf_step_slab(t, *args, cells, (border, pool), interpret)
            )
        else:
            # Same math, plain XLA: one whole-batch program, no vmap over
            # per-agent scalar chains.
            (pos, dirs, term, coll, reward, ep_term, rfc, bfc, bbl, brl) = (
                _ctf_step_math(t, *args, cells, border, pool)
            )
        step_count = states.step_count + 1
        new_states = CtfState(
            pos=pos.reshape(B, A, 2),
            dir=dirs,
            terminated=term.astype(bool),
            collided=coll.astype(bool),
            step_count=step_count,
            key=new_key,
        )
        obs = jax.vmap(fns.obs_fn)(new_states)
        info = jax.vmap(fns.info_fn)(new_states)
        info = dict(
            info,
            red_flag_captured=rfc[:, 0].astype(bool),
            blue_flag_captured=bfc[:, 0].astype(bool),
            agent_terminated=term.astype(bool),
            battle_blue_lost=bbl.astype(bool),
            battle_red_lost=brl.astype(bool),
        )
        return (
            new_states,
            obs,
            reward[:, 0],
            ep_term[:, 0].astype(bool),
            step_count >= cfg.max_steps,
            info,
        )

    return step_batch


# ---------------------------------------------------------------------------
# Fused reset + multi-step episode kernel
# ---------------------------------------------------------------------------


def _ctf_reset_math(t: CtfKTables, rnd, bterr, rterr):
    """Spawn positions for a (B, ·) slab: MvN draws non-overlapping cells
    per team (envs/ctf.py reset_fn <- ctf.py:1033-1048), 1v1 draws
    independently (ctf.py:314-323).  rnd: (B, n_blue + n_red) uniforms;
    bterr/rterr: (2, n) i32 territory coordinate lists.

    Each team's without-replacement picks start from the all-free lane
    set, whose prefix sum is just lane+1, and PickState's one-pass
    decrement update covers the later picks — so the spawn draw needs no
    prefix sums (and, in the kernels, no (n,n) tril matmuls) at all,
    bit-identically to recomputing them (ops/sampling.py).

    Returns pos (B, 2*A) i32.
    """
    B = rnd.shape[0]
    nb = bterr.shape[1]
    nr = rterr.shape[1]

    def draw_team(terr, n_cells_, n_agents, base):
        cols = []
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, n_cells_), 1)
        ps = PickState.full(B, n_cells_, lane)
        for a in range(n_agents):
            u = rnd[:, base + a : base + a + 1]
            if t.mvn:
                _, idx, ps = ps.pick(u)
            else:
                idx = jnp.minimum(
                    (u * n_cells_).astype(jnp.int32), n_cells_ - 1
                )
            # one-hot reduce (not an unrolled per-cell select chain —
            # this runs inside unrolled multi-step kernels).  Both
            # coordinates ride ONE reduce as a packed r0|r1<<8 word
            # (coords < 256; same trick as maze_reset_math — this runs
            # discarded on every not-done step of the episode paths).
            hit_l = lane == idx
            pk = terr[0] | (terr[1] << 8)  # static per config
            p = jnp.sum(
                jnp.where(hit_l, pk[None, :], 0), axis=1, keepdims=True
            )
            cols.extend([p & 255, p >> 8])
        return cols

    cols = draw_team(bterr, nb, t.n_blue, 0)
    cols += draw_team(rterr, nr, t.n_red, t.n_blue)
    return jnp.concatenate(cols, axis=1)


def ms_stride(t: CtfKTables) -> int:
    """Packed floats per env per step: blue actions + step rnd + reset rnd."""
    return t.n_blue + rnd_width(t) + t.n_blue + t.n_red


def _ctf_ms_math(t: CtfKTables, K, pos, dirs, term, coll, sc, run_ret,
                 packed, cells, border, pool, bterr, rterr):
    """K CtF steps with per-env in-place auto-reset — multi-step kernel
    body AND its pure-jax spec (tests/test_pallas_ctf.py).

    packed: (B, K*ms_stride) — per step n_blue float-cast int actions, the
    step uniforms (rnd_width), then the reset uniforms (n_blue + n_red).
    Returns (pos, dirs, term, coll, sc, run_ret, rew_sum, ep_sum, eps).
    """
    B = pos.shape[0]
    A = t.n_blue + t.n_red
    Rs = rnd_width(t)
    stride = ms_stride(t)
    rew_sum = jnp.zeros((B, 1), jnp.float32)
    ep_sum = jnp.zeros((B, 1), jnp.float32)
    eps = jnp.zeros((B, 1), jnp.int32)
    # NEGATIVE RESULT (round 5, measured): spawn positions depend only
    # on their uniforms, so all K steps' respawns CAN precompute as one
    # batched (B*K)-row _ctf_reset_math before the loop (bit-identical
    # per row, ~10 territory-lane ops per step off the critical chain).
    # Measured 785M vs 1110M agent-steps/s: the bulk form's PickState
    # temporaries are (B*K, terr) planes that spill through HBM, where
    # the per-step (B, terr) slabs stay on-chip.  Keep the in-loop form.
    for k in range(K):
        if packed.ndim <= 1:
            # In-loop RNG: `packed` is a PRNG key (see pallas_wildfire
            # _ms_math) — per-step draws fuse into consumers instead of
            # round-tripping the pre-drawn buffer through HBM.
            # Distribution-identical (SURVEY.md §2.3 parity bar).
            kk = jax.random.fold_in(packed, k)
            k_a, k_s, k_rr = jax.random.split(kk, 3)
            ba = jax.random.randint(k_a, (B, t.n_blue), 0, NUM_ACTIONS)
            rnd_step = jax.random.uniform(k_s, (B, Rs))
            rnd_reset = jax.random.uniform(
                k_rr, (B, t.n_blue + t.n_red)
            )
        else:
            base = k * stride
            ba = packed[:, base : base + t.n_blue].astype(jnp.int32)
            rnd_step = packed[:, base + t.n_blue : base + t.n_blue + Rs]
            rnd_reset = packed[:, base + t.n_blue + Rs : base + stride]

        (pos2, dirs2, term2, coll2, reward, ep_term, *_rest) = _ctf_step_math(
            t, pos, dirs, term, coll, ba, rnd_step, cells, border, pool
        )
        sc2 = sc + 1
        done = (ep_term == 1) | (sc2 >= t.max_steps)

        run_ret2 = run_ret + reward
        rew_sum = rew_sum + reward
        ep_sum = ep_sum + jnp.where(done, run_ret2, 0.0)
        eps = eps + done.astype(jnp.int32)
        run_ret = jnp.where(done, 0.0, run_ret2)

        rpos = _ctf_reset_math(t, rnd_reset, bterr, rterr)
        pos = jnp.where(done, rpos, pos2)
        dirs = jnp.where(done, 3, dirs2)
        term = jnp.where(done, 0, term2)
        coll = jnp.where(done, 0, coll2)
        sc = jnp.where(done, 0, sc2)
    return pos, dirs, term, coll, sc, run_ret, rew_sum, ep_sum, eps


def ctf_reset_inputs(cfg):
    """(bterr, rterr) static territory coordinate lists for the reset."""
    from gym_multigrid_tpu.envs.ctf import build_tables

    t = build_tables(cfg)
    bterr = np.asarray(t.blue_territory, dtype=np.int32).T.copy()
    rterr = np.asarray(t.red_territory, dtype=np.int32).T.copy()
    # _ctf_reset_math packs both spawn coordinates into one r0|r1<<8 word
    # per cell; a coordinate >= 256 would bleed into the high field and
    # silently corrupt spawns (CtfConfig.from_map_path accepts arbitrary
    # maps — same guard as maze_reset_math's packed reduce).
    for name, terr in (("blue", bterr), ("red", rterr)):
        if terr.size and int(terr.max()) > 255:
            raise ValueError(
                f"{name} territory coordinates reach {int(terr.max())} — "
                "the packed spawn reduce supports boards up to 256x256"
            )
    return (jnp.asarray(bterr), jnp.asarray(rterr))


def make_ctf_episode_rollout(
    cfg, chunk: int = 25, interpret=None, use_kernel: bool = False,
    rnd_mode: str = "packed",
):
    """rollout(states, key, num_steps) -> (states', metrics) on the
    multi-step math with in-graph per-env auto-reset and uniform-random
    blue actions; metrics match BatchedEnv.rollout (reward_sum, episodes,
    ep_return_sum, run_return).  The K-step math (:func:`_ctf_ms_math`)
    runs as one plain-XLA program per chunk — same pre-drawn randomness,
    no per-step key splits.  chunk=25 measured fastest on v5e; the CtF
    per-step rnd stream is tiny so deep unrolls are cheap.

    The multi-step episode KERNEL was pruned in round 5 after the
    slab-width sweep (5-8x slower at every VMEM-feasible point —
    artifacts/kernel_vs_xla.md); use_kernel=True warns and runs the XLA
    math, and the single-step kernel (:func:`ctf_step_slab`) remains the
    bit-compared validation layer."""
    from gym_multigrid_tpu.envs.ctf import CtfState

    if cfg.num_agents > 8 or any(
        s.kind not in ("rw", "fight", "capture", "patrol", "patrol_fight")
        for s in cfg.enemy_policies
    ):
        return None
    if use_kernel:
        import warnings

        warnings.warn(
            "the CtF multi-step episode kernel was pruned "
            "(artifacts/kernel_vs_xla.md); running the plain-XLA episode "
            "math",
            stacklevel=2,
        )
        use_kernel = False
    t = make_ctf_ktables(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cells, border, pool = ctf_static_inputs(cfg)
    terr_pack = ctf_reset_inputs(cfg)
    A = cfg.num_agents
    stride = ms_stride(t)

    draw_packed = rnd_mode == "packed"

    def _launch(states, run_ret, key, K):
        B = states.pos.shape[0]
        if draw_packed:
            k_a, k_r = jax.random.split(key)
            acts = jax.random.randint(
                k_a, (B, K, t.n_blue), 0, NUM_ACTIONS
            ).astype(jnp.float32)
            rnd = jax.random.uniform(k_r, (B, K, stride - t.n_blue))
            # One packed buffer on BOTH paths: the unconcatenated tuple
            # form (maze's win) measured 1033-1037M vs 1046M here —
            # neutral at best; XLA already overlaps this concat.
            packed = jnp.concatenate(
                [acts, rnd], axis=2
            ).reshape(B, K * stride)
        args = (
            states.pos.reshape(B, 2 * A),
            states.dir,
            states.terminated.astype(jnp.int32),
            states.collided.astype(jnp.int32),
            states.step_count.reshape(B, 1),
            run_ret,
        )
        # In-loop RNG (see _ctf_ms_math) unless rnd_mode="packed".
        pos, dirs, term, coll, sc, run_ret, rew, ep_sum, eps = (
            _ctf_ms_math(
                t, K, *args, packed if draw_packed else key,
                cells, border, pool,
                terr_pack[0], terr_pack[1],
            )
        )
        states = CtfState(
            pos=pos.reshape(B, A, 2),
            dir=dirs,
            terminated=term.astype(bool),
            collided=coll.astype(bool),
            step_count=sc.reshape(B),
            key=states.key,
        )
        return states, run_ret, rew.sum(), ep_sum.sum(), eps.sum()

    def rollout(states, key, num_steps: int):
        B = states.pos.shape[0]
        run_ret = jnp.zeros((B, 1), jnp.float32)
        reward_sum = jnp.float32(0.0)
        ep_ret_sum = jnp.float32(0.0)
        episodes = jnp.int32(0)
        n_full, rem = divmod(num_steps, chunk)

        def body(carry, _):
            states, run_ret, key, rs, es, ec = carry
            key, k = jax.random.split(key)
            states, run_ret, r, e, n = _launch(states, run_ret, k, chunk)
            return (states, run_ret, key, rs + r, es + e, ec + n), None

        (states, run_ret, key, reward_sum, ep_ret_sum, episodes), _ = (
            jax.lax.scan(
                body,
                (states, run_ret, key, reward_sum, ep_ret_sum, episodes),
                None,
                length=n_full,
            )
        )
        if rem:
            key, k = jax.random.split(key)
            states, run_ret, r, e, n = _launch(states, run_ret, k, rem)
            reward_sum += r
            ep_ret_sum += e
            episodes += n
        return states, {
            "reward_sum": reward_sum,
            "episodes": episodes,
            "ep_return_sum": ep_ret_sum,
            "run_return": run_ret.reshape(B),
        }

    return rollout
