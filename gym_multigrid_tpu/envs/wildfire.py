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

Reward-design note for RL: with the spec defaults an extinguished
ignition nets ext_reward - burn_penalty = +0.9, so a reward-maximizing
team prefers letting the fire spread and farming extinguish bounties
over containment (observed empirically: PPO drives episode return DOWN
under the defaults).  Set burn_penalty >= ext_reward (scripts/train.py
defaults to 1.0) to make every ignition a net loss and fire-fighting the
optimum; on larger boards also mind controllability — at p_spread 0.3 on
16x16 the fire perimeter outruns two agents and returns carry no
learnable signal.

TPU mapping.  The transition is written once, as batched (B, cells) math
(:func:`wf_step_math` / :func:`wf_reset_math`) shared verbatim by three
consumers: the per-env functional core below (B=1 rows), the direct XLA
batch step (``make_wildfire_step_batch``), and the fused Pallas kernels
(ops/pallas_wildfire.py) — kernel ≡ spec is bit-compared in
tests/test_pallas_wildfire.py.  The spread stencil and the masked
categorical picks each have two bit-identical forms selected by the
``adj`` / ``tril`` arguments: the matmul forms (fire_row @ adjacency;
tril-matmul prefix sums) that the Pallas kernels need (no cumsum/scatter
lowering on Mosaic, and the adjacency generalizes to any board
topology), and matmul-free forms for plain-XLA consumers (masked lane
shifts; integer log-doubling prefix sums).  Both compute exact small
integers, so outputs are bit-equal (pinned in tests).  The reset's
without-replacement picks pay the prefix sum once and update it in one
pass per pick (ops/sampling.PickState) — they run inside the multi-step
episode paths on EVERY step (discarded unless the env is done), so
n_fires + n_agents full prefix passes (or (B,C)x(C,C) kernel matmuls)
per step would dominate the reset.  All randomness is pre-drawn uniforms
so every consumer is a deterministic function of its inputs.
"""

from __future__ import annotations

import functools
import itertools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_multigrid_tpu.core.constants import COLOR_TO_IDX, CTF_ACTION_TO_VEC
from gym_multigrid_tpu.core.world import WildfireWorld
from gym_multigrid_tpu.ops.sampling import PickState

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

    def __post_init__(self):
        # Early, readable errors — downstream the zero-agent case dies as
        # "Need at least one array to concatenate" inside reset tracing.
        if self.num_agents < 1:
            raise ValueError(f"num_agents must be >= 1, got {self.num_agents}")
        if len(self.agents_index) != self.num_agents:
            # Silent-wrong otherwise: encode clamps the color gather, so
            # extra agents render with the last listed color.
            raise ValueError(
                f"agents_index has {len(self.agents_index)} entries for "
                f"num_agents={self.num_agents}"
            )
        if self.size < 3:
            raise ValueError(f"size must be >= 3, got {self.size}")
        if self.num_initial_fires < 1:
            raise ValueError(
                f"num_initial_fires must be >= 1, got {self.num_initial_fires}"
            )
        for name in ("tree_density", "p_spread", "p_burnout"):
            v = getattr(self, name)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"{name} must be in [0, 1], got {v}")

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


class WfTables(NamedTuple):
    """Static per-config tables (hashable; closed over by the kernels)."""

    width: int
    height: int
    n_cells: int
    n_agents: int
    n_fires: int
    tree_density: float
    p_burnout: float
    # (1-p_spread)^k for k = 0..4: the ignition survival table, selected by
    # the integer neighbor count (exact f32 constants — no pow in-graph).
    survival: tuple[float, float, float, float, float]
    # uint8 compare thresholds for the compact-field mode: P(u8 < T) = T/256.
    # T = round(p * 256), so each probability is quantized to the nearest
    # 1/256 (max relative shift at the defaults: burnout 0.1 -> 26/256 =
    # 0.1016, +1.6%; ignition probs shift <= 0.3%).  Chosen because XLA
    # cannot fuse RngBitGenerator into its consumers — the uniform field
    # round-trips HBM at 8 bytes/f32 draw, and wildfire's field is the
    # workload (~520 draws/env/step); u8 bytes cut that stream 4x.
    ignite_u8: tuple[int, int, int, int, int]
    burnout_u8: int
    tree_u8: int
    ext_reward: float
    burn_penalty: float
    step_penalty: float
    max_steps: int
    # all permutations of range(n_agents): move order = perms[floor(u*n!)]
    perms: tuple[tuple[int, ...], ...]
    # action id -> (dx, dy); stay/left/down/right/up (CTF_ACTION_TO_VEC,
    # applied as x += vec[1], y += vec[0] like CtF)
    action_dx: tuple[int, ...]
    action_dy: tuple[int, ...]


def wf_tables(cfg: WildfireConfig) -> WfTables:
    assert cfg.num_agents <= 4, "move-order table supports <= 4 agents"
    q = 1.0 - cfg.p_spread
    return WfTables(
        width=cfg.width,
        height=cfg.height,
        n_cells=cfg.width * cfg.height,
        n_agents=cfg.num_agents,
        n_fires=cfg.num_initial_fires,
        tree_density=float(cfg.tree_density),
        p_burnout=float(cfg.p_burnout),
        survival=tuple(np.float32(q) ** k for k in range(5)),
        ignite_u8=tuple(
            int(round((1.0 - float(np.float32(q) ** k)) * 256))
            for k in range(5)
        ),
        burnout_u8=int(round(cfg.p_burnout * 256)),
        tree_u8=int(round(cfg.tree_density * 256)),
        ext_reward=float(cfg.ext_reward),
        burn_penalty=float(cfg.burn_penalty),
        step_penalty=float(cfg.step_penalty),
        max_steps=int(cfg.max_steps),
        perms=tuple(itertools.permutations(range(cfg.num_agents))),
        action_dx=tuple(int(v[1]) for v in CTF_ACTION_TO_VEC),
        action_dy=tuple(int(v[0]) for v in CTF_ACTION_TO_VEC),
    )


def _u8_threshold_ok(threshold: int, p: float) -> bool:
    """Is a u8 compare threshold an acceptable stand-in for probability p?

    Acceptable means: zero probabilities stay exactly zero, and nonzero
    ones survive quantization with a representable (>= 1) threshold and
    <= 5% relative error.  Without the lower gate, a small probability
    (e.g. p_burnout < 1/512) would round to threshold 0 and the event
    would silently NEVER fire on the compact path — unbounded relative
    error the <=1.6%-at-defaults docstring never promised."""
    if p <= 0.0:
        return threshold == 0
    return threshold >= 1 and abs(threshold / 256.0 - p) <= 0.05 * p


def compact_supported(t: WfTables) -> bool:
    """u8-threshold fields need every probability representable at 1/256
    resolution: not rounding to 256 (p >= 255.5/256 has no uint8
    threshold), not rounding to 0 when nonzero, and within 5% relative
    error of the true value (:func:`_u8_threshold_ok` — tiny
    probabilities otherwise quantize to "never fires").  wf_compact_ms's
    bit-packed counter reduce also holds ignition/burnout counts in
    11-bit fields — boards over 2047 cells could overflow them (a dense
    fire front can ignite more trees than the field holds in one step).
    Configs outside this envelope keep the plain in-loop form, which is
    distribution-exact at any probability."""
    probs_ok = (
        all(
            _u8_threshold_ok(u8, 1.0 - s)
            for u8, s in zip(t.ignite_u8, t.survival)
        )
        and _u8_threshold_ok(t.burnout_u8, t.p_burnout)
        and _u8_threshold_ok(t.tree_u8, t.tree_density)
        and max(t.ignite_u8) <= 255
        and t.burnout_u8 <= 255
        and t.tree_u8 <= 255
    )
    return probs_ok and t.n_cells <= 2047


def adjacency(cfg_or_t) -> np.ndarray:
    """(C, C) f32 4-neighbor adjacency of the board graph: the spread
    stencil is fire_row @ adj (one MXU matmul, edges built in)."""
    w, h = cfg_or_t.width, cfg_or_t.height
    C = w * h
    a = np.zeros((C, C), dtype=np.float32)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y > 0:
                a[i - w, i] = 1.0
            if y < h - 1:
                a[i + w, i] = 1.0
            if x > 0:
                a[i - 1, i] = 1.0
            if x < w - 1:
                a[i + 1, i] = 1.0
    return a


def _neighbor_fires(t: WfTables, cells):
    """Per-cell count of burning 4-neighbors for a (B, C) flat board —
    the matmul-free lane-shift form of the adjacency stencil (identical
    integers).  Stays in the cells dtype (sums <= 4, so int8 boards from
    the compact episode path don't overflow)."""
    C = cells.shape[1]
    w = t.width
    f = (cells == FIRE).astype(cells.dtype)
    north = jnp.pad(f, ((0, 0), (w, 0)))[:, :C]
    south = jnp.pad(f, ((0, 0), (0, w)))[:, w:]
    col = np.arange(C) % w
    not_x0 = jnp.asarray((col != 0).astype(np.int8)).astype(cells.dtype)[
        None, :
    ]
    not_xl = jnp.asarray((col != w - 1).astype(np.int8)).astype(cells.dtype)[
        None, :
    ]
    west = jnp.pad(f, ((0, 0), (1, 0)))[:, :C] * not_x0
    east = jnp.pad(f, ((0, 0), (0, 1)))[:, 1:] * not_xl
    return north + south + west + east


def _move_agents(t: WfTables, pos, acts, u_perm):
    """Sequential random-order agent moves for a (B, 2*A) position slab
    (uniform permutation via the static table; later movers see earlier
    movers' updates).  Returns per-agent column lists (xs, ys); shared by
    :func:`wf_step_math` and the compact episode chunk."""
    B = pos.shape[0]
    A = t.n_agents

    n_perms = len(t.perms)
    pidx = jnp.minimum(
        (u_perm * n_perms).astype(jnp.int32), n_perms - 1
    )  # (B,1)

    xs = [pos[:, 2 * i : 2 * i + 1] for i in range(A)]
    ys = [pos[:, 2 * i + 1 : 2 * i + 2] for i in range(A)]
    acts = jnp.clip(acts.astype(jnp.int32), 0, 4)

    for slot in range(A):
        # mover id for this slot varies per row with the sampled perm
        i_vec = jnp.zeros((B, 1), jnp.int32)
        for p_i, perm in enumerate(t.perms):
            i_vec = jnp.where(pidx == p_i, perm[slot], i_vec)

        def sel(cols):
            out = jnp.zeros_like(cols[0])
            for i in range(A):
                out = jnp.where(i_vec == i, cols[i], out)
            return out

        act = sel([acts[:, i : i + 1] for i in range(A)])
        px, py = sel(xs), sel(ys)
        dx = jnp.zeros_like(act)
        dy = jnp.zeros_like(act)
        for a in range(5):
            m = act == a
            dx = jnp.where(m, int(t.action_dx[a]), dx)
            dy = jnp.where(m, int(t.action_dy[a]), dy)
        nx = jnp.clip(px + dx, 0, t.width - 1)
        ny = jnp.clip(py + dy, 0, t.height - 1)
        # blocked if ANY agent sits on the target (current positions:
        # earlier movers already updated — sequential semantics)
        occupied = jnp.zeros_like(act, dtype=bool)
        for i in range(A):
            occupied = occupied | ((nx == xs[i]) & (ny == ys[i]))
        moved = ~occupied & ((nx != px) | (ny != py))
        new_x = jnp.where(moved, nx, px)
        new_y = jnp.where(moved, ny, py)
        for i in range(A):
            xs[i] = jnp.where(i_vec == i, new_x, xs[i])
            ys[i] = jnp.where(i_vec == i, new_y, ys[i])
    return xs, ys


# rnd column layout per step: [u_perm] + [field_0..field_{C-1}]
def step_rnd_width(t: WfTables) -> int:
    return 1 + t.n_cells


# reset rnd layout: [tree_0..tree_{C-1}] + [fire picks] + [agent picks]
def reset_rnd_width(t: WfTables) -> int:
    return t.n_cells + t.n_fires + t.n_agents




def wf_step_math(t: WfTables, cells, pos, acts, rnd, adj):
    """One wildfire transition for a (B, C) slab.  Pure jax, Mosaic-safe.

    cells: (B, C) int32 flat board (idx = y*width + x)
    pos:   (B, 2*A) int32 [a0x, a0y, a1x, a1y, ...]
    acts:  (B, A) int32
    rnd:   (B, 1 + C) f32 uniforms [move-order, per-cell field]
    adj:   (C, C) f32 4-neighbor adjacency

    Returns (cells', pos', reward (B,1) f32 team reward, n_ext (B,1) i32,
    terminated (B,1) int32).  (The in-loop episode headline runs the
    trace-optimized :func:`wf_compact_ms` instead — same distributions.)
    """
    u_perm, field = rnd[:, 0:1], rnd[:, 1:]
    B, C = cells.shape
    A = t.n_agents
    w = t.width
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)

    xs, ys = _move_agents(t, pos, acts, u_perm)

    # Extinguish: agent occupancy via lane compares (no scatter).
    occ = jnp.zeros((B, C), dtype=bool)
    for i in range(A):
        occ = occ | (lane == ys[i] * w + xs[i])
    put_out = occ & (cells == FIRE)
    n_ext = jnp.sum(put_out.astype(jnp.int32), axis=1, keepdims=True)
    cells = jnp.where(put_out, BURNT, cells)

    # Spread: neighbor fire count per cell, then ignition probability via
    # the survival table selected on the exact integer count (0..4).
    # adj = (C, C) static 4-neighbor adjacency: one MXU matmul (the form
    # the Pallas kernels need; also generalizes to any board topology).
    # adj = None: plain-XLA consumers count neighbors with four masked
    # lane shifts instead — identical integers, no MXU.
    u = field
    if adj is None:
        nb = _neighbor_fires(t, cells).astype(jnp.float32)
    else:
        fire = (cells == FIRE).astype(jnp.float32)
        nb = jnp.dot(fire, adj, preferred_element_type=jnp.float32)  # (B, C)
    p_ig = jnp.zeros((B, C), jnp.float32)
    for k in range(1, 5):
        p_ig = jnp.where(nb == float(k), 1.0 - t.survival[k], p_ig)
    ignite = (cells == TREE) & (u < p_ig)
    n_ignited = jnp.sum(ignite.astype(jnp.int32), axis=1, keepdims=True)

    # Burnout shares the field: burnout reads u at FIRE cells, ignition at
    # TREE cells — disjoint, so the draws stay independent.
    burnout = (cells == FIRE) & (u < t.p_burnout)
    cells = jnp.where(burnout, BURNT, jnp.where(ignite, FIRE, cells))

    reward = (
        t.ext_reward * n_ext.astype(jnp.float32)
        - t.burn_penalty * n_ignited.astype(jnp.float32)
        - t.step_penalty
    )
    terminated = (
        jnp.sum((cells == FIRE).astype(jnp.int32), axis=1, keepdims=True) == 0
    ).astype(jnp.int32)

    pos_out = jnp.concatenate(
        [c for i in range(A) for c in (xs[i], ys[i])], axis=1
    )
    return cells, pos_out, reward, n_ext, terminated


def wf_reset_math(t: WfTables, rnd, tril):
    """Fresh boards for a (B, ·) slab of uniforms.  Pure jax, Mosaic-safe.

    rnd: (B, C + n_fires + A) f32 — per-cell tree draws, then sequential
    masked picks: initial fires uniform among trees without replacement,
    agent spawns uniform among all cells without replacement (the same
    distributions as bernoulli + Gumbel-top-k + choice(replace=False)).
    Returns (cells (B, C), pos (B, 2*A)).  (The in-loop episode headline
    runs the trace-optimized :func:`wf_compact_ms` reset instead — same
    distributions, argmax-pick form.)
    """
    trees = rnd[:, : t.n_cells] < t.tree_density
    picks = rnd[:, t.n_cells :]
    B = trees.shape[0]
    C = t.n_cells
    w = t.width
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)

    cells = jnp.where(trees, TREE, EMPTY)

    # One prefix sum for ALL fire picks, one-pass updates between them
    # (bit-identical to re-summing; PickState docstring).
    ps = PickState.make(trees, tril, lane)
    for j in range(t.n_fires):
        hit, _, ps = ps.pick(picks[:, j : j + 1])
        cells = jnp.where(hit, FIRE, cells)

    # Agent spawns start from the all-free mask, whose prefix sum is
    # lane+1 — no prefix-sum pass at all.
    ps = PickState.full(B, C, lane)
    pos_cols = []
    for i in range(t.n_agents):
        _, idx, ps = ps.pick(picks[:, t.n_fires + i : t.n_fires + i + 1])
        pos_cols.extend([idx % w, idx // w])
    return cells.astype(jnp.int32), jnp.concatenate(pos_cols, axis=1)


def wf_compact_ms(t: WfTables, K: int, cells, pos, sc, ext, run_ret, key):
    """K auto-resetting wildfire steps — the trace-optimized in-loop
    episode form behind the TPU headline (ops/pallas_wildfire.py
    ``rnd_mode="inloop"``).

    Same transition/reset distributions as the packed ``_ms_math`` spec up
    to three documented, profile-driven substitutions (the 2026-08-20
    on-chip xplane trace showed the spec form VMEM-write bound with ~45%
    of device time in per-step reset prefix sums + three (B,C)->(B,1)
    reduces — artifacts/sol_report.json):

    * Per-cell Bernoulli fields are raw uint8 bytes against the WfTables
      ``*_u8`` thresholds (1/256 probability quantization, documented
      there) and the board runs as int8 — RngBitGenerator output cannot
      fuse into consumers, so byte fields/boards cut the stream and the
      unrolled-loop temporaries 4x.
    * The three per-step reduces (extinguished, ignited, terminated) and
      the fresh-board tree count collapse into ONE bit-packed (B,C)
      reduce (fields at bit offsets 0/3/12/21; max value < 2^30), with
      the burning-cell count carried incrementally:
      fires' = fires - extinguished - burnouts + ignitions.
    * Reset picks drop the prefix-sum PickState machinery: initial fires
      are iterated argmaxes of per-cell f32 uniforms masked to trees
      (exactly uniform among trees without replacement, the Gumbel-max
      argument with equal weights; rows with < n_fires trees place
      fewer fires, as the spec does), and agent spawns are the
      closed-form without-replacement index trick (draw r_a uniform on
      [0, C-a), then shift past earlier picks in ascending order).
    * Fresh boards are AMORTIZED: the spec rebuilds a discarded fresh
      board every step for every env, but dones are rare (measured
      0.023/env-step at the defaults) — so this draws R=4 independent
      fresh boards per chunk and each done event consumes the next one
      (indexed by the env's done count this chunk).  Distribution-exact
      unless an env finishes >= R+1 episodes inside one chunk (the
      overflow reuses board R-1).  Measured multi-done rates per
      env-chunk at the defaults: 16-step chunks (51,200 sampled)
      >=2 dones 1.0e-2, >=3 2.9e-4, >=4 0 observed; 24-step chunks
      (40,960 sampled, the shipping chunk) >=2 2.6e-2, >=3 6.6e-4,
      >=4 0 observed (<~7e-5; the ~40x decay per extra done
      extrapolates P(>=5) ~ 4e-7, far below the 1/256 threshold
      quantization above).

    Returns the ``_ms_math`` tuple: (cells int32, pos, sc, ext, run_ret,
    rew_sum, ep_sum, eps).
    """
    B, C = cells.shape
    A = t.n_agents
    w = t.width
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    rew_sum = jnp.zeros((B, 1), jnp.float32)
    ep_sum = jnp.zeros((B, 1), jnp.float32)
    eps = jnp.zeros((B, 1), jnp.int32)
    cells = cells.astype(jnp.int8)
    # One reduce per chunk to seed the incremental burning-cell count.
    fire_cnt = jnp.sum(
        (cells == FIRE).astype(jnp.int32), axis=1, keepdims=True
    )
    # Spread stencil, size-gated (round-5 task 3): up to 24x24 it runs as
    # ONE bf16 MXU matmul per step — the lane-shift form (4 pads + masks
    # + adds) was 40% of device time on the VPU with the MXU idle
    # (2026-08-20 xplane trace); fire_row @ adjacency is exact in bf16
    # (0/1 inputs, counts <= 4) and overlaps with the VPU work.  The
    # (C, C) adjacency grows quadratically though: at 32x32 it alone
    # cost ~25% of the per-cell work rate (artifacts/board_scaling.md),
    # so large boards switch back to the matmul-free lane-shift stencil
    # (_neighbor_fires — bit-identical integers either way).
    use_adj = t.n_cells <= 576
    adj_bf16 = (
        jnp.asarray(adjacency(t), dtype=jnp.bfloat16) if use_adj else None
    )
    # ignite/burnout bit offsets in the packed reduce: 11-bit fields
    # hold counts <= 2047 (compact_supported gates n_cells <= 2047,
    # covering 32x32=1024 and up to 45x45); max sum = 4 + 2047<<3 +
    # 2047<<14 ~ 3.4e7, far inside int32.
    SH_IG, SH_BO = 3, 14

    # ---- amortized fresh boards (see docstring) -------------------------
    R = min(4, K)
    r_cells, r_pos, r_fcnt = [], [], []
    for r in range(R):
        kr = jax.random.fold_in(key, K + r)
        k_rf, k_rk, k_ru = jax.random.split(kr, 3)
        # (C, B) draws + transpose: free relabel into the batch-minor
        # layout the loop arrays use (see the field draw below).
        tree_field = jax.random.bits(k_rf, (C, B), dtype=jnp.uint8).T
        fire_keys = jax.random.uniform(k_rk, (C, B)).T
        spawn_u = jax.random.uniform(k_ru, (B, A))
        trees_new = tree_field < jnp.uint8(t.tree_u8)
        rc = jnp.where(trees_new, TREE, EMPTY).astype(jnp.int8)
        m = trees_new
        for _ in range(t.n_fires):
            km = jnp.where(m, fire_keys, -1.0)
            idx = jnp.argmax(km, axis=1)[:, None]
            hit = (lane == idx) & m  # all-False when no trees remain
            rc = jnp.where(hit, FIRE, rc)
            m = m & ~hit
        picked = []
        for a in range(A):
            ra = jnp.minimum(
                (spawn_u[:, a : a + 1] * (C - a)).astype(jnp.int32),
                C - a - 1,
            )
            if picked:
                e = jnp.sort(jnp.concatenate(picked, axis=1), axis=1)
                for q in range(len(picked)):
                    ra = ra + (ra >= e[:, q : q + 1]).astype(jnp.int32)
            picked.append(ra)
        r_cells.append(rc)
        r_pos.append(
            jnp.concatenate(
                [c for p in picked for c in (p % w, p // w)], axis=1
            )
        )
        n_tr = jnp.sum(trees_new.astype(jnp.int32), axis=1, keepdims=True)
        r_fcnt.append(jnp.minimum(n_tr, t.n_fires))
    done_cnt = jnp.zeros((B, 1), jnp.int32)

    for k in range(K):
        kk = jax.random.fold_in(key, k)
        k_a, k_p, k_f = jax.random.split(kk, 3)
        acts = jax.random.randint(k_a, (B, A), 0, 5)
        u_perm = jax.random.uniform(k_p, (B, 1))
        # Drawn transposed: rng output layout has the minor axis last, but
        # every (B, C) loop array here is laid out batch-minor — a (C, B)
        # draw + transpose relabels for free where a (B, C) draw paid a
        # full-tensor layout copy per step (measured 0.55 ms/launch).
        field = jax.random.bits(k_f, (C, B), dtype=jnp.uint8).T

        xs, ys = _move_agents(t, pos, acts, u_perm)

        occ = jnp.zeros((B, C), dtype=bool)
        for i in range(A):
            occ = occ | (lane == ys[i] * w + xs[i])
        put_out = occ & (cells == FIRE)
        cells1 = jnp.where(put_out, BURNT, cells)

        if use_adj:
            fire_row = (cells1 == FIRE).astype(jnp.bfloat16)
            nb = jnp.dot(
                fire_row, adj_bf16, preferred_element_type=jnp.float32
            )
            nb_vals = [float(n) for n in range(1, 5)]
        else:
            nb = _neighbor_fires(t, cells1)  # int8 counts, lane shifts
            nb_vals = [jnp.int8(n) for n in range(1, 5)]
        thr = jnp.zeros((B, C), jnp.uint8)
        for n, v in zip(range(1, 5), nb_vals):
            thr = jnp.where(nb == v, jnp.uint8(t.ignite_u8[n]), thr)
        ignite = (cells1 == TREE) & (field < thr)
        burnout = (cells1 == FIRE) & (field < jnp.uint8(t.burnout_u8))
        cells2 = jnp.where(burnout, BURNT, jnp.where(ignite, FIRE, cells1))

        combined = (
            put_out.astype(jnp.int32)
            + ignite.astype(jnp.int32) * (1 << SH_IG)
            + burnout.astype(jnp.int32) * (1 << SH_BO)
        )
        s = jnp.sum(combined, axis=1, keepdims=True)
        n_ext = s & 7  # put_out <= n_agents <= 4
        n_ig = (s >> SH_IG) & 2047
        n_bo = s >> SH_BO
        fire_cnt = fire_cnt - n_ext - n_bo + n_ig

        reward = (
            t.ext_reward * n_ext.astype(jnp.float32)
            - t.burn_penalty * n_ig.astype(jnp.float32)
            - t.step_penalty
        )
        sc2 = sc + 1
        done = (fire_cnt == 0) | (sc2 >= t.max_steps)  # (B,1) bool

        run_ret2 = run_ret + reward
        rew_sum = rew_sum + reward
        ep_sum = ep_sum + jnp.where(done, run_ret2, 0.0)
        eps = eps + done.astype(jnp.int32)
        run_ret = jnp.where(done, 0.0, run_ret2)
        ext2 = ext + n_ext

        # Next unconsumed amortized fresh board for this env (see above).
        # An R-way where-chain: a take_along_axis/gather form measured 3x
        # SLOWER end to end (TPU scalarizes the per-row gather); the
        # chain's R board reads per step stay vectorized.
        j = jnp.minimum(done_cnt, R - 1)
        rcells, rpos, rfc = r_cells[0], r_pos[0], r_fcnt[0]
        for r in range(1, R):
            sel = j == r
            rcells = jnp.where(sel, r_cells[r], rcells)
            rpos = jnp.where(sel, r_pos[r], rpos)
            rfc = jnp.where(sel, r_fcnt[r], rfc)
        done_cnt = done_cnt + done.astype(jnp.int32)

        pos2 = jnp.concatenate(
            [c for i in range(A) for c in (xs[i], ys[i])], axis=1
        )
        cells = jnp.where(done, rcells, cells2)
        pos = jnp.where(done, rpos, pos2)
        sc = jnp.where(done, 0, sc2)
        ext = jnp.where(done, 0, ext2)
        fire_cnt = jnp.where(done, rfc, fire_cnt)
    return (
        cells.astype(jnp.int32), pos, sc, ext, run_ret, rew_sum, ep_sum, eps
    )


def make_wildfire(cfg: WildfireConfig) -> WildfireFns:
    h, w = cfg.height, cfg.width
    n_agents = cfg.num_agents
    t = wf_tables(cfg)
    C = t.n_cells
    agent_colors = jnp.asarray(np.array(cfg.agents_index, dtype=np.int32))

    def reset_fn(key: jax.Array) -> WildfireState:
        key, k_rnd = jax.random.split(key)
        rnd = jax.random.uniform(k_rnd, (1, reset_rnd_width(t)))
        # tril=None: integer prefix-sum picks (bit-identical to the
        # kernels' tril-matmul form, no MXU work)
        cells, pos = wf_reset_math(t, rnd, None)
        return WildfireState(
            cells=cells.reshape(h, w),
            agent_pos=pos.reshape(n_agents, 2),
            step_count=jnp.int32(0),
            extinguished=jnp.int32(0),
            key=key,
        )

    def step_fn(state: WildfireState, actions: jax.Array):
        key, k_rnd = jax.random.split(state.key)
        rnd = jax.random.uniform(k_rnd, (1, step_rnd_width(t)))
        cells, pos, reward, n_ext, term = wf_step_math(
            t,
            state.cells.reshape(1, C),
            state.agent_pos.reshape(1, 2 * n_agents),
            jnp.asarray(actions).reshape(1, n_agents),
            rnd,
            None,  # lane-shift stencil; bit-identical to the adj matmul
        )
        rewards = jnp.full(
            (n_agents,), reward[0, 0] / n_agents, dtype=jnp.float32
        )
        step_count = state.step_count + 1
        new_state = WildfireState(
            cells=cells.reshape(h, w),
            agent_pos=pos.reshape(n_agents, 2),
            step_count=step_count,
            extinguished=state.extinguished + n_ext[0, 0],
            key=key,
        )
        info = {
            "extinguished": new_state.extinguished,
            "burning": jnp.sum((cells == FIRE).astype(jnp.int32)),
            "burnt": jnp.sum((cells == BURNT).astype(jnp.int32)),
        }
        return (
            new_state,
            encode_fn(new_state),
            rewards,
            term[0, 0].astype(bool),
            step_count >= cfg.max_steps,
            info,
        )

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


def make_wildfire_partial_encode(cfg: WildfireConfig, view_size: int = 7):
    """Batched agent-FOV observations: ``fn(state) -> (n_agents, V, V, 3)``.

    Completes the partial-observation matrix for the 4th family (the
    reference-derived three are differentially pinned against the host
    ``gen_obs`` pipeline; Wildfire has no reference or host-Grid
    counterpart, so these are design-note semantics like the rest of the
    family):  agents face up (dir 3, like Collect — the family has no
    facing state), nothing in-bounds blocks sight (fire and trees are
    see-through), and out-of-view-bounds cells read as empty — there is
    nothing beyond the board's edge.  The pipeline itself
    (envs/partial_obs.py) is the host-differentially-validated one.
    """
    from gym_multigrid_tpu.envs.partial_obs import make_partial_obs_fn

    h, w = cfg.height, cfg.width
    n_agents = cfg.num_agents
    agent_colors = jnp.asarray(np.array(cfg.agents_index, dtype=np.int32))
    obs_fn = make_partial_obs_fn(
        w, h, view_size,
        wall_encode=(EMPTY, 0, 0),
        see_through_walls=True,
    )

    def encode_partial(state: WildfireState) -> jax.Array:
        cells = state.cells  # (H, W), y-major
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
        # xy-indexed planes for the FOV pipeline
        planes = jnp.stack([typ.T, color.T, ch2.T]).astype(jnp.int32)
        opaque = jnp.zeros((w, h), bool)
        dirs = jnp.full((n_agents,), 3, jnp.int32)
        return jax.vmap(
            lambda p, d: obs_fn(planes, opaque, p, d)
        )(state.agent_pos, dirs)

    return encode_partial


def make_wildfire_step_batch(cfg: WildfireConfig, use_pallas: bool = False):
    """Whole-batch wildfire step (BatchedEnv.step_batch contract).

    The direct XLA path runs :func:`wf_step_math` on the full (B, C) slab
    — already one mostly-fused program with the stencil on the MXU; with
    ``use_pallas`` the same math runs as a fused kernel
    (ops/pallas_wildfire.py, real TPU only).
    """
    t = wf_tables(cfg)
    C = t.n_cells
    h, w = cfg.height, cfg.width
    A = cfg.num_agents
    fns = make_wildfire(cfg)
    adj = jnp.asarray(adjacency(cfg))

    if use_pallas:
        from gym_multigrid_tpu.ops.pallas_wildfire import (
            kernel_supported,
            wildfire_step_slab,
        )

        if not kernel_supported(t):
            import warnings

            warnings.warn(
                "use_pallas requested but wildfire config is outside the "
                "kernel envelope (n_agents <= 4, cells % 128 == 0); "
                "falling back to the XLA slab path",
                stacklevel=2,
            )
            use_pallas = False

    if use_pallas:

        def run_math(cells, pos, acts, rnd):
            return wildfire_step_slab(t, cells, pos, acts, rnd, adj)

    else:

        def run_math(cells, pos, acts, rnd):
            # adj=None: masked lane-shift neighbor count — identical
            # integers to the adjacency matmul, no MXU traffic.
            return wf_step_math(t, cells, pos, acts, rnd, None)

    def step_batch(states: WildfireState, actions: jax.Array):
        B = states.cells.shape[0]
        keys = jax.vmap(jax.random.split)(states.key)
        new_key, k_rnd = keys[:, 0], keys[:, 1]
        rnd = jax.vmap(
            lambda k: jax.random.uniform(k, (step_rnd_width(t),))
        )(k_rnd)

        cells, pos, reward, n_ext, term = run_math(
            states.cells.reshape(B, C),
            states.agent_pos.reshape(B, 2 * A),
            jnp.asarray(actions).reshape(B, A).astype(jnp.int32),
            rnd,
        )
        step_count = states.step_count + 1
        new_states = WildfireState(
            cells=cells.reshape(B, h, w),
            agent_pos=pos.reshape(B, A, 2),
            step_count=step_count,
            extinguished=states.extinguished + n_ext[:, 0],
            key=new_key,
        )
        obs = jax.vmap(fns.encode_fn)(new_states)
        rewards = jnp.repeat(reward / A, A, axis=1)  # (B, A) team split
        info = {
            "extinguished": new_states.extinguished,
            "burning": jnp.sum(
                (cells == FIRE).astype(jnp.int32), axis=1
            ),
            "burnt": jnp.sum((cells == BURNT).astype(jnp.int32), axis=1),
        }
        return (
            new_states,
            obs,
            rewards,
            term[:, 0].astype(bool),
            step_count >= cfg.max_steps,
            info,
        )

    return step_batch


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
