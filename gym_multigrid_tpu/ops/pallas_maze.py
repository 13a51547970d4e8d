"""Pallas kernel + XLA episode math for the Maze step (envs/maze.py owns
the math).

Maze has the smallest state of any family — one (2,) position over a
static board:

* ``maze_step_slab`` — one fused Pallas transition per launch, the
  bit-compared second-backend validation of the shared slab math
  (tests/test_pallas_maze.py).
* ``_maze_ms_math`` / ``make_maze_episode_rollout`` — K transitions per
  plain-XLA chunk program with in-graph per-env auto-reset, the perf
  headline.  (A multi-step episode KERNEL variant existed through round
  4 and was pruned after the slab-width sweep showed it 8x slower at
  every VMEM-feasible point — artifacts/kernel_vs_xla.md.)

Same contract as every other family: pre-drawn uniforms, kernel body IS
the pure-jax spec, point queries as one-hot lane compares.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_multigrid_tpu.envs.maze import (
    MazeTables,
    maze_reset_math,
    maze_static_inputs,
    maze_step_math,
    maze_tables,
)

MAZE_BLK = 512


@functools.partial(jax.jit, static_argnums=(0, 5))
def maze_step_slab(t: MazeTables, pos, dirs, acts, cells, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = pos.shape[0]
    N = t.n_cells
    blk = min(MAZE_BLK, B)
    grid = (pl.cdiv(B, blk),)

    def kernel(pos_ref, dirs_ref, acts_ref, cells_ref,
               pos_out, dirs_out, rew_out, term_out):
        p, d, r, tm = maze_step_math(
            t, pos_ref[:], dirs_ref[:], acts_ref[:], cells_ref[:]
        )
        pos_out[:] = p
        dirs_out[:] = d
        rew_out[:] = r
        term_out[:] = tm

    def row_spec(cols):
        return pl.BlockSpec((blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(2),
            row_spec(1),
            row_spec(1),
            pl.BlockSpec((3, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(2), row_spec(1), row_spec(1), row_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(pos, dirs, acts, cells)


# packed floats per env per step: [action, reset uniform]
MS_STRIDE = 2


def _maze_ms_math(t: MazeTables, K, pos, dirs, sc, run_ret, packed, cells, bg):
    """K maze steps with per-env auto-reset — kernel body AND spec."""
    B = pos.shape[0]
    rew_sum = jnp.zeros((B, 1), jnp.float32)
    ep_sum = jnp.zeros((B, 1), jnp.float32)
    eps = jnp.zeros((B, 1), jnp.int32)
    for k in range(K):
        if isinstance(packed, tuple):
            # XLA path, pre-drawn: (acts (B,K) i32, rnd (B,K) f32) —
            # unconcatenated, so the (B, K*stride) concat never
            # materializes (its write+read was 10.5% of maze device
            # time), actions stay integer end to end (the old f32
            # round-trip + (B,K,1) single-lane draw shape was the top
            # maze op at 12.3%, 2026-08-20 xplane profile).
            acts_f, rnd_f = packed
            acts = acts_f[:, k : k + 1]
            rnd_reset = rnd_f[:, k : k + 1]
        elif packed.ndim <= 1:
            # In-loop RNG: `packed` is a PRNG key (see pallas_wildfire
            # _ms_math) — per-step draws fuse into consumers, no pre-drawn
            # buffer in HBM.  Distribution-identical.
            from gym_multigrid_tpu.envs.maze import NUM_ACTIONS

            kk = jax.random.fold_in(packed, k)
            k_a, k_r = jax.random.split(kk)
            acts = jax.random.randint(k_a, (B, 1), 0, NUM_ACTIONS)
            rnd_reset = jax.random.uniform(k_r, (B, 1))
        else:
            base = k * MS_STRIDE
            acts = packed[:, base : base + 1].astype(jnp.int32)
            rnd_reset = packed[:, base + 1 : base + 2]

        pos2, dirs2, reward, term = maze_step_math(t, pos, dirs, acts, cells)
        sc2 = sc + 1
        done = (term == 1) | (sc2 >= t.max_steps)

        run_ret2 = run_ret + reward
        rew_sum = rew_sum + reward
        ep_sum = ep_sum + jnp.where(done, run_ret2, 0.0)
        eps = eps + done.astype(jnp.int32)
        run_ret = jnp.where(done, 0.0, run_ret2)

        rpos, rdirs = maze_reset_math(t, rnd_reset, bg)
        pos = jnp.where(done, rpos, pos2)
        dirs = jnp.where(done, rdirs, dirs2)
        sc = jnp.where(done, 0, sc2)
    return pos, dirs, sc, run_ret, rew_sum, ep_sum, eps


def make_maze_episode_rollout(
    cfg, chunk: int = 25, interpret=None, use_kernel: bool = False,
    rnd_mode: str = "packed",
):
    """rollout(states, key, num_steps) on the multi-step math with
    in-graph auto-reset and uniform-random actions; metrics match
    BatchedEnv.rollout.  The K-step math (:func:`_maze_ms_math`) runs as
    one plain-XLA program per chunk — same pre-drawn randomness, no
    per-step key splits.

    The multi-step episode KERNEL was pruned in round 5: the slab-width
    sweep's best point (chunk 10, BLK 512: 170M agent-steps/s) stays 8x
    behind this XLA path (artifacts/kernel_vs_xla.md).  use_kernel=True
    warns and runs the XLA math; the single-step kernel
    (:func:`maze_step_slab`) remains the bit-compared validation layer.
    """
    from gym_multigrid_tpu.envs.maze import NUM_ACTIONS, MazeState

    if use_kernel:
        import warnings

        warnings.warn(
            "the maze multi-step episode kernel was pruned (8x slower at "
            "every feasible slab shape — artifacts/kernel_vs_xla.md); "
            "running the identical plain-XLA episode math",
            stacklevel=2,
        )
        use_kernel = False
    t = maze_tables(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cells, bg = maze_static_inputs(cfg)

    draw_packed = rnd_mode == "packed"

    def _launch(states, run_ret, key, K):
        B = states.pos.shape[0]
        if draw_packed:
            k_a, k_r = jax.random.split(key)
            # Minor-axis-last draws ((K, B): batch on the native minor
            # axis, then a free-relabel transpose) — a (B, K, 1) draw
            # leaves lane width 1 and pays a full relayout per step.
            acts_kb = jax.random.randint(k_a, (K, B), 0, NUM_ACTIONS)
            rnd_kb = jax.random.uniform(k_r, (K, B))
            packed = (acts_kb.T, rnd_kb.T)
        # In-loop RNG (see _maze_ms_math) unless rnd_mode="packed".
        pos, dirs, sc, run_ret, rew, ep_sum, eps = _maze_ms_math(
            t,
            K,
            states.pos.reshape(B, 2),
            states.dir.reshape(B, 1),
            states.step_count.reshape(B, 1),
            run_ret,
            packed if draw_packed else key,
            cells,
            bg,
        )
        states = MazeState(
            pos=pos,
            dir=dirs.reshape(B),
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
