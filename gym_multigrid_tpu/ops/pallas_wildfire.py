"""Pallas kernel + XLA episode math for the Wildfire step
(ops/pallas_collect.py is the pattern; envs/wildfire.py owns the math).

* ``wildfire_step_slab`` — one fused Pallas transition per launch (plugs
  into ``BatchedEnv.step_batch`` via envs.wildfire.make_wildfire_step_
  batch), the bit-compared second-backend validation of the shared slab
  math (tests/test_pallas_wildfire.py).
* ``_ms_math`` / ``make_wildfire_episode_rollout`` — K transitions per
  plain-XLA chunk program with in-graph per-env auto-reset; the default
  in-loop path runs the trace-optimized compact form
  (envs.wildfire.wf_compact_ms).  (A multi-step episode KERNEL variant
  existed through round 4 and was pruned after the slab-width sweep —
  artifacts/kernel_vs_xla.md.)

Same contract as the other families: pre-drawn uniforms (or in-loop
draws), the kernel body is exactly :func:`envs.wildfire.wf_step_math`,
and the spread stencil runs as the adjacency matmul on the MXU.

Envelope: n_agents <= 4 and n_cells a multiple of 128 (the default 16x16
config is 256).  Outside it the XLA slab path serves (same math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_multigrid_tpu.envs.wildfire import (
    WfTables,
    adjacency,
    reset_rnd_width,
    step_rnd_width,
    wf_reset_math,
    wf_step_math,
)

BLK = 256  # envs per program instance (single-step kernel)


def kernel_supported(t: WfTables) -> bool:
    return t.n_agents <= 4 and t.n_cells % 128 == 0


@functools.partial(jax.jit, static_argnums=(0, 6))
def wildfire_step_slab(t: WfTables, cells, pos, acts, rnd, adj, interpret=None):
    """Fused single step over a (B, C) batch via pallas_call."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, C = cells.shape
    A = t.n_agents
    blk = min(BLK, B)
    grid = (pl.cdiv(B, blk),)

    def kernel(cells_ref, pos_ref, acts_ref, rnd_ref, adj_ref,
               cells_out, pos_out, rew_out, ext_out, term_out):
        c, p, r, e, tm = wf_step_math(
            t, cells_ref[:], pos_ref[:], acts_ref[:], rnd_ref[:], adj_ref[:]
        )
        cells_out[:] = c
        pos_out[:] = p
        rew_out[:] = r
        ext_out[:] = e
        term_out[:] = tm

    def row_spec(cols):
        return pl.BlockSpec((blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(C),
            row_spec(2 * A),
            row_spec(A),
            row_spec(rnd.shape[1]),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            row_spec(C),
            row_spec(2 * A),
            row_spec(1),
            row_spec(1),
            row_spec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 2 * A), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cells, pos, acts, rnd, adj)


def _ms_math(t: WfTables, K, cells, pos, sc, ext, run_ret, packed, adj, tril):
    """K wildfire steps with per-env auto-reset — the multi-step kernel
    body AND its pure-jax spec (bit-compared in tests).

    packed: (B, K*(A + R_step + R_reset)) — per step A float-cast int
    actions, then the step uniforms, then the reset uniforms.
    Returns (cells, pos, sc, ext, run_ret, rew_sum, ep_sum, eps).
    """
    B = cells.shape[0]
    A = t.n_agents
    Rs = step_rnd_width(t)
    Rr = reset_rnd_width(t)
    stride = A + Rs + Rr
    rew_sum = jnp.zeros((B, 1), jnp.float32)
    ep_sum = jnp.zeros((B, 1), jnp.float32)
    eps = jnp.zeros((B, 1), jnp.int32)
    for k in range(K):
        if isinstance(packed, tuple):
            # XLA path, pre-drawn: the (acts, rnd) draws unconcatenated —
            # identical values to the packed layout, but the big
            # (B, K*stride) concat (~0.5 MB/env at 16x16) never
            # materializes and each step's slice is contiguous.
            acts_f, rnd_f = packed
            acts = acts_f[:, k].astype(jnp.int32)
            rnd_step = rnd_f[:, k, :Rs]
            rnd_reset = rnd_f[:, k, Rs : Rs + Rr]
        elif packed.ndim <= 1:
            # XLA path, in-loop RNG: `packed` is a PRNG key (typed key
            # ndim 0 or raw uint32 pair ndim 1); each
            # unrolled step draws its own uniforms.  The threefry bits are
            # elementwise producers that XLA fuses straight into their
            # compares (u < p), so the ~2 KB/env/step uniform stream — the
            # dominant HBM traffic of the pre-drawn form — never touches
            # HBM.  Distribution-identical to pre-drawing (different
            # stream layout; SURVEY.md §2.3 parity bar).
            kk = jax.random.fold_in(packed, k)
            k_a, k_s, k_rr = jax.random.split(kk, 3)
            acts = jax.random.randint(k_a, (B, A), 0, 5)
            rnd_step = jax.random.uniform(k_s, (B, Rs))
            rnd_reset = jax.random.uniform(k_rr, (B, Rr))
        else:
            base = k * stride
            acts = packed[:, base : base + A].astype(jnp.int32)
            rnd_step = packed[:, base + A : base + A + Rs]
            rnd_reset = packed[:, base + A + Rs : base + stride]

        cells2, pos2, reward, n_ext, term = wf_step_math(
            t, cells, pos, acts, rnd_step, adj
        )
        sc2 = sc + 1
        done = (term == 1) | (sc2 >= t.max_steps)  # (B,1) bool

        run_ret2 = run_ret + reward
        rew_sum = rew_sum + reward
        ep_sum = ep_sum + jnp.where(done, run_ret2, 0.0)
        eps = eps + done.astype(jnp.int32)
        run_ret = jnp.where(done, 0.0, run_ret2)
        ext2 = ext + n_ext

        rcells, rpos = wf_reset_math(t, rnd_reset, tril)
        cells = jnp.where(done, rcells, cells2)
        pos = jnp.where(done, rpos, pos2)
        sc = jnp.where(done, 0, sc2)
        ext = jnp.where(done, 0, ext2)
    return cells, pos, sc, ext, run_ret, rew_sum, ep_sum, eps


def make_wildfire_episode_rollout(
    cfg, chunk: int = 8, interpret=None, use_kernel: bool = False,
    rnd_mode: str = "inloop",
):
    """rollout(states, key, num_steps) -> (states', metrics) on the
    multi-step math, matching BatchedEnv.rollout with uniform-random
    actions and in-graph auto-reset.  metrics: reward_sum, episodes,
    ep_return_sum, run_return — same keys as BatchedEnv.rollout.

    The K-step math runs as one plain-XLA program per chunk: the
    trace-optimized compact form (envs.wildfire.wf_compact_ms) on the
    default in-loop path, :func:`_ms_math` otherwise.  The multi-step
    episode KERNEL was pruned in round 5 (5-8x slower at every
    VMEM-feasible slab shape — artifacts/kernel_vs_xla.md);
    use_kernel=True warns and runs the XLA math, and the single-step
    kernel (:func:`wildfire_step_slab`) remains the bit-compared
    validation layer."""
    from gym_multigrid_tpu.envs.wildfire import WildfireState, wf_tables

    t = wf_tables(cfg)
    if use_kernel:
        import warnings

        warnings.warn(
            "the wildfire multi-step episode kernel was pruned "
            "(artifacts/kernel_vs_xla.md); running the plain-XLA episode "
            "math",
            stacklevel=2,
        )
        use_kernel = False
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    A = t.n_agents
    C = t.n_cells
    h, w = cfg.height, cfg.width
    stride = A + step_rnd_width(t) + reset_rnd_width(t)
    # XLA path: adj/tril = None selects the matmul-free stencil and
    # prefix-sum forms (bit-identical integers).  The per-step auto-reset
    # picks otherwise cost n_fires + n_agents (B,C)x(C,C) matmuls per env
    # step — at 16x16 that is ~5x the spread's MXU work, all of it thrown
    # away on the (vast majority of) steps where the env isn't done.
    adj_x = None
    tril_x = None

    draw_packed = rnd_mode == "packed"
    # In-loop XLA path: the trace-optimized u8-field/int8-board chunk
    # (envs.wildfire.wf_compact_ms) unless a threshold has no u8 form.
    from gym_multigrid_tpu.envs.wildfire import (
        compact_supported,
        wf_compact_ms,
    )

    compact = (not draw_packed) and compact_supported(t)

    def _launch(states, run_ret, key, K):
        B = states.cells.shape[0]
        if draw_packed:
            # Pre-drawn bulk randomness: the single-step kernel's
            # contract, and the rnd_mode="packed" XLA form the
            # bit-equality tests pin against it.
            k_a, k_r = jax.random.split(key)
            acts = jax.random.randint(k_a, (B, K, A), 0, 5).astype(
                jnp.float32
            )
            rnd = jax.random.uniform(k_r, (B, K, stride - A))
        args = (
            states.cells.reshape(B, C),
            states.agent_pos.reshape(B, 2 * A),
            states.step_count.reshape(B, 1),
            states.extinguished.reshape(B, 1),
            run_ret,
        )
        if compact:
            cells, pos, sc, ext, run_ret, rew, ep_sum, eps = wf_compact_ms(
                t, K, *args, key
            )
        else:
            # In-loop RNG (see _ms_math) unless rnd_mode="packed": the
            # uniform stream stays fused out of HBM.
            cells, pos, sc, ext, run_ret, rew, ep_sum, eps = _ms_math(
                t, K, *args,
                (
                    (acts, rnd.reshape(B, K, stride - A))
                    if draw_packed
                    else key
                ),
                adj_x,
                tril_x,
            )
        states = WildfireState(
            cells=cells.reshape(B, h, w),
            agent_pos=pos.reshape(B, A, 2),
            step_count=sc.reshape(B),
            extinguished=ext.reshape(B),
            key=states.key,
        )
        return states, run_ret, rew.sum(), ep_sum.sum(), eps.sum()

    def rollout(states, key, num_steps: int):
        B = states.cells.shape[0]
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
