"""Masked sampling primitives.

These replace the reference's host-side rejection-sampling loops
(``MultiGridEnv.place_obj``, reference multigrid.py:282-339) with bounded,
jittable, vmappable operations:

* rejection sampling "uniform over empty cells of a rect" is exactly the
  uniform distribution over the masked cell set -> Gumbel-argmax over a mask
  draws from that distribution in O(N) with no data-dependent loop.

All functions operate on flat cell indices (``idx = y * width + x``, the same
layout as the reference ``Grid.grid`` list, reference grid.py:56-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_uniform_choice(key: jax.Array, mask: jax.Array) -> jax.Array:
    """Uniformly sample one index from the True entries of ``mask``.

    Draw r ~ U{0..count-1} and select the (r+1)-th set bit via a prefix sum:
    exactly uniform over the masked set, with ONE random draw instead of a
    per-cell Gumbel pass (cheaper on the VPU: a log-depth cumsum + compare
    vs. N uniforms + 2N logs).

    If the mask is empty the result is index 0 (caller must guard / predicate
    the use; the reference would spin forever in that case,
    multigrid.py:308-312).

    Args:
      key: PRNG key.
      mask: (N,) bool array.

    Returns:
      () int32 index into ``mask``.
    """
    m = mask.astype(jnp.int32)
    count = jnp.sum(m)
    r = jax.random.randint(key, (), 0, jnp.maximum(count, 1))
    cum = jnp.cumsum(m)
    return jnp.argmax((cum == r + 1) & mask).astype(jnp.int32)


def masked_uniform_choice_weighted(
    key: jax.Array, weights: jax.Array
) -> jax.Array:
    """Sample an index with probability proportional to ``weights`` (>=0).

    Gumbel-max over log-weights. Used for the patrol policy's
    duplicate-weighted border target choice (reference heuristic.py:321-338,
    where ``random_generator.choice`` over a list with duplicates weights
    targets by multiplicity).
    """
    g = jax.random.gumbel(key, weights.shape, dtype=jnp.float32)
    logw = jnp.where(weights > 0, jnp.log(weights), -jnp.inf)
    return jnp.argmax(logw + g).astype(jnp.int32)


def set_flat(
    grid: jax.Array, idx: jax.Array, value: jax.Array, pred: jax.Array | bool = True
) -> jax.Array:
    """Predicated single-cell scatter into a flat grid, VPU-friendly.

    ``where(iota == idx, value, grid)`` compiles to pure vector ops on TPU
    (compare + select over the lane dimension), avoiding scatter lowering.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, grid.shape, len(grid.shape) - 1)
    hit = (iota == idx) & pred
    return jnp.where(hit, jnp.asarray(value, dtype=grid.dtype), grid)


def get_flat(grid: jax.Array, idx: jax.Array) -> jax.Array:
    """Single-cell gather from a flat grid via one-hot reduce (VPU-friendly)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, grid.shape, len(grid.shape) - 1)
    return jnp.sum(jnp.where(iota == idx, grid, 0), axis=-1).astype(grid.dtype)
