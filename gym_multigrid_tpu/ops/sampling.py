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

from typing import NamedTuple

import jax
import jax.numpy as jnp


def prefix_sum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along the lane axis of (B, C) int32 —
    log2(C) shifted adds (Hillis-Steele).  Exact integer math, so it is
    bit-identical to the tril-matmul form the Pallas kernels use (0/1
    counts <= C are exact in f32 too) while costing no MXU traffic."""
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :n]
        s *= 2
    return x


def cum_lanes(mask: jax.Array, tril: jax.Array | None) -> jax.Array:
    """Inclusive per-lane prefix sum of a (B, C) bool mask.

    tril = (C, C) f32 lower-triangular ones: runs as one MXU matmul (no
    cumsum lowering on Mosaic — the Pallas kernels need this form).
    tril = None: plain-XLA consumers use the integer log-doubling prefix
    sum instead — bit-identical result, no MXU work."""
    if tril is None:
        return prefix_sum_lanes(mask.astype(jnp.int32))
    return jnp.dot(
        mask.astype(jnp.float32), tril,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


class PickState(NamedTuple):
    """Sequential without-replacement picks over one shrinking mask,
    paying the O(C log C) prefix sum (or the kernels' (B,C)x(C,C)
    matmul) at most ONCE.

    Removing one set lane at ``idx`` turns the recomputed prefix sum into
    ``cum - (lane >= idx)`` exactly, so every pick after the first costs
    one elementwise pass instead of a fresh prefix sum.  Outputs are
    bit-identical to recomputing per pick — the hot consumers are the
    per-step auto-resets inside the multi-step episode paths, where these
    picks were most of the reset's work and the result is discarded on
    every step the env isn't done."""

    mask: jax.Array  # (B, C) bool — remaining candidates
    cum: jax.Array  # (B, C) int32 — inclusive prefix sum of mask
    count: jax.Array  # (B, 1) int32 — set lanes in mask
    lane: jax.Array  # (B, C) int32 — broadcasted lane iota

    @classmethod
    def make(cls, mask, tril, lane):
        cum = cum_lanes(mask, tril)
        return cls(mask, cum, cum[:, -1:], lane)

    @classmethod
    def full(cls, B, C, lane):
        """All-lanes-free state: the prefix sum is just lane+1, so picks
        starting from a full mask never pay a prefix pass at all."""
        mask = jnp.ones((B, C), dtype=bool)
        return cls(mask, lane + 1, jnp.full((B, 1), C, jnp.int32), lane)

    def pick(self, u):
        """Uniform pick among remaining set lanes (all-False rows pick
        nothing).  Returns (one-hot hit (B,C), lane index (B,1), next)."""
        r = jnp.minimum(
            (u * self.count.astype(jnp.float32)).astype(jnp.int32),
            self.count - 1,
        )
        hit = (self.cum == r + 1) & self.mask
        picked = jnp.any(hit, axis=1, keepdims=True)
        idx = jnp.sum(jnp.where(hit, self.lane, 0), axis=1, keepdims=True)
        dec = ((self.lane >= idx) & picked).astype(jnp.int32)
        nxt = PickState(
            self.mask & ~hit,
            self.cum - dec,
            self.count - picked.astype(jnp.int32),
            self.lane,
        )
        return hit, idx, nxt


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
