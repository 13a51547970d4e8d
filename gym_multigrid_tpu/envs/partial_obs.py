"""Batched in-graph partial observations (agent FOV pipeline).

The reference's partial-obs path — view-extent slice, rotate-to-face-up,
shadow-cast visibility, masked encode (reference multigrid.py:485-545,
grid.py:97-130 slice/rotate, grid.py:286-323 process_vis) — is dead code
upstream (SURVEY.md §2.2) and host-only in this repo's fixed
``MultiGridEnv.gen_obs``.  This module is the TPU-native counterpart: the
same observable pipeline as pure static-shape jnp ops on (W, H) int planes,
vmappable over agents and env batches and jittable into the rollout.

Design notes (all loops here are over the *static* view size V, unrolled at
trace time):

* Out-of-bounds cells read as walls (reference grid.py:126-128): the planes
  are pre-padded with the wall encode, so the dynamic view slice is always
  in-bounds — no per-cell bounds checks.
* ``rotate_left`` is ``M[::-1, :].T`` on an xy-indexed square; the dir+1
  applications (reference multigrid.py:497-499) select between 4 statically
  rotated views with one ``lax.switch``.
* The shadow-cast visibility is the closed-form column-sweep form of
  ``core/grid.py:process_vis`` (one running-max "nearest blocker" and one
  prefix-sum "any lit in window" per pass) on jnp arrays.
* Encodes are 3-dim ``(type, color, state)`` with invisible cells zeroed
  (reference grid.py:254-284 encode_for_agents; for 3-dim worlds the
  current-agent bit does not exist, so encode == encode_for_agents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["make_partial_obs_fn"]


def _rotate_left(m: jax.Array) -> jax.Array:
    """Grid.rotate_left on an xy-indexed (V, V) array: out[j, V-1-i] =
    in[i, j]  <=>  out = in[::-1, :].T (reference grid.py:97-109)."""
    return m[::-1, :].T


def _process_vis(see: jax.Array, ax: int, ay: int) -> jax.Array:
    """Shadow-cast visibility on an xy-indexed (V, V) see-through mask from
    the static agent cell (ax, ay) — jnp port of core/grid.py:150-206
    (itself the vectorized closed form of reference grid.py:286-323)."""
    V = see.shape[0]
    idx = jnp.arange(V)

    def sweep(row, s):
        # nearest opaque cell strictly left of i (-1 if none)
        blocker = jnp.concatenate(
            [
                jnp.array([-1]),
                lax.cummax(jnp.where(~s, idx, -1))[:-1],
            ]
        )
        # prefix sums of lit cells: any lit cell in (blocker[i], i)?
        P = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(row.astype(jnp.int32))]
        )
        return row | (P[idx] - P[blocker + 1] > 0)

    mask = jnp.zeros((V, V), bool).at[ax, ay].set(True)
    for j in reversed(range(V)):
        s = see[:, j]
        lit1 = sweep(mask[:, j], s)
        lit2 = sweep(lit1[::-1], s[::-1])[::-1]
        mask = mask.at[:, j].set(lit2)
        if j > 0:
            p1 = (lit1 & s).at[V - 1].set(False)  # east pass visits i<=V-2
            p2 = (lit2 & s).at[0].set(False)  # west pass visits i>=1
            below = mask[:, j - 1] | p1 | p2
            below = below.at[1:].set(below[1:] | p1[:-1])
            below = below.at[:-1].set(below[:-1] | p2[1:])
            mask = mask.at[:, j - 1].set(below)
    return mask


def make_partial_obs_fn(
    width: int,
    height: int,
    view_size: int,
    wall_encode: tuple[int, int, int],
    wall_type_idx: int | None = None,
    see_through_walls: bool = False,
):
    """Build ``obs_fn(planes, opaque, pos, dir) -> (V, V, 3) uint8``.

    planes: (3, W, H) int32 xy-indexed (type, color, state channels — the
    full-grid encode split per channel); opaque: (W, H) bool cells that
    block sight (``not see_behind()``); pos: (2,) int32 (x, y); dir: ()
    int32 in 0..3.  vmap over agents / envs as needed; everything inside
    is static-shape.
    """
    V = view_size
    hs = V // 2
    # Any odd V works: the planes are padded by V on every side, and the
    # farthest view corner sits V-1 cells past the board, so the dynamic
    # slice is always in-bounds (views larger than the board just see
    # more wall fill — the reference Maze declares view_size=100 on a
    # 13x13 board this way).
    assert V % 2 == 1, "view size must be odd"
    if wall_type_idx is None:
        wall_type_idx = wall_encode[0]

    # View top-left per dir (reference agent.py:293-322).
    def tops(x, y):
        return jnp.stack(
            [
                jnp.stack([x, y - hs]),  # 0: right
                jnp.stack([x - hs, y]),  # 1: down
                jnp.stack([x - V + 1, y - hs]),  # 2: left
                jnp.stack([x - hs, y - V + 1]),  # 3: up
            ]
        )

    pad_cfg = [(V, V)] * 2

    def obs_fn(planes, opaque, pos, dir):
        padded = jnp.stack(
            [
                jnp.pad(planes[c], pad_cfg, constant_values=int(wall_encode[c]))
                for c in range(3)
            ]
        )
        opq = jnp.pad(opaque, pad_cfg, constant_values=True)

        top = tops(pos[0], pos[1])[dir] + V  # shift into padded coords
        view = lax.dynamic_slice(
            padded, (jnp.int32(0), top[0], top[1]), (3, V, V)
        )
        view_opq = lax.dynamic_slice(opq, (top[0], top[1]), (V, V))

        # dir+1 left-rotations (reference multigrid.py:497-499).
        def rots(m):
            r1 = _rotate_left(m)
            r2 = _rotate_left(r1)
            r3 = _rotate_left(r2)
            r4 = _rotate_left(r3)
            return r1, r2, r3, r4

        view = lax.switch(
            dir, [lambda v, i=i: jnp.stack([rots(p)[i] for p in v])
                  for i in range(4)], view
        )
        view_opq = lax.switch(
            dir, [lambda v, i=i: rots(v)[i] for i in range(4)], view_opq
        )

        if see_through_walls:
            vis = jnp.ones((V, V), bool)
        else:
            vis = _process_vis(~view_opq, hs, V - 1)

        out = jnp.stack([view[0], view[1], view[2]], axis=-1)
        out = jnp.where(vis[..., None], out, 0)
        return out.astype(jnp.uint8)

    return obs_fn
