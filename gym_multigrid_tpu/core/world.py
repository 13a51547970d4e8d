"""World descriptors: per-env-family encoding schemas.

Reference parity: gym_multigrid/core/world.py:11-91.  A ``World`` holds the
object/color index vocabularies used by a family's grid encoding.  Unlike
the reference (which pairs this with a mutable object hierarchy), the TPU
build treats a ``World`` as a *static* schema whose vocabularies become
compile-time constants of the jitted step functions; the behavior flags
live as dense lookup tables in core/object.behavior_tables.

The object vocabularies are the observation spec — their names and index
values must match the reference exactly (every obs encoding is defined in
terms of them).  Each schema below lists its types in index order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gym_multigrid_tpu.core.constants import COLORS, CTF_COLORS, MAZE_COLORS


@dataclass(frozen=True)
class World:
    """Static encoding schema for one env family (reference world.py:11-30)."""

    encode_dim: int
    normalize_obs: int
    OBJECT_TO_IDX: dict[str, int]
    COLORS: dict[str, np.ndarray]
    COLOR_TO_IDX: dict[str, int] = field(init=False)
    IDX_TO_COLOR: dict[int, str] = field(init=False)
    IDX_TO_OBJECT: dict[int, str] = field(init=False)

    def __post_init__(self):
        set_ = object.__setattr__
        set_(self, "COLOR_TO_IDX", {k: i for i, k in enumerate(self.COLORS)})
        set_(self, "IDX_TO_COLOR", dict(enumerate(self.COLORS)))
        set_(self, "IDX_TO_OBJECT", {v: k for k, v in self.OBJECT_TO_IDX.items()})

    @property
    def num_objects(self) -> int:
        return len(self.OBJECT_TO_IDX)


def _schema(encode_dim: int, colors, *object_names: str) -> World:
    """Build a World whose object ids are the listed name order."""
    return World(
        encode_dim=encode_dim,
        normalize_obs=1,
        COLORS=colors,
        OBJECT_TO_IDX={name: i for i, name in enumerate(object_names)},
    )


#: 13-type, 6-dim default schema (reference world.py:33-52)
DefaultWorld = _schema(
    6, COLORS,
    "unseen", "empty", "wall", "floor", "door", "key", "ball", "box",
    "goal", "lava", "agent", "objgoal", "switch",
)

#: Collect: empty/wall/ball/agent = 0..3 (reference world.py:54-64)
CollectWorld = _schema(3, COLORS, "empty", "wall", "ball", "agent")

#: CtF: territories 0/1, agents 2/3, flags 4/5, obstacle 6
#: (reference world.py:66-79)
CtfWorld = _schema(
    3, CTF_COLORS,
    "blue_territory", "red_territory", "blue_agent", "red_agent",
    "blue_flag", "red_flag", "obstacle",
)

#: Maze: background/agent/flag/obstacle = 0..3 (reference world.py:81-91)
MazeWorld = _schema(3, MAZE_COLORS, "background", "agent", "flag", "obstacle")

#: Wildfire: new family (the reference README lists Wildfire with no code,
#: README.md:43); same 3-dim (type, color, state) convention.
WildfireWorld = _schema(3, COLORS, "empty", "tree", "fire", "burnt", "agent")
