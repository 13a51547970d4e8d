"""World descriptors: per-env-family encoding schemas.

Reference parity: gym_multigrid/core/world.py:11-91.  A ``World`` holds the
object/color index vocabularies used by a family's grid encoding.  Unlike the
reference (which pairs this with a mutable object hierarchy), the TPU build
treats a ``World`` as a *static* schema: behaviour flags are dense lookup
tables indexed by object id, suitable for baking into jitted step functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gym_multigrid_tpu.core.constants import COLORS, CTF_COLORS, MAZE_COLORS


@dataclass(frozen=True)
class World:
    """Static encoding schema for one env family.

    Mirrors the fields of the reference dataclass (core/world.py:11-30) and
    adds dense per-object behaviour tables used by the functional engines.
    """

    encode_dim: int
    normalize_obs: int
    OBJECT_TO_IDX: dict[str, int]
    COLORS: dict[str, np.ndarray]
    COLOR_TO_IDX: dict[str, int] = field(init=False)
    IDX_TO_COLOR: dict[int, str] = field(init=False)
    IDX_TO_OBJECT: dict[int, str] = field(init=False)

    def __post_init__(self):
        object.__setattr__(
            self,
            "COLOR_TO_IDX",
            {k: i for i, k in enumerate(self.COLORS.keys())},
        )
        object.__setattr__(
            self, "IDX_TO_COLOR", {v: k for k, v in self.COLOR_TO_IDX.items()}
        )
        object.__setattr__(
            self, "IDX_TO_OBJECT", {v: k for k, v in self.OBJECT_TO_IDX.items()}
        )

    @property
    def num_objects(self) -> int:
        return len(self.OBJECT_TO_IDX)


# Default world: 13 object types, 6-dim encoding
# (reference: core/world.py:33-52)
DefaultWorld = World(
    encode_dim=6,
    normalize_obs=1,
    COLORS=COLORS,
    OBJECT_TO_IDX={
        "unseen": 0,
        "empty": 1,
        "wall": 2,
        "floor": 3,
        "door": 4,
        "key": 5,
        "ball": 6,
        "box": 7,
        "goal": 8,
        "lava": 9,
        "agent": 10,
        "objgoal": 11,
        "switch": 12,
    },
)

# Collect world (reference: core/world.py:54-64)
CollectWorld = World(
    encode_dim=3,
    normalize_obs=1,
    COLORS=COLORS,
    OBJECT_TO_IDX={
        "empty": 0,
        "wall": 1,
        "ball": 2,
        "agent": 3,
    },
)

# CtF world (reference: core/world.py:66-79)
CtfWorld = World(
    encode_dim=3,
    normalize_obs=1,
    COLORS=CTF_COLORS,
    OBJECT_TO_IDX={
        "blue_territory": 0,
        "red_territory": 1,
        "blue_agent": 2,
        "red_agent": 3,
        "blue_flag": 4,
        "red_flag": 5,
        "obstacle": 6,
    },
)

# Maze world (reference: core/world.py:81-91)
MazeWorld = World(
    encode_dim=3,
    normalize_obs=1,
    COLORS=MAZE_COLORS,
    OBJECT_TO_IDX={
        "background": 0,
        "agent": 1,
        "flag": 2,
        "obstacle": 3,
    },
)

# Wildfire world: new family (the reference README lists Wildfire with no
# code at the pinned snapshot — README.md:43).  Schema follows the same
# 3-dim (type, color, state) convention.
WildfireWorld = World(
    encode_dim=3,
    normalize_obs=1,
    COLORS=COLORS,
    OBJECT_TO_IDX={
        "empty": 0,
        "tree": 1,
        "fire": 2,
        "burnt": 3,
        "agent": 4,
    },
)
