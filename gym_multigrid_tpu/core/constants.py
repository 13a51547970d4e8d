"""Color tables, direction vectors and tile constants.

TPU-first re-design of the reference constant tables
(reference: gym_multigrid/core/constants.py:1-93).  Colors are stored both as
name->RGB dicts (host-side, for rendering/sprite generation) and as dense
``(num_colors, 3)`` uint8 arrays so that batched renderers can gather them
on-device.
"""

from __future__ import annotations

import numpy as np

# Size in pixels of a tile in the full-scale human view
# (reference: core/constants.py:5)
TILE_PIXELS = 32

# Map of color names to RGB values (reference: core/constants.py:8-19)
COLORS: dict[str, np.ndarray] = {
    "red": np.array([228, 3, 3]),
    "orange": np.array([255, 140, 0]),
    "yellow": np.array([255, 237, 0]),
    "green": np.array([0, 128, 38]),
    "blue": np.array([0, 77, 255]),
    "purple": np.array([117, 7, 135]),
    "brown": np.array([120, 79, 23]),
    "grey": np.array([100, 100, 100]),
    "light_red": np.array([234, 153, 153]),
    "light_blue": np.array([90, 170, 223]),
}

# CtF palette differs in the light_* shades and adds white/greys
# (reference: core/constants.py:21-35)
CTF_COLORS: dict[str, np.ndarray] = {
    "red": np.array([228, 3, 3]),
    "orange": np.array([255, 140, 0]),
    "yellow": np.array([255, 237, 0]),
    "green": np.array([0, 128, 38]),
    "blue": np.array([0, 77, 255]),
    "purple": np.array([117, 7, 135]),
    "brown": np.array([120, 79, 23]),
    "grey": np.array([100, 100, 100]),
    "light_red": np.array([255, 228, 225]),
    "light_blue": np.array([240, 248, 255]),
    "white": np.array([255, 250, 250]),
    "red_grey": np.array([170, 152, 169]),
    "blue_grey": np.array([140, 146, 172]),
}

# (reference: core/constants.py:37-49)
MAZE_COLORS: dict[str, np.ndarray] = {
    "red": np.array([228, 3, 3]),
    "orange": np.array([255, 140, 0]),
    "yellow": np.array([255, 237, 0]),
    "green": np.array([0, 128, 38]),
    "blue": np.array([0, 77, 255]),
    "purple": np.array([117, 7, 135]),
    "brown": np.array([120, 79, 23]),
    "grey": np.array([100, 100, 100]),
    "light_red": np.array([255, 228, 225]),
    "light_blue": np.array([240, 248, 255]),
    "white": np.array([255, 250, 250]),
}

COLOR_NAMES = sorted(list(COLORS.keys()))

# Used to map colors to integers (insertion order, like the reference;
# reference: core/constants.py:54-55)
COLOR_TO_IDX: dict[str, int] = {key: i for i, key in enumerate(COLORS.keys())}
IDX_TO_COLOR = {v: k for k, v in COLOR_TO_IDX.items()}

# Map of state names to integers (reference: core/constants.py:58-62)
STATE_TO_IDX = {"open": 0, "closed": 1, "locked": 2}

# Map of agent direction indices to vectors: right, down, left, up
# (reference: core/constants.py:65-74).  Dense array form so it can live
# on-device and be indexed with traced direction ints.
DIR_TO_VEC = np.array(
    [
        (1, 0),   # 0: pointing right (positive X)
        (0, 1),   # 1: down (positive Y)
        (-1, 0),  # 2: pointing left (negative X)
        (0, -1),  # 3: up (negative Y)
    ],
    dtype=np.int32,
)

# CtF/Maze action -> position delta. stay/left/down/right/up
# (reference: envs/ctf.py:458-470, envs/maze.py:276-288)
CTF_ACTION_TO_VEC = np.array(
    [
        (0, 0),    # stay
        (0, -1),   # left
        (-1, 0),   # down
        (0, 1),    # right
        (1, 0),    # up
    ],
    dtype=np.int32,
)

# Collect action -> position delta. north/east/south/west
# (reference: core/agent.py:32-37 with north_pos()/east_pos()/... at
# core/agent.py:230-264: north = (0,-1), east = (1,0), south = (0,1),
# west = (-1,0))
COLLECT_ACTION_TO_VEC = np.array(
    [
        (0, -1),  # north
        (1, 0),   # east
        (0, 1),   # south
        (-1, 0),  # west
    ],
    dtype=np.int32,
)

# Map of object types to short string (reference: core/constants.py:77-87)
OBJECT_TO_STR = {
    "wall": "x",
    "floor": "F",
    "door": "D",
    "key": "K",
    "ball": "o",
    "box": "B",
    "goal": "G",
    "lava": "V",
    "agent": "a",
}

# Short string for opened door (reference: core/constants.py:90)
OPENED_DOOR_IDS = "_"

# Map agent's direction to short string (reference: core/constants.py:93)
AGENT_DIR_TO_STR = {0: ">", 1: "V", 2: "<", 3: "^"}


def color_matrix(colors: dict[str, np.ndarray]) -> np.ndarray:
    """Dense (num_colors, 3) uint8 RGB matrix for on-device gathers."""
    return np.stack([np.asarray(c, dtype=np.uint8) for c in colors.values()])
