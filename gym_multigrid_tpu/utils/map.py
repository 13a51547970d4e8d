"""Map loading and geometry helpers.

Host-side API parity with the reference ``gym_multigrid/utils/map.py:7-61``.
These run at env *construction* time (maps are static per config); the
per-step equivalents are baked into the jitted step functions as dense masks
and distance tables (see envs/ctf.py).
"""

from __future__ import annotations

import numpy as np
from numpy.typing import NDArray

from gym_multigrid_tpu.typing import Position


def distance_points(p1: Position, p2: Position, is_defeated: bool = False) -> float:
    """Euclidean distance of two points; +inf if the agent is defeated
    (reference utils/map.py:7-13)."""
    if is_defeated:
        return float("inf")
    return float(np.linalg.norm(np.asarray(p1, dtype=float) - np.asarray(p2, dtype=float)))


def distance_area_point(point: Position, area: list[Position]) -> float:
    """Min Euclidean distance from a point to a set of cells
    (reference utils/map.py:16-19)."""
    pts = np.asarray(area, dtype=float).reshape(-1, 2)
    return float(np.min(np.linalg.norm(pts - np.asarray(point, dtype=float), axis=1)))


def load_text_map(map_path: str) -> NDArray:
    """Load a whitespace text map and transpose it, so that positions read
    (i, j) = (text column, text row) (reference utils/map.py:22-39)."""
    return np.loadtxt(map_path).T


def position_in_positions(position: Position, positions: list[Position]) -> bool:
    """Membership by coordinate equality (reference utils/map.py:42-53)."""
    for pos in positions:
        if position[0] == pos[0] and position[1] == pos[1]:
            return True
    return False


def closest_area_pos(pos: Position, area: list[Position]) -> Position:
    """Element of ``area`` closest to ``pos`` (Euclidean); ties resolve to the
    first minimal index, like np.argmin (reference utils/map.py:56-61)."""
    pts = np.asarray(area, dtype=float).reshape(-1, 2)
    d = np.linalg.norm(pts - np.asarray(pos, dtype=float), axis=1)
    return area[int(np.argmin(d))]
