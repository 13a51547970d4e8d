"""Grid pathfinding with reference-identical tie-breaking.

The reference ``a_star`` (gym_multigrid/policy/ctf/utils.py:17-120) is a
4-neighbor A* with Manhattan heuristic over a heap of
``(f, g, h, parent, loc)`` NamedTuples.  Two observable consequences:

1. Cells block the path only when their map value ``== 8`` — CtF map values
   are 0-6, so on every shipped map the search is effectively obstacle-blind
   (SURVEY.md §2.2); movement-level blocking still applies in the env.
2. The heap tie-break — tuples compare f, then g, then h, then *parent
   chains* recursively, then loc — pops equal-(f, g) nodes in lexicographic
   order of their path's location sequence, and the closed-list ``continue``
   on equal f keeps each cell's lexicographically-smallest prefix.  The
   returned path is therefore exactly the **lexicographically smallest
   Manhattan-shortest path** under elementwise (row, col) tuple order.

We implement that characterization directly: BFS distance-to-goal (Manhattan
is consistent, so A* = shortest path), then a greedy forward walk that always
takes the lexicographically smallest distance-decreasing neighbor.  Same
output as the reference for every (start, end, map), in O(cells) instead of
O(cells^2) — verified exhaustively in tests/test_policy.py.
"""

from __future__ import annotations

from collections import deque
from typing import NamedTuple, Union

import numpy as np
from numpy.typing import NDArray

from gym_multigrid_tpu.typing import Position

#: Map value treated as impassable (reference ctf/utils.py:75).  CtF maps
#: only use values 0-6, so nothing is ever blocked on the shipped maps.
BLOCKED_VALUE = 8

_DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0))


class AStarNode(NamedTuple):
    """Search-node record kept for API parity (reference ctf/utils.py:9-14)."""

    f: int
    g: int
    h: int
    parent: Union["AStarNode", None]
    loc: Position


def manhattan_distance(p1: Position, p2: Position) -> int:
    """|dx| + |dy| (reference ctf/utils.py:123-136)."""
    return abs(int(p1[0]) - int(p2[0])) + abs(int(p1[1]) - int(p2[1]))


def distance_field(map: NDArray, end: Position) -> NDArray:
    """BFS 4-neighbor distance from every passable cell to ``end``.

    Unreachable / blocked cells get a large sentinel.  The end cell must be
    passable to be reachable (the reference never pushes value-8 cells, so a
    blocked goal is unreachable unless start == end).
    """
    rows, cols = map.shape
    blocked = np.asarray(map) == BLOCKED_VALUE
    INF = rows * cols + 1
    dist = np.full((rows, cols), INF, dtype=np.int32)
    er, ec = int(end[0]), int(end[1])
    if not (0 <= er < rows and 0 <= ec < cols) or blocked[er, ec]:
        return dist
    dist[er, ec] = 0
    q: deque[tuple[int, int]] = deque([(er, ec)])
    while q:
        r, c = q.popleft()
        d = dist[r, c] + 1
        for dr, dc in _DIRS:
            nr, nc = r + dr, c + dc
            if 0 <= nr < rows and 0 <= nc < cols and not blocked[nr, nc]:
                if d < dist[nr, nc]:
                    dist[nr, nc] = d
                    q.append((nr, nc))
    return dist


def a_star(start: Position, end: Position, map: NDArray) -> list[Position]:
    """Shortest path from start to end; [] if unreachable.

    Output-identical to the reference A* for every input.  On maps with no
    blocked (value-8) cells — i.e. every shipped CtF map — f is constant
    along all shortest paths and the heap order reduces to the
    lexicographically-smallest-path rule, computed here in O(cells) via a
    BFS field + greedy walk.  Maps that do contain value-8 cells take the
    faithful best-first search in :func:`_a_star_heap` (detours make f vary,
    so the closed form no longer applies).
    """
    fm = np.asarray(map)
    start_t = (int(start[0]), int(start[1]))
    end_t = (int(end[0]), int(end[1]))
    if start_t == end_t:
        return [start_t]
    if (fm == BLOCKED_VALUE).any():
        return _a_star_heap(start_t, end_t, fm)
    return _lex_shortest(start_t, end_t, fm)


def _lex_shortest(start_t, end_t, map: NDArray) -> list[Position]:
    rows, cols = np.asarray(map).shape
    dist = distance_field(map, end_t)
    INF = rows * cols + 1
    # Start distance: the reference expands the start regardless of its own
    # map value; its neighbors must be passable.
    r, c = start_t
    d_start = dist[r, c]
    if np.asarray(map)[r, c] == BLOCKED_VALUE:
        best = INF
        for dr, dc in _DIRS:
            nr, nc = r + dr, c + dc
            if 0 <= nr < rows and 0 <= nc < cols:
                best = min(best, dist[nr, nc] + 1)
        d_start = best
    if d_start >= INF:
        return []

    path: list[Position] = [start_t]
    cur, d = start_t, int(d_start)
    while cur != end_t:
        candidates = []
        for dr, dc in _DIRS:
            nr, nc = cur[0] + dr, cur[1] + dc
            if 0 <= nr < rows and 0 <= nc < cols and dist[nr, nc] == d - 1:
                candidates.append((nr, nc))
        nxt = min(candidates)  # lexicographic (row, col) tie-break
        path.append(nxt)
        cur, d = nxt, d - 1
    return path


def _a_star_heap(start_t, end_t, fm: NDArray) -> list[Position]:
    """Best-first search with the reference's exact node ordering.

    Heap entries compare as (f, g, h, parent-chain, loc) — the same total
    order the reference's NamedTuple heap induces — and the open/closed
    bookkeeping keeps at most one node per location with the same
    improve-or-skip rules (reference ctf/utils.py:82-115), so the pop
    sequence and hence the returned path are identical.  Dict-backed
    membership replaces the reference's O(n) list scans.
    """
    from heapq import heappop, heappush

    rows, cols = fm.shape
    h0 = manhattan_distance(start_t, end_t)
    start_node = AStarNode(h0, 0, h0, None, start_t)
    open_heap: list[AStarNode] = [start_node]
    open_by_loc: dict = {start_t: start_node}
    closed_by_loc: dict = {}

    while open_heap:
        current = heappop(open_heap)
        if open_by_loc.get(current.loc) is not current:
            continue  # superseded entry (reference removes it eagerly)
        del open_by_loc[current.loc]
        closed_by_loc[current.loc] = current

        if current.loc == end_t:
            path: list[Position] = []
            node: AStarNode | None = current
            while node is not None:
                path.append(node.loc)
                node = node.parent
            path.reverse()
            return path

        for dr, dc in _DIRS:
            new_loc = (current.loc[0] + dr, current.loc[1] + dc)
            if not (0 <= new_loc[0] < rows and 0 <= new_loc[1] < cols):
                continue
            if fm[new_loc] == BLOCKED_VALUE:
                continue
            g = current.g + 1
            h = manhattan_distance(new_loc, end_t)
            node = AStarNode(g + h, g, h, current, new_loc)
            if new_loc in closed_by_loc:
                if node.f < closed_by_loc[new_loc].f:
                    del closed_by_loc[new_loc]
                    open_by_loc[new_loc] = node
                    heappush(open_heap, node)
            elif new_loc in open_by_loc:
                if node.f < open_by_loc[new_loc].f:
                    open_by_loc[new_loc] = node
                    heappush(open_heap, node)
            else:
                open_by_loc[new_loc] = node
                heappush(open_heap, node)

    return []
