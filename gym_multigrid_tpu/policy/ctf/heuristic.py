"""Scripted CtF opponent policies.

API parity with the reference (gym_multigrid/policy/ctf/heuristic.py:40-463):
same class names, ctor signatures, attributes and host-side ``act``
semantics.  Each policy also declares a ``spec_kind`` so the CtF env can
compile a distribution-identical pure-JAX version of the policy directly
into the jitted step function (gym_multigrid_tpu/envs/ctf.py); ``act``
remains for host stepping and for users driving the policies directly.
"""

from __future__ import annotations

from typing import Literal, TypeVar

import numpy as np
from numpy.random import Generator
from numpy.typing import NDArray

from gym_multigrid_tpu.core.actions import CtfActions
from gym_multigrid_tpu.core.world import CtfWorld, World
from gym_multigrid_tpu.policy.base import BaseAgentPolicy, ObservationT
from gym_multigrid_tpu.policy.ctf.utils import a_star
from gym_multigrid_tpu.typing import Position
from gym_multigrid_tpu.utils.map import closest_area_pos, position_in_positions

ObservationDictT = TypeVar("ObservationDictT", bound=dict)
CtfPolicyT = TypeVar("CtfPolicyT", bound="CtfPolicy")

#: Patrol border scan directions (reference heuristic.py:315).
_DIRECTIONS: list[Position] = [(0, 1), (0, -1), (1, 0), (-1, 0)]


class CtfPolicy(BaseAgentPolicy):
    """Abstract CtF policy (reference heuristic.py:18-37)."""

    def act(self, observation: ObservationDictT, curr_pos: Position) -> int:
        raise NotImplementedError


class RwPolicy(CtfPolicy):
    """Random walk: uniform over the action set (reference heuristic.py:40-72)."""

    spec_kind = "rw"

    def __init__(
        self,
        action_set=CtfActions,
        random_generator: Generator | None = None,
    ) -> None:
        super().__init__(action_set, random_generator)
        self.name = "rw"

    def act(self, observation=None, curr_pos=None) -> int:
        return int(self.random_generator.integers(0, len(self.action_set)))


class DestinationPolicy(CtfPolicy):
    """Move along the shortest path to ``get_target`` with prob
    ``randomness``, else act uniformly (reference heuristic.py:75-177)."""

    spec_kind = None  # abstract target; concrete subclasses set a kind

    def __init__(
        self,
        field_map: NDArray | None = None,
        action_set=CtfActions,
        random_generator: Generator | None = None,
        randomness: float = 0.75,
    ) -> None:
        super().__init__(action_set, random_generator)
        self.name = "destination"
        self.field_map: NDArray | None = field_map
        self.randomness: float = randomness

    def get_target(
        self, observation: ObservationDictT, curr_pos: Position
    ) -> Position:
        raise NotImplementedError

    def act(self, observation: ObservationDictT, curr_pos: Position) -> int:
        start = tuple(np.asarray(curr_pos))
        target = tuple(np.asarray(self.get_target(observation, curr_pos)))
        shortest_path = a_star(start, target, self.field_map)
        optimal_loc = np.array(
            shortest_path[1] if len(shortest_path) > 1 else target
        )

        is_action_optimal = self.random_generator.choice(
            [True, False], p=[self.randomness, 1 - self.randomness]
        )
        if not is_action_optimal:
            return int(self.random_generator.integers(0, len(self.action_set)))

        # Direction -> action: stay (0,0), left (0,-1), down (-1,0),
        # right (0,1), up (1,0) (reference heuristic.py:160-173).
        action_dir = tuple(optimal_loc - np.asarray(start))
        mapping = {
            (0, 0): self.action_set.stay,
            (0, -1): self.action_set.left,
            (-1, 0): self.action_set.down,
            (0, 1): self.action_set.right,
            (1, 0): self.action_set.up,
        }
        if action_dir not in mapping:
            raise ValueError("Invalid direction")
        return int(mapping[action_dir])


class FightPolicy(DestinationPolicy):
    """Target = closest opponent agent (reference heuristic.py:180-226)."""

    spec_kind = "fight"

    def __init__(
        self,
        field_map: NDArray | None = None,
        action_set=CtfActions,
        random_generator: Generator | None = None,
        randomness: float = 0.75,
        ego_agent: Literal["red", "blue"] = "red",
    ) -> None:
        super().__init__(field_map, action_set, random_generator, randomness)
        self.name = "fight"
        self.ego_agent: Literal["red", "blue"] = ego_agent

    def get_target(
        self, observation: ObservationDictT, curr_pos: Position
    ) -> Position:
        opponent_agent = "blue_agent" if self.ego_agent == "red" else "red_agent"
        opponent_pos = [
            tuple(p) for p in np.asarray(observation[opponent_agent]).reshape(-1, 2)
        ]
        return closest_area_pos(curr_pos, opponent_pos)


class CapturePolicy(DestinationPolicy):
    """Target = opponent flag (reference heuristic.py:229-272)."""

    spec_kind = "capture"

    def __init__(
        self,
        field_map: NDArray | None = None,
        action_set=CtfActions,
        random_generator: Generator | None = None,
        randomness: float = 0.75,
        ego_agent: Literal["red", "blue"] = "red",
    ) -> None:
        super().__init__(field_map, action_set, random_generator, randomness)
        self.name = "capture"
        self.ego_agent: Literal["red", "blue"] = ego_agent

    def get_target(
        self, observation: ObservationDictT, curr_pos: Position
    ) -> Position:
        key = "blue_flag" if self.ego_agent == "red" else "red_flag"
        return observation[key]


class PatrolPolicy(DestinationPolicy):
    """Patrol the territory border (reference heuristic.py:275-391).

    The "border" is the set of *opponent-territory or obstacle* cells
    adjacent to an own-territory cell — each own cell contributes at most one
    border cell (first matching scan direction), and duplicates are kept, so
    the on-border target choice is multiplicity-weighted exactly like the
    reference's ``random_generator.choice`` over the duplicated list.

    Note: the reference computes the border in ``__init__`` from
    ``field_map``; constructed without a map it silently gets an *empty*
    border and then crashes on the first ``act`` even after the env injects
    the map (heuristic.py:317-319 vs ctf.py:796-800).  We fix that latent
    bug by recomputing the border lazily when a map appears.
    """

    spec_kind = "patrol"

    def __init__(
        self,
        field_map: NDArray | None = None,
        action_set=CtfActions,
        random_generator: Generator | None = None,
        randomness: float = 0.75,
        ego_agent: Literal["red", "blue"] = "red",
        world: World = CtfWorld,
    ) -> None:
        super().__init__(field_map, action_set, random_generator, randomness)
        self.name = "patrol"
        self.ego_agent: Literal["red", "blue"] = ego_agent
        self.world: World = world
        self.directions: list[Position] = list(_DIRECTIONS)
        self.border: list[Position] = []
        self.obstacle: list[Position] = []
        if self.field_map is not None:
            self.border, self.obstacle = self.locate_border(world, self.directions)

    def _ensure_border(self) -> None:
        if not self.border and self.field_map is not None:
            self.border, self.obstacle = self.locate_border(
                self.world, self.directions
            )

    def locate_border(
        self, world: World, directions: list[Position]
    ) -> tuple[list[Position], list[Position]]:
        """Border + obstacle lists from the field map
        (reference heuristic.py:340-391)."""
        own_t = "red_territory" if self.ego_agent == "red" else "blue_territory"
        opp_t = "red_territory" if self.ego_agent == "blue" else "blue_territory"

        fm = np.asarray(self.field_map)
        own = list(zip(*np.where(fm == world.OBJECT_TO_IDX[own_t])))
        opp = list(zip(*np.where(fm == world.OBJECT_TO_IDX[opp_t])))
        obstacle = list(zip(*np.where(fm == world.OBJECT_TO_IDX["obstacle"])))
        opp_set = set(opp) | set(obstacle)

        border: list[Position] = []
        for loc in own:
            for d in directions:
                new_loc = (loc[0] + d[0], loc[1] + d[1])
                if new_loc in opp_set:
                    border.append(new_loc)
                    break
        return border, obstacle

    def patrol_targets(self) -> list[Position]:
        """Static on-border target pool, duplicates included
        (reference heuristic.py:324-333: neighbors of border cells that are
        themselves border cells, generated from the full border list)."""
        self._ensure_border()
        return [
            (pos[0] + d[0], pos[1] + d[1])
            for pos in self.border
            for d in self.directions
            if position_in_positions((pos[0] + d[0], pos[1] + d[1]), self.border)
        ]

    def get_target(
        self, observation: ObservationDictT, curr_pos: Position
    ) -> Position:
        self._ensure_border()
        if position_in_positions(curr_pos, self.border):
            optimal_locs = self.patrol_targets()
            idx = self.random_generator.integers(0, len(optimal_locs))
            return optimal_locs[int(idx)]
        return closest_area_pos(curr_pos, self.border)


class PatrolFightPolicy(PatrolPolicy):
    """Patrol until an opponent enters ego territory, then fight
    (reference heuristic.py:394-463)."""

    spec_kind = "patrol_fight"

    def __init__(
        self,
        field_map: NDArray | None = None,
        action_set=CtfActions,
        random_generator: Generator | None = None,
        randomness: float = 0.75,
        ego_agent: Literal["red", "blue"] = "red",
        world: World = CtfWorld,
    ) -> None:
        super().__init__(
            field_map, action_set, random_generator, randomness, ego_agent, world
        )
        self.name = "patrol_fight"

    def get_target(
        self, observation: ObservationDictT, curr_pos: Position
    ) -> Position:
        opponent_agent = "blue_agent" if self.ego_agent == "red" else "red_agent"
        ego_territory = (
            "red_territory" if self.ego_agent == "red" else "blue_territory"
        )
        opponent_pos = [
            tuple(p) for p in np.asarray(observation[opponent_agent]).reshape(-1, 2)
        ]
        ego_territory_pos = [
            tuple(p) for p in np.asarray(observation[ego_territory]).reshape(-1, 2)
        ]
        for pos in opponent_pos:
            if position_in_positions(pos, ego_territory_pos):
                return closest_area_pos(curr_pos, opponent_pos)
        return super().get_target(observation, curr_pos)
