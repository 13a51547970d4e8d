"""Env families: functional engines + reference-compatible adapters."""

from gym_multigrid_tpu.adapters.gym_adapter import (
    CollectGameEnv,
    CollectGameEvenDist,
    CollectGameQuadrants,
    CollectGameQuadrantsRespawn,
    CollectGameRooms,
    CollectGameRoomsFixedHorizon,
)
from gym_multigrid_tpu.envs.collect import CollectConfig, CollectState, make_collect

__all__ = [
    "CollectGameEnv",
    "CollectGameEvenDist",
    "CollectGameQuadrants",
    "CollectGameQuadrantsRespawn",
    "CollectGameRooms",
    "CollectGameRoomsFixedHorizon",
    "CollectConfig",
    "CollectState",
    "make_collect",
]
