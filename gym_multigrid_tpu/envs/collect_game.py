"""Alias module: the reference names this file collect_game.py
(gym_multigrid/envs/collect_game.py); both import paths work here."""

from gym_multigrid_tpu.adapters.gym_adapter import (  # noqa: F401
    CollectGameEnv,
    CollectGameEvenDist,
    CollectGameQuadrants,
    CollectGameQuadrantsRespawn,
    CollectGameRooms,
    CollectGameRoomsFixedHorizon,
)
from gym_multigrid_tpu.envs.collect import (  # noqa: F401
    CollectConfig,
    CollectState,
    cached_collect,
    make_collect,
)
