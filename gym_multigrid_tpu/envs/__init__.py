"""Env families: functional engines + reference-compatible adapters."""

from gym_multigrid_tpu.adapters.gym_adapter import (
    CollectGameEnv,
    CollectGameEvenDist,
    CollectGameQuadrants,
    CollectGameQuadrantsRespawn,
    CollectGameRooms,
    CollectGameRoomsFixedHorizon,
)
from gym_multigrid_tpu.adapters.ctf_adapter import Ctf1v1Env, CtFMvNEnv
from gym_multigrid_tpu.adapters.maze_adapter import MazeSingleAgentEnv
from gym_multigrid_tpu.envs.collect import CollectConfig, CollectState, make_collect
from gym_multigrid_tpu.envs.ctf import CtfConfig, CtfState, PolicySpec, make_ctf
from gym_multigrid_tpu.adapters.wildfire_adapter import WildfireEnv
from gym_multigrid_tpu.envs.maze import MazeConfig, MazeState, make_maze
from gym_multigrid_tpu.envs.wildfire import (
    WildfireConfig,
    WildfireState,
    make_wildfire,
)

__all__ = [
    "Ctf1v1Env",
    "CtFMvNEnv",
    "CtfConfig",
    "CtfState",
    "PolicySpec",
    "make_ctf",
    "MazeSingleAgentEnv",
    "MazeConfig",
    "MazeState",
    "make_maze",
    "WildfireEnv",
    "WildfireConfig",
    "WildfireState",
    "make_wildfire",
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
