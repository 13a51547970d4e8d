"""Core layer: constants, worlds, object model, agents, grid."""

from gym_multigrid_tpu.core.actions import (
    CollectActions,
    CtfActions,
    DefaultActions,
    MazeActions,
    MineActions,
    SmallActions,
    WildfireActions,
)
from gym_multigrid_tpu.core.agent import Agent, PolicyAgent
from gym_multigrid_tpu.core.grid import Grid
from gym_multigrid_tpu.core.object import (
    Ball,
    Box,
    Door,
    Flag,
    Floor,
    Goal,
    Key,
    Lava,
    ObjectGoal,
    Obstacle,
    Switch,
    Wall,
    WorldObj,
    behavior_tables,
)
from gym_multigrid_tpu.core.world import (
    CollectWorld,
    CtfWorld,
    DefaultWorld,
    MazeWorld,
    WildfireWorld,
    World,
)

__all__ = [
    "Agent", "PolicyAgent", "Grid", "World", "WorldObj", "behavior_tables",
    "Ball", "Box", "Door", "Flag", "Floor", "Goal", "Key", "Lava",
    "ObjectGoal", "Obstacle", "Switch", "Wall",
    "CollectWorld", "CtfWorld", "DefaultWorld", "MazeWorld", "WildfireWorld",
    "DefaultActions", "CollectActions", "SmallActions", "MineActions",
    "CtfActions", "MazeActions", "WildfireActions",
]
