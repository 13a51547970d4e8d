"""gym_multigrid_tpu: a TPU-native multi-agent gridworld framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference ``gym-multigrid`` package: the same env families (Collect,
Capture-the-Flag, Maze — plus Wildfire), spaces, encodings, transition and
reward semantics, scripted opponent policies, wrappers and renderer —
re-architected as pure-functional, jittable, vmappable, mesh-shardable
programs.

Gymnasium registrations mirror gym_multigrid/__init__.py:6-147 (same ids,
same kwargs, same time limits).
"""

from gymnasium.envs.registration import register

__version__ = "0.1.0"


def register_envs() -> None:
    """(Re-)register the 9 reference env ids against our entry points.

    Idempotent; call again if another package (e.g. the upstream reference
    in differential tests) overrides the shared gymnasium ids.
    """

    _COMMON = {
        "size": 10,
        "num_balls": 15,
        "agents_index": [3, 5],  # green, purple
        "balls_index": [0, 1, 2],  # red, orange, yellow
        "balls_reward": [1, 1, 1],
    }

    # Collect game with 2 agents and 3 object types (reference __init__.py:6-18)
    register(
        id="multigrid-collect-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameEvenDist",
        max_episode_steps=100,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": False},
    )

    # Single agent variant (reference __init__.py:20-33)
    register(
        id="multigrid-collect-single-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameEvenDist",
        max_episode_steps=100,
        disable_env_checker=True,
        kwargs={**_COMMON, "agents_index": [3], "respawn": False},
    )

    # Quadrant-clustered (reference __init__.py:35-49)
    register(
        id="multigrid-collect-quadrants-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameQuadrants",
        max_episode_steps=100,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": False},
    )

    # Four rooms (reference __init__.py:51-64)
    register(
        id="multigrid-collect-rooms-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameRooms",
        max_episode_steps=100,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": False},
    )

    # Four rooms, fixed horizon (reference __init__.py:66-81)
    register(
        id="multigrid-collect-rooms-fixed-horizon-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameRoomsFixedHorizon",
        max_episode_steps=100,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": False},
    )

    # Four rooms, fixed horizon + respawn (reference __init__.py:83-97)
    register(
        id="multigrid-collect-rooms-respawn-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameRoomsFixedHorizon",
        max_episode_steps=50,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": True},
    )

    # Even dist + respawn (reference __init__.py:99-113)
    register(
        id="multigrid-collect-respawn-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameEvenDist",
        max_episode_steps=50,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": True},
    )

    # Quadrants + respawn-into-own-partition (reference __init__.py:115-134;
    # upstream this id cannot even be constructed — SURVEY.md §2.2 — here it
    # implements the documented intent)
    register(
        id="multigrid-collect-respawn-clustered-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameQuadrantsRespawn",
        max_episode_steps=50,
        disable_env_checker=True,
        kwargs={**_COMMON, "respawn": True},
    )

    # 15x15 quadrants (reference __init__.py:136-147)
    register(
        id="multigrid-collect-quadrants15-v0",
        entry_point="gym_multigrid_tpu.envs:CollectGameQuadrants",
        disable_env_checker=True,
        kwargs={
            "size": 15,
            "num_balls": 30,
            "agents_index": [3, 5],
            "balls_index": [0, 1, 2],
            "balls_reward": [1, 1, 1],
            "respawn": False,
        },
    )

    # Wildfire: new family (the reference README lists it with no code —
    # envs/wildfire.py design note)
    register(
        id="multigrid-wildfire-v0",
        entry_point="gym_multigrid_tpu.envs:WildfireEnv",
        max_episode_steps=100,
        disable_env_checker=True,
        kwargs={"size": 16, "num_agents": 2},
    )


register_envs()
