"""Gymnasium adapters: reference-compatible Env classes over the functional
TPU engines.

These classes mirror the reference public API (class names, ctor kwargs,
spaces, obs/info shapes — gym_multigrid/envs/collect_game.py:12-409) so a
user of the reference can switch imports.  They are the *compatibility*
surface: one env, host-side stepping of the jitted functional core.  The
performance surface is the functional/batched API in
``gym_multigrid_tpu.parallel``.
"""

from __future__ import annotations

from dataclasses import dataclass

import gymnasium as gym
import jax
import numpy as np
from gymnasium import spaces

from gym_multigrid_tpu.core.actions import CollectActions
from gym_multigrid_tpu.core.world import CollectWorld
from gym_multigrid_tpu.envs.collect import CollectConfig, cached_collect


@dataclass
class AgentProxy:
    """Lightweight stand-in for the reference ``Agent`` object
    (core/agent.py:73-343): exposes the attributes user code reads."""

    index: int
    color: str | None = None
    pos: np.ndarray | None = None
    dir: int = 3
    terminated: bool = False
    started: bool = True
    paused: bool = False
    collided: bool = False
    carrying: object | None = None


class CollectGameEnv(gym.Env):
    """Reference-compatible Collect env (collect_game.py:12-225).

    Obs: full-grid uint8 (size, size, 3); reward: np.float64 per agent;
    info: the 6 fixed pickup counters (collect_game.py:48-55, 109-116).
    """

    metadata = {"render_modes": ["human", "rgb_array"], "video.frames_per_second": 10}
    _layout = "even"

    def __init__(self, *args, actions_set=CollectActions, render_mode="rgb_array", **kwargs):
        size = kwargs.get("size", 10)
        num_balls = kwargs.get("num_balls", 15)
        if isinstance(num_balls, (list, tuple, np.ndarray)):
            num_balls = int(np.sum(np.array(num_balls)))
        balls_index = tuple(kwargs.get("balls_index", (0, 1, 2)))
        balls_reward = tuple(float(r) for r in kwargs.get("balls_reward", (1.0,) * len(balls_index)))
        agents_index = tuple(kwargs.get("agents_index", (3, 5)))
        respawn = bool(kwargs.get("respawn", False))

        self.cfg = CollectConfig(
            size=size,
            num_balls=int(num_balls),
            agents_index=agents_index,
            balls_index=balls_index,
            balls_reward=balls_reward,
            respawn=respawn,
            max_steps=kwargs.get("max_steps", 100),
            layout=self._layout,
            fixed_horizon=getattr(self, "_fixed_horizon", False),
        )
        self._reset_fn, self._step_fn, self._encode_fn = cached_collect(self.cfg)

        self.size = size
        self.width = size
        self.height = size
        self.num_balls = num_balls
        self.balls_index = list(balls_index)
        self.balls_reward = list(balls_reward)
        self.num_ball_types = len(balls_index)
        self.agents_index = list(agents_index)
        self.respawn = respawn
        self.world = CollectWorld
        self.actions = actions_set
        self.actions_set = actions_set
        self.max_steps = self.cfg.max_steps
        self.render_mode = render_mode
        self.collected_balls = 0
        self.step_count = 0
        self.keys = [
            "agent1ball1",
            "agent1ball2",
            "agent1ball3",
            "agent2ball1",
            "agent2ball2",
            "agent2ball3",
        ]
        self.info = {k: 0 for k in self.keys}

        self.agents = [
            AgentProxy(index=i, color=CollectWorld.IDX_TO_COLOR[i])
            for i in agents_index
        ]
        self.action_space = spaces.Discrete(len(actions_set))
        self.observation_space = spaces.Box(
            low=0,
            high=255,
            shape=(self.width, self.height, self.world.encode_dim),
            dtype="uint8",
        )
        self.ac_dim = self.action_space.n
        self.reward_range = (0, 1)
        self.window = None

        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._state = None

    # -- helpers -----------------------------------------------------------
    def _sync_proxies(self):
        pos = np.asarray(self._state.agent_pos)
        for i, a in enumerate(self.agents):
            a.pos = pos[i]
        self.collected_balls = int(self._state.collected)
        self.step_count = int(self._state.step_count)

    def _info_dict(self):
        counts = np.asarray(self._state.info_counts)
        info = {k: 0 for k in self.keys}
        for i in range(min(counts.shape[0], 2)):
            for j in range(min(counts.shape[1], 3)):
                info[self.keys[3 * i + j]] = int(counts[i, j])
        return info

    # -- gym API ------------------------------------------------------------
    def reset(self, *, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state = self._reset_fn(k)
        self._sync_proxies()
        self.info = self._info_dict()
        state = np.asarray(self._encode_fn(self._state))
        return state, self.info

    def step(self, actions):
        actions = np.asarray(np.round(np.asarray(actions)), dtype=np.int32).reshape(-1)
        if actions.size != len(self.agents):
            # JAX's clamped indexing would otherwise silently ignore extra
            # actions or replay the last one for missing agents.
            raise ValueError(
                f"expected {len(self.agents)} actions (one per agent), "
                f"got {actions.size}"
            )
        self._state, obs, rewards, terminated, truncated, _ = self._step_fn(
            self._state, actions
        )
        self._sync_proxies()
        self.info = self._info_dict()
        return (
            np.asarray(obs),
            np.asarray(rewards, dtype=np.float64),
            bool(terminated),
            bool(truncated),
            self.info,
        )

    def phi_dim(self) -> int:
        """Feature dim = number of ball types (collect_game.py:216-225)."""
        return self.num_ball_types

    def render(self):
        from gym_multigrid_tpu.render.tiles import render_collect

        img = render_collect(self.cfg, self._state)
        if self.render_mode == "human":
            from gym_multigrid_tpu.render.window import Window

            if self.window is None:
                self.window = Window("gym_multigrid_tpu")
                self.window.show(block=False)
            self.window.show_img(img)
        return img

    def close(self):
        if self.window is not None:
            self.window.close()
            self.window = None


class CollectGameEvenDist(CollectGameEnv):
    """Equal number of balls per type (collect_game.py:227-259)."""

    _layout = "even"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_balls_per_type = self.num_balls // len(self.balls_index)


class CollectGameQuadrants(CollectGameEnv):
    """Ball types clustered in quadrants (collect_game.py:261-300)."""

    _layout = "quadrants"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_balls_per_type = self.num_balls // len(self.balls_index)


class CollectGameRooms(CollectGameEnv):
    """Four-room layout (collect_game.py:302-362)."""

    _layout = "rooms"

    def __init__(self, size: int = 11, *args, **kwargs):
        kwargs["size"] = kwargs.get("size", size)
        super().__init__(*args, **kwargs)


class CollectGameRoomsFixedHorizon(CollectGameRooms):
    """Rooms with terminated forced False (collect_game.py:364-370)."""

    _fixed_horizon = True


class CollectGameQuadrantsRespawn(CollectGameQuadrants):
    """Quadrants layout, respawn into the ball's own partition
    (collect_game.py:372-409).  The reference ctor takes no kwargs and
    therefore crashes under gym.make (SURVEY.md §2.2); this implements the
    documented intent so `multigrid-collect-respawn-clustered-v0` works."""

    _layout = "quadrants_respawn"

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("respawn", True)
        super().__init__(*args, **kwargs)
