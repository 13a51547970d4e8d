"""Gymnasium adapter for the Wildfire family (new in this framework; the
reference lists Wildfire with no code — see envs/wildfire.py design note)."""

from __future__ import annotations

import gymnasium as gym
import jax
import numpy as np
from gymnasium import spaces

from gym_multigrid_tpu.core.actions import WildfireActions
from gym_multigrid_tpu.core.world import WildfireWorld
from gym_multigrid_tpu.envs.wildfire import WildfireConfig, cached_wildfire


class WildfireAgentProxy:
    def __init__(self, index: int, color: str):
        self.index = index
        self.type = "agent"
        self.color = color
        self.pos = None
        self.dir = 3
        self.terminated = False
        self.carrying = None


class WildfireEnv(gym.Env):
    """Firefighter team vs spreading fire (see envs/wildfire.py)."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 10}

    def __init__(self, render_mode: str = "rgb_array", **kwargs):
        kwargs.pop("max_episode_steps", None)
        if "agents_index" in kwargs:
            kwargs["agents_index"] = tuple(kwargs["agents_index"])
        self.cfg = WildfireConfig(**kwargs)
        self._fns = cached_wildfire(self.cfg)
        self.world = WildfireWorld
        self.actions_set = WildfireActions
        self.render_mode = render_mode
        self.width = self.cfg.width
        self.height = self.cfg.height
        self.max_steps = self.cfg.max_steps
        self.num_ball_types = 0
        self.agents = [
            WildfireAgentProxy(i, WildfireWorld.IDX_TO_COLOR.get(ci, "blue"))
            for i, ci in enumerate(self.cfg.agents_index)
        ]
        self.action_space = spaces.MultiDiscrete(
            [len(self.actions_set)] * self.cfg.num_agents
        )
        self.observation_space = spaces.Box(
            low=0,
            high=255,
            shape=(self.width, self.height, 3),
            dtype="uint8",
        )
        self.window = None
        self.step_count = 0
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._state = None

    def _sync(self):
        pos = np.asarray(self._state.agent_pos)
        for i, a in enumerate(self.agents):
            a.pos = pos[i]
        self.step_count = int(self._state.step_count)

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state = self._fns.reset_fn(k)
        self._sync()
        obs = np.asarray(self._fns.encode_fn(self._state))
        cells = np.asarray(self._state.cells)
        info = {
            "extinguished": 0,
            "burning": int((cells == 2).sum()),
            "burnt": int((cells == 3).sum()),
        }
        return obs, info

    def step(self, actions):
        actions = np.asarray(
            np.round(np.asarray(actions, dtype=float)), dtype=np.int32
        ).reshape(-1)
        if actions.size != self.cfg.num_agents:
            # Without this, a wrong-length action vector dies much later
            # as an opaque reshape error inside the jitted core.
            raise ValueError(
                f"expected {self.cfg.num_agents} actions (one per agent, "
                f"action_space {self.action_space}), got {actions.size}"
            )
        self._state, obs, rewards, terminated, truncated, info = self._fns.step_fn(
            self._state, actions
        )
        self._sync()
        return (
            np.asarray(obs),
            np.asarray(rewards, dtype=np.float64),
            bool(terminated),
            bool(truncated),
            {k: int(v) for k, v in info.items()},
        )

    def render(self):
        from gym_multigrid_tpu.render.tiles import render_wildfire

        img = render_wildfire(self.cfg, self._state)
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
