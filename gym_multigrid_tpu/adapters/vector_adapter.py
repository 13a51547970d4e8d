"""Gymnasium ``VectorEnv`` facade over the jitted ``BatchedEnv``.

The reference ecosystem consumes envs through Gymnasium's vector API
(SB3 VecEnv and friends); this adapter exposes the whole TPU-resident
lockstep batch — slab-math or fused-kernel step, in-graph auto-reset —
behind that standard surface, so host RL loops can drive thousands of
envs with one `step()` call.

Autoreset follows Gymnasium 1.x "next-step" semantics, which is exactly
what BatchedEnv implements: the step that finishes an episode returns the
FINAL observation/reward with terminated/truncated set; the following
step starts from the freshly reset state.

Example::

    from gym_multigrid_tpu.adapters.vector_adapter import make_vector_env
    venv = make_vector_env("collect", num_envs=4096)
    obs, info = venv.reset(seed=0)
    obs, rew, term, trunc, info = venv.step(venv.action_space.sample())
"""

from __future__ import annotations

from typing import Any

import numpy as np
import gymnasium as gym
from gymnasium import spaces
from gymnasium.vector import VectorEnv
from gymnasium.vector.utils import batch_space

import jax


class JaxVectorEnv(VectorEnv):
    """VectorEnv over a :class:`~gym_multigrid_tpu.parallel.vector.BatchedEnv`.

    Parameters
    ----------
    env : BatchedEnv
        The jitted lockstep batch (must have auto_reset=True for the
        Gymnasium autoreset contract).
    single_observation_space / single_action_space : gymnasium spaces
        Per-env spaces (e.g. lifted from the matching single-env adapter).
    """

    metadata: dict[str, Any] = {"autoreset_mode": "NextStep"}

    def __init__(
        self,
        env,
        single_observation_space: spaces.Space,
        single_action_space: spaces.Space,
    ):
        self._env = env
        self.num_envs = env.num_envs
        self.single_observation_space = single_observation_space
        self.single_action_space = single_action_space
        self.observation_space = batch_space(
            single_observation_space, env.num_envs
        )
        self.action_space = batch_space(single_action_space, env.num_envs)
        self._reset_jit = jax.jit(env.reset)
        self._step_jit = jax.jit(env.step)
        self._states = None
        self._key = jax.random.PRNGKey(0)

    @property
    def states(self):
        """The device-resident state pytree (for checkpointing/rendering)."""
        return self._states

    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._states, obs = self._reset_jit(k)
        return np.asarray(obs), {}

    def step(self, actions):
        actions = np.asarray(actions)
        if actions.ndim == 1 and self._env.actions_shape:
            actions = actions.reshape(
                (self.num_envs, *self._env.actions_shape)
            )
        self._states, obs, rewards, term, trunc = self._step_jit(
            self._states, actions
        )
        return (
            np.asarray(obs),
            np.asarray(rewards, dtype=np.float64),
            np.asarray(term),
            np.asarray(trunc),
            {},
        )

    def close_extras(self, **kwargs):
        self._states = None


def make_vector_env(family: str, num_envs: int, use_pallas: bool = False,
                    **cfg_kwargs) -> JaxVectorEnv:
    """Build a JaxVectorEnv for an env family with its default config.

    family: "collect" | "ctf" | "maze" | "wildfire"; cfg_kwargs override
    the family config (e.g. map_path for ctf/maze).
    """
    from gym_multigrid_tpu.parallel import vector as pv

    if family == "collect":
        from gym_multigrid_tpu.envs.collect import CollectConfig

        cfg_kwargs.setdefault("layout", "quadrants_respawn")
        cfg_kwargs.setdefault("respawn", True)
        cfg_kwargs.setdefault("max_steps", 50)
        cfg = CollectConfig(**cfg_kwargs)
        env = pv.make_collect_batch(cfg, num_envs, use_pallas=use_pallas)
        obs_space = spaces.Box(
            0, 255, (cfg.width, cfg.height, 3), dtype=np.uint8
        )
        act_space = spaces.MultiDiscrete([4] * cfg.num_agents)
    elif family == "ctf":
        from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec

        map_path = cfg_kwargs.pop("map_path", "tests/assets/board.txt")
        cfg_kwargs.setdefault("num_blue_agents", 2)
        cfg_kwargs.setdefault("num_red_agents", 2)
        cfg_kwargs.setdefault("variant", "mvn")
        cfg_kwargs.setdefault(
            "enemy_policies",
            tuple(
                PolicySpec("rw")
                for _ in range(cfg_kwargs["num_red_agents"])
            ),
        )
        cfg_kwargs.setdefault("observation_option", "flattened")
        cfg = CtfConfig.from_map_path(map_path, **cfg_kwargs)
        env = pv.make_ctf_batch(cfg, num_envs, use_pallas=use_pallas)
        # flattened obs length = positions + flags + territories +
        # obstacles + terminated flags (adapters/ctf_adapter.py); probe it.
        from gym_multigrid_tpu.envs.ctf import make_ctf

        fns = make_ctf(cfg)
        probe = fns.obs_fn(fns.reset_fn(jax.random.PRNGKey(0)))
        obs_space = spaces.Box(
            -np.inf, np.inf, np.asarray(probe).shape, dtype=np.float64
        )
        act_space = spaces.MultiDiscrete([5] * cfg.num_blue_agents)
    elif family == "maze":
        from gym_multigrid_tpu.envs.maze import MazeConfig, make_maze

        map_path = cfg_kwargs.pop("map_path", "tests/assets/board_maze.txt")
        cfg = MazeConfig.from_map_path(map_path, **cfg_kwargs)
        env = pv.make_maze_batch(cfg, num_envs, use_pallas=use_pallas)
        fns = make_maze(cfg)
        probe = fns.obs_fn(fns.reset_fn(jax.random.PRNGKey(0)))
        if isinstance(probe, dict):
            obs_space = spaces.Dict(
                {
                    k: spaces.Box(
                        -np.inf, np.inf, np.asarray(v).shape, np.float64
                    )
                    for k, v in probe.items()
                }
            )
        else:
            obs_space = spaces.Box(
                -np.inf, np.inf, np.asarray(probe).shape, np.float64
            )
        act_space = spaces.Discrete(5)
    elif family == "wildfire":
        from gym_multigrid_tpu.envs.wildfire import WildfireConfig

        cfg = WildfireConfig(**cfg_kwargs)
        env = pv.make_wildfire_batch(cfg, num_envs, use_pallas=use_pallas)
        obs_space = spaces.Box(
            0, 255, (cfg.width, cfg.height, 3), dtype=np.uint8
        )
        act_space = spaces.MultiDiscrete([5] * cfg.num_agents)
    else:
        raise ValueError(f"unknown family {family!r}")

    return JaxVectorEnv(env, obs_space, act_space)
