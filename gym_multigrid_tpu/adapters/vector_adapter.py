"""Gymnasium ``VectorEnv`` facade over the jitted ``BatchedEnv``.

The reference ecosystem consumes envs through Gymnasium's vector API
(SB3 VecEnv and friends); this adapter exposes the whole TPU-resident
lockstep batch — slab-math or fused-kernel step, in-graph auto-reset —
behind that standard surface, so host RL loops can drive thousands of
envs with one `step()` call.

Autoreset implements Gymnasium 1.x ``AutoresetMode.NEXT_STEP`` exactly
(gymnasium/vector/sync_vector_env.py): the step that finishes an episode
returns the FINAL observation/reward with terminated/truncated set; on
the FOLLOWING step the action for that env is ignored and the call
returns the freshly reset episode's first observation with reward 0.
BatchedEnv already reset the state in-graph, so the masked envs simply
hold still for one call.

Example::

    from gym_multigrid_tpu.adapters.vector_adapter import make_vector_env
    venv = make_vector_env("collect", num_envs=4096)
    obs, info = venv.reset(seed=0)
    obs, rew, term, trunc, info = venv.step(venv.action_space.sample())
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import gymnasium as gym
from gymnasium import spaces
from gymnasium.vector import VectorEnv
from gymnasium.vector.utils import batch_space

import jax
import jax.numpy as jnp

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

try:  # gymnasium >= 1.0
    from gymnasium.vector import AutoresetMode

    _NEXT_STEP = AutoresetMode.NEXT_STEP
except ImportError:  # pragma: no cover - old gymnasium
    _NEXT_STEP = "NextStep"


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

    metadata: dict[str, Any] = {"autoreset_mode": _NEXT_STEP}

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

        def _step(states, actions, mask):
            """NEXT_STEP autoreset: envs flagged in ``mask`` finished last
            call and were already reset in-graph — their action is ignored
            and they report the fresh first observation with reward 0."""
            from gym_multigrid_tpu.parallel.vector import _where_done

            stepped, obs, rew, term, trunc = env.step(states, actions)
            fresh_obs = jax.vmap(env.encode_one)(states)

            def mrow(x, value):
                m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
                return jnp.where(m, value, x)

            out_states = _where_done(mask, states, stepped)
            obs = _where_done(mask, fresh_obs, obs)
            rew = mrow(rew, 0)
            term = mrow(term, False)
            trunc = mrow(trunc, False)
            return out_states, obs, rew, term, trunc, term | trunc

        self._step_jit = jax.jit(_step)
        self._states = None
        self._autoreset = None
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
        self._autoreset = jnp.zeros((self.num_envs,), dtype=bool)
        return np.asarray(obs), {}

    def step(self, actions):
        actions = np.asarray(actions)
        if actions.ndim == 1 and self._env.actions_shape:
            actions = actions.reshape(
                (self.num_envs, *self._env.actions_shape)
            )
        self._states, obs, rewards, term, trunc, self._autoreset = (
            self._step_jit(self._states, actions, self._autoreset)
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


def _box_like(probe) -> spaces.Box:
    """A Box matching the probe observation's shape AND dtype (so
    ``space.contains(obs)`` holds for the arrays actually produced)."""
    arr = np.asarray(probe)
    if arr.dtype == np.uint8:
        return spaces.Box(0, 255, arr.shape, dtype=np.uint8)
    return spaces.Box(-np.inf, np.inf, arr.shape, dtype=arr.dtype)


def make_vector_env(family: str, num_envs: int, use_pallas: bool = False,
                    **cfg_kwargs) -> JaxVectorEnv:
    """Build a JaxVectorEnv for an env family with its default config.

    family: "collect" | "ctf" | "maze" | "wildfire"; cfg_kwargs override
    the family config (e.g. map_path for ctf/maze — defaults anchor to
    the repo's test assets regardless of cwd).
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
        from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec, make_ctf

        map_path = cfg_kwargs.pop(
            "map_path", os.path.join(_REPO_ROOT, "tests/assets/board.txt")
        )
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
        fns = make_ctf(cfg)
        probe = fns.obs_fn(fns.reset_fn(jax.random.PRNGKey(0)))
        obs_space = _box_like(probe)
        act_space = spaces.MultiDiscrete([5] * cfg.num_blue_agents)
    elif family == "maze":
        from gym_multigrid_tpu.envs.maze import MazeConfig, make_maze

        map_path = cfg_kwargs.pop(
            "map_path",
            os.path.join(_REPO_ROOT, "tests/assets/board_maze.txt"),
        )
        cfg = MazeConfig.from_map_path(map_path, **cfg_kwargs)
        env = pv.make_maze_batch(cfg, num_envs, use_pallas=use_pallas)
        fns = make_maze(cfg)
        probe = fns.obs_fn(fns.reset_fn(jax.random.PRNGKey(0)))
        if isinstance(probe, dict):
            obs_space = spaces.Dict(
                {k: _box_like(v) for k, v in probe.items()}
            )
        else:
            obs_space = _box_like(probe)
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
