"""Agent-centric toroidal observation wrapper for Collect envs.

Reference parity: gym_multigrid/wrappers/toroid.py:6-68 — per agent, a
(W, H, num_ball_types + num_agents) one-hot tensor whose coordinates are
shifted so the agent sits at the origin, wrapping around the board edges;
channels are [ball color idx..., other-agents at depth-2, walls at depth-1],
written ``tor[new_y, new_x, c]``.

The reference builds this with an O(W*H) Python loop per agent; here each
channel is a boolean plane of the grid rolled by the agent position —
jittable, vmappable over both agents and env batches.
"""

from __future__ import annotations

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import ObservationWrapper, spaces


def toroid_obs_fn(cfg):
    """Build a pure function CollectState -> (n_agents, W, H, depth) f32.

    depth = num_ball_types + num_agents; channel layout matches the
    reference (toroid.py:53-66).
    """
    from gym_multigrid_tpu.envs.collect import AGENT, BALL, WALL

    w, h = cfg.width, cfg.height
    n_agents = cfg.num_agents
    depth = cfg.num_ball_types + n_agents

    def one_agent(grid_obj, grid_color, pos):
        obj = grid_obj.reshape(h, w)  # [y, x]
        col = grid_color.reshape(h, w)
        # tor[new_y, new_x] with new = (coord - agent_pos) mod size
        # == roll the plane up/left by the agent position.
        def center(plane):
            return jnp.roll(plane, shift=(-pos[1], -pos[0]), axis=(0, 1))

        tor = jnp.zeros((h, w, depth), dtype=jnp.float32)
        for c in sorted(set(cfg.balls_index)):
            # Ball channel = the ball's color id
            # (world.COLOR_TO_IDX[obj.color], toroid.py:58-62); ids beyond
            # depth would IndexError upstream — skipped here.
            if c < depth:
                tor = tor.at[:, :, c].max(
                    center((obj == BALL) & (col == c)).astype(jnp.float32)
                )
        # Other agents at depth-2 (may overlap a ball channel when
        # num_agents == 1, exactly like the reference), walls at depth-1.
        # The centered agent itself is excluded (toroid.py:64): after
        # rolling it sits at the origin cell.
        oa = center(obj == AGENT).at[0, 0].set(False)
        tor = tor.at[:, :, depth - 2].max(oa.astype(jnp.float32))
        tor = tor.at[:, :, depth - 1].max(
            center(obj == WALL).astype(jnp.float32)
        )
        return tor

    def fn(state):
        return jax.vmap(
            lambda p: one_agent(state.grid_obj, state.grid_color, p)
        )(state.agent_pos)

    return fn


class ToroidObservation(ObservationWrapper):
    """Gymnasium wrapper mirroring the reference class (toroid.py:6-68):
    ``observation`` returns a list of per-agent toroidal tensors."""

    def __init__(self, env: gym.Env):
        super().__init__(env)
        self.env = env
        base = env.unwrapped
        self.depth = base.num_ball_types + len(base.agents)
        self.observation_space = spaces.Box(
            shape=(base.width, base.height, self.depth), low=-np.inf, high=np.inf
        )
        self._fn = jax.jit(toroid_obs_fn(base.cfg))

    def observation(self, obs):
        out = np.asarray(self._fn(self.env.unwrapped._state))
        return [out[i] for i in range(out.shape[0])]
