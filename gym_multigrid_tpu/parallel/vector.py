"""Batched lockstep env execution: vmap + auto-reset + scan rollouts.

This is the performance surface the reference lacks entirely (one env, one
Python process — SURVEY.md §2.4).  An env batch runs in lockstep; done envs
are reset *inside* the jitted step (select-based auto-reset), and whole
rollouts run as a single ``lax.scan`` so dispatch overhead amortizes to zero.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _where_done(done: jax.Array, a: Any, b: Any) -> Any:
    """tree-select: done envs take ``a``, others ``b`` (batch-leading leaves)."""

    def sel(x, y):
        d = done.reshape(done.shape + (1,) * (x.ndim - done.ndim))
        return jnp.where(d, x, y)

    return jax.tree_util.tree_map(sel, a, b)


@dataclass(frozen=True)
class BatchedEnv:
    """Batched functional env with auto-reset.

    reset(key) -> (states, obs)
    step(states, actions) -> (states', obs, rewards, terminated, truncated)

    ``step`` applies the underlying transition to every env, then replaces
    done envs with freshly reset states (the obs/reward returned are the
    *pre-reset* ones, gymnasium autoreset convention: final step visible,
    next obs comes from the reset state on the following call).
    """

    reset_one: Callable
    step_one: Callable
    encode_one: Callable
    num_envs: int
    auto_reset: bool = True
    # Optional whole-batch transition (e.g. a fused Pallas kernel); used
    # instead of vmap(step_one) when provided.  Same contract per env.
    step_batch: Callable | None = None
    # Action space of ONE env: rollout's random policy samples from these
    # (set by the family builders; don't rely on the legacy fallbacks).
    num_actions: int = 4
    actions_shape: tuple[int, ...] = (2,)

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        states = jax.vmap(self.reset_one)(keys)
        obs = jax.vmap(self.encode_one)(states)
        return states, obs

    def step(self, states, actions):
        actions = jnp.asarray(actions)
        if actions.shape[:1] != (self.num_envs,):
            # Caught at trace time; without it a wrong batch size dies as
            # an opaque broadcast error inside the family math.
            raise ValueError(
                f"actions must be batched over {self.num_envs} envs "
                f"(expected leading shape ({self.num_envs}, "
                f"*{self.actions_shape}), got {actions.shape})"
            )
        if self.step_batch is not None:
            new_states, obs, rewards, term, trunc, info = self.step_batch(
                states, actions
            )
        else:
            new_states, obs, rewards, term, trunc, info = jax.vmap(
                self.step_one
            )(states, actions)
        if self.auto_reset:
            done = term | trunc

            # Resetting recomputes the whole placement program for every
            # env; gate it behind a batch-level cond so the work is skipped
            # at runtime on the (majority of) steps where no env finished.
            def do_reset(ns):
                # Each env resets from its own post-step key -> streams stay
                # independent per env and across resets.
                reset_keys = jax.vmap(jax.random.split)(ns.key)
                fresh = jax.vmap(self.reset_one)(reset_keys[:, 0])
                return _where_done(done, fresh, ns)

            new_states = jax.lax.cond(
                jnp.any(done), do_reset, lambda ns: ns, new_states
            )
        return new_states, obs, rewards, term, trunc

    def rollout(
        self,
        states,
        key: jax.Array,
        num_steps: int,
        policy: Callable | None = None,
        num_actions: int | None = None,
        actions_shape: tuple[int, ...] | None = None,
        run_return: jax.Array | None = None,
    ):
        """Scan ``num_steps`` lockstep steps.

        policy(key, obs_states) -> actions; defaults to uniform random
        actions over THIS env's action space (num_actions/actions_shape
        default to the fields the family builder set). Returns
        (final_states, metrics) where metrics carries the summed rewards
        plus per-episode return accounting that stays correct across the
        auto-reset boundary (SURVEY.md §7 "hard parts"):

        - ``reward_sum``: scalar, all team rewards in this call.
        - ``episodes``: scalar int, episodes COMPLETED in this call.
        - ``ep_return_sum``: scalar, summed full-episode returns of those
          completed episodes — ``ep_return_sum / episodes`` is the mean
          episode return RL users watch.  Scalars are psum-able.
        - ``run_return``: (num_envs,) running return of each env's
          episode in progress; feed it back via the ``run_return`` arg on
          the next call so episodes spanning call boundaries stay exact.
        """
        num_actions = self.num_actions if num_actions is None else num_actions
        actions_shape = (
            self.actions_shape if actions_shape is None else actions_shape
        )
        if run_return is None:
            run_return = jnp.zeros((self.num_envs,), jnp.float32)

        def body(carry, _):
            states, key, ret_sum, ep_count, ep_ret_sum, run_ret = carry
            key, k_act = jax.random.split(key)
            if policy is None:
                actions = jax.random.randint(
                    k_act, (self.num_envs, *actions_shape), 0, num_actions
                )
            else:
                actions = policy(k_act, states)
            states, obs, rewards, term, trunc = self.step(states, actions)
            # Per-agent rewards sum into a team return (same convention as
            # the PPO learner); scalar rewards pass through.
            team = rewards.sum(axis=-1) if rewards.ndim > 1 else rewards
            run_ret = run_ret + team.astype(jnp.float32)
            done = term | trunc
            ret_sum = ret_sum + rewards.sum()
            ep_count = ep_count + done.sum()
            ep_ret_sum = ep_ret_sum + jnp.where(done, run_ret, 0.0).sum()
            run_ret = jnp.where(done, 0.0, run_ret)
            return (states, key, ret_sum, ep_count, ep_ret_sum, run_ret), None

        init = (
            states,
            key,
            jnp.float32(0.0),
            jnp.int32(0),
            jnp.float32(0.0),
            run_return,
        )
        (states, _, ret_sum, ep_count, ep_ret_sum, run_ret), _ = jax.lax.scan(
            body, init, None, length=num_steps
        )
        return states, {
            "reward_sum": ret_sum,
            "episodes": ep_count,
            "ep_return_sum": ep_ret_sum,
            "run_return": run_ret,
        }



def _swap_obs(raw_step_batch, encode_one):
    """Wrap a whole-batch transition so the returned observation is the
    partial-obs FOV encode of the post-step (pre-auto-reset) states —
    shared by every family's ``partial_obs_view`` path."""

    def step_batch(states, actions):
        ns, _, rew, term, trunc, info = raw_step_batch(states, actions)
        return ns, jax.vmap(encode_one)(ns), rew, term, trunc, info

    return step_batch


def make_collect_batch(
    cfg,
    num_envs: int,
    auto_reset: bool = True,
    use_pallas: bool = False,
    partial_obs_view: int | None = None,
) -> BatchedEnv:
    """partial_obs_view=V swaps the full-grid encode for the batched
    agent-FOV pipeline (envs/partial_obs.py): per-env observations become
    (n_agents, V, V, 3) uint8."""
    from gym_multigrid_tpu.envs.collect import (
        make_collect,
        make_collect_partial_encode,
    )

    reset_one, step_one, encode_one = make_collect(cfg)
    # Slab math is the default XLA path (see make_ctf_batch); the fused
    # kernel replaces it on real TPUs when requested.
    from gym_multigrid_tpu.ops.pallas_collect import make_collect_step_batch

    step_batch = make_collect_step_batch(cfg, use_kernel=use_pallas)
    if partial_obs_view is not None:
        encode_one = make_collect_partial_encode(cfg, partial_obs_view)
        step_batch = _swap_obs(step_batch, encode_one)

    return BatchedEnv(
        reset_one=reset_one,
        step_one=step_one,
        encode_one=encode_one,
        num_envs=num_envs,
        auto_reset=auto_reset,
        step_batch=step_batch,
        num_actions=4,
        actions_shape=(cfg.num_agents,),
    )


def make_ctf_batch(
    cfg,
    num_envs: int,
    auto_reset: bool = True,
    use_pallas: bool = False,
    partial_obs_view: int | None = None,
) -> BatchedEnv:
    """Batched CtF with in-graph scripted red policies; actions are the blue
    team's, shape (num_envs, num_blue).  partial_obs_view=V swaps the
    configured observation for the batched agent-FOV pipeline
    (envs/partial_obs.py): per-env observations become
    (n_agents, V, V, 3) uint8."""
    from gym_multigrid_tpu.envs.ctf import make_ctf, make_ctf_partial_encode

    fns = make_ctf(cfg)

    def step_one(state, blue_actions):
        return fns.step_fn(state, blue_actions)

    # Whole-batch slab math (shared with the kernel) is the default XLA
    # path — vmap(step_one)'s per-agent scalar chains are ~4x slower at
    # batch scale; exotic policy specs silently fall back to vmap.
    from gym_multigrid_tpu.ops.pallas_ctf import make_ctf_step_batch

    step_batch = make_ctf_step_batch(cfg, use_kernel=use_pallas)
    encode_one = fns.obs_fn
    if partial_obs_view is not None:
        encode_one = make_ctf_partial_encode(cfg, partial_obs_view)
        step_batch = _swap_obs(step_batch, encode_one)

    return BatchedEnv(
        reset_one=fns.reset_fn,
        step_one=step_one,
        encode_one=encode_one,
        num_envs=num_envs,
        auto_reset=auto_reset,
        step_batch=step_batch,
        num_actions=5,
        actions_shape=(cfg.num_blue_agents,),
    )


def make_maze_batch(
    cfg,
    num_envs: int,
    auto_reset: bool = True,
    use_pallas: bool = False,
    partial_obs_view: int | None = None,
) -> BatchedEnv:
    """partial_obs_view=V swaps the configured observation for the batched
    agent-FOV pipeline: per-env observations become (1, V, V, 3) uint8."""
    from gym_multigrid_tpu.envs.maze import (
        make_maze,
        make_maze_partial_encode,
        make_maze_step_batch,
    )

    fns = make_maze(cfg)

    def step_one(state, action):
        return fns.step_fn(state, action.reshape(()))

    step_batch = make_maze_step_batch(cfg, use_pallas=use_pallas)
    encode_one = fns.obs_fn
    if partial_obs_view is not None:
        encode_one = make_maze_partial_encode(cfg, partial_obs_view)
        step_batch = _swap_obs(step_batch, encode_one)

    return BatchedEnv(
        reset_one=fns.reset_fn,
        step_one=step_one,
        encode_one=encode_one,
        num_envs=num_envs,
        auto_reset=auto_reset,
        step_batch=step_batch,
        num_actions=5,
        actions_shape=(),
    )


def make_wildfire_batch(
    cfg,
    num_envs: int,
    auto_reset: bool = True,
    use_pallas: bool = False,
    partial_obs_view: int | None = None,
) -> BatchedEnv:
    """partial_obs_view=V swaps the full-grid encode for the batched
    agent-FOV pipeline: per-env observations become
    (n_agents, V, V, 3) uint8."""
    from gym_multigrid_tpu.envs.wildfire import (
        make_wildfire,
        make_wildfire_partial_encode,
        make_wildfire_step_batch,
    )

    fns = make_wildfire(cfg)
    # The whole-batch step (shared slab math; optional fused kernel) beats
    # vmap(step_one): the spread stencil batches into one MXU matmul.
    step_batch = make_wildfire_step_batch(cfg, use_pallas=use_pallas)
    encode_one = fns.encode_fn
    if partial_obs_view is not None:
        encode_one = make_wildfire_partial_encode(cfg, partial_obs_view)
        step_batch = _swap_obs(step_batch, encode_one)

    return BatchedEnv(
        reset_one=fns.reset_fn,
        step_one=fns.step_fn,
        encode_one=encode_one,
        num_envs=num_envs,
        auto_reset=auto_reset,
        step_batch=step_batch,
        num_actions=5,
        actions_shape=(cfg.num_agents,),
    )
