"""shard_map rollout: explicit SPMD over the env-batch axis.

GSPMD sharding annotations (parallel/mesh.py) already scale the jitted
rollout across a mesh; this module is the *explicit-collective* form
(SURVEY.md §2.4 P3): the rollout body runs per shard under
``jax.shard_map``, per-shard RNG derives via ``fold_in(axis_index)``, and
episode metrics reduce with ``psum`` over ICI.  Use it when you want manual
control over what crosses the interconnect (the per-step env math is
embarrassingly parallel — only the scalar metric reductions communicate).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gym_multigrid_tpu.parallel.vector import BatchedEnv


def sharded_rollout(
    env: BatchedEnv,
    mesh: Mesh,
    axis: str = "data",
    num_actions: int | None = None,
    actions_shape: tuple[int, ...] | None = None,
) -> Callable:
    """Build rollout_fn(states, key, num_steps) running under shard_map.

    ``states`` must be sharded over ``axis`` on its leading dim (see
    mesh.shard_batch_tree); ``key`` is replicated — each shard folds in its
    axis index so streams are independent.  Returns (states', metrics) with
    metrics psum-reduced across shards (identical on every shard).
    """
    num_actions = env.num_actions if num_actions is None else num_actions
    actions_shape = (
        env.actions_shape if actions_shape is None else actions_shape
    )
    n_shards = mesh.shape[axis]
    assert env.num_envs % n_shards == 0
    local_envs = env.num_envs // n_shards
    local_env = BatchedEnv(
        reset_one=env.reset_one,
        step_one=env.step_one,
        encode_one=env.encode_one,
        num_envs=local_envs,
        auto_reset=env.auto_reset,
        step_batch=env.step_batch,
        num_actions=num_actions,
        actions_shape=actions_shape,
    )

    def rollout_fn(states, key, num_steps: int):
        def body(states, key):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            states, metrics = local_env.rollout(
                states,
                key,
                num_steps,
                num_actions=num_actions,
                actions_shape=actions_shape,
            )
            # Cross-shard scalar reductions ride the interconnect; the env
            # math itself never communicates.  The per-env running-return
            # accumulator stays shard-local (batch-sharded like states).
            run_return = metrics.pop("run_return")
            metrics = {k: jax.lax.psum(v, axis) for k, v in metrics.items()}
            return states, metrics, run_return

        state_spec = jax.tree_util.tree_map(lambda _: P(axis), states)
        states, metrics, run_return = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(state_spec, P()),
            out_specs=(state_spec, P(), P(axis)),
            check_vma=False,
        )(states, key)
        return states, dict(metrics, run_return=run_return)

    return rollout_fn


def sharded_episode_rollout(
    rollout_fn: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """shard_map wrapper for the multi-step episode rollouts
    (``ops/pallas_*.make_*_episode_rollout``).

    ``rollout_fn(states, key, num_steps) -> (states', metrics)`` is
    shape-polymorphic in the batch dim, so each shard runs it on its
    slice of the batch-sharded ``states`` with an independent fold_in
    RNG stream; scalar metrics psum across shards (identical on every
    shard), per-env leaves (``run_return``) stay shard-local.  This is
    the pod configuration of the headline xla-ms paths: deep-unroll
    episode math per chip, only the metric reductions on the
    interconnect.
    """

    def wrapped(states, key, num_steps: int):
        # Metric pytree structure (for out_specs) without running anything.
        _, m_shapes = jax.eval_shape(
            lambda s, k: rollout_fn(s, k, num_steps), states, key
        )
        m_spec = jax.tree_util.tree_map(
            lambda v: P() if v.ndim == 0 else P(axis), m_shapes
        )

        def body(s, k):
            k = jax.random.fold_in(k, jax.lax.axis_index(axis))
            s, m = rollout_fn(s, k, num_steps)
            m = jax.tree_util.tree_map(
                lambda v: jax.lax.psum(v, axis) if v.ndim == 0 else v, m
            )
            return s, m

        state_spec = jax.tree_util.tree_map(lambda _: P(axis), states)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(state_spec, P()),
            out_specs=(state_spec, m_spec),
            check_vma=False,
        )(states, key)

    return wrapped
