"""Mechanical proof of the weak-scaling claim: collective inventory of the
compiled sharded programs (VERDICT r2 item 2; SURVEY.md §5 distributed
backend row).

The >=90% weak-scaling target is supportable only if the env math never
communicates: the rollout's HLO must contain nothing but scalar metric
psums, and the dp train step nothing but param-sized gradient all-reduces.
These tests compile the real programs for the 8-device mesh and assert
exactly that — plus a canary proving the audit has teeth (the dp_shards=1
global shuffle measurably all-gathers the rollout buffer).
"""

import jax
import numpy as np
import pytest

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.parallel.comm_audit import audit_jitted
from gym_multigrid_tpu.parallel.mesh import (
    batch_tree_shardings,
    make_mesh,
    opt_tp_shardings,
    param_tp_shardings,
    replicated,
)
from gym_multigrid_tpu.parallel.shard import sharded_rollout
from gym_multigrid_tpu.parallel.vector import make_collect_batch
from gym_multigrid_tpu.rl.networks import ActorCritic
from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo

NUM_ENVS = 64
ROLLOUT_LEN = 8


def _build(dp_shards: int):
    mesh = make_mesh(8, model_parallel=1)
    cfg = CollectConfig(
        layout="quadrants_respawn", respawn=True, max_steps=50
    )
    env = make_collect_batch(cfg, num_envs=NUM_ENVS)
    net = ActorCritic(num_actions=4, num_agents=cfg.num_agents)
    init_fn, train_step = make_ppo(
        env,
        net,
        PPOConfig(
            rollout_len=ROLLOUT_LEN,
            num_epochs=2,
            num_minibatches=2,
            dp_shards=dp_shards,
        ),
    )
    params, opt_state, states = jax.jit(init_fn)(jax.random.PRNGKey(0))
    shardings = (
        param_tp_shardings(params, mesh),
        opt_tp_shardings(opt_state, mesh),
        batch_tree_shardings(states, mesh),
        replicated(mesh),
    )
    return mesh, env, net, train_step, (
        params, opt_state, states, jax.random.PRNGKey(1)
    ), shardings


def _param_bytes(params):
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )


def test_sharded_rollout_collectives_are_scalar_psums_only():
    """The env math is embarrassingly parallel: the explicit shard_map
    rollout's ONLY collectives are the scalar episode-metric psums."""
    mesh, env, *_ = _build(dp_shards=8)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    states = jax.device_put(states, batch_tree_shardings(states, mesh))
    rollout = sharded_rollout(env, mesh)
    ops, _ = audit_jitted(
        lambda s, k: rollout(s, k, ROLLOUT_LEN),
        (states, jax.random.PRNGKey(2)),
    )
    assert ops, "expected the metric psums to be present"
    assert all(o.kind == "all-reduce" for o in ops), [o.kind for o in ops]
    # Every operand is a scalar: zero bytes of env state on the wire.
    assert all(o.max_elems <= 1 for o in ops), [
        (o.kind, o.shapes) for o in ops
    ]


def test_dp_train_step_all_reduces_are_param_sized():
    """The full PPO train step (rollout + GAE + minibatched update) with
    the shard-local shuffle: all-reduce ONLY (grad + scalar metrics), the
    largest operand bounded by the parameter tree — never the (T, B, ...)
    rollout buffer."""
    mesh, env, net, train_step, args, shardings = _build(dp_shards=8)
    ops, _ = audit_jitted(train_step, args, in_shardings=shardings)
    assert ops
    kinds = {o.kind for o in ops}
    assert kinds == {"all-reduce"}, kinds
    pbytes = _param_bytes(args[0])
    biggest = max(o.bytes for o in ops)
    assert biggest <= pbytes, (
        f"largest all-reduce {biggest}B exceeds param tree {pbytes}B — "
        "something batch-sized is crossing the interconnect"
    )
    # Observations NEVER cross the interconnect: no u8 operand anywhere.
    assert all(dt != "u8" for o in ops for dt, _ in o.shapes), [
        o.shapes for o in ops
    ]


def test_global_shuffle_canary_moves_the_buffer():
    """Audit sanity: with dp_shards=1 (global SB3 shuffle) the compiler
    must move rollout-buffer data across shards — as a full all-gather or
    as minibatch-sized sparse-gather psums (XLA picks either depending on
    layout) — proving the audit would catch the regression the shard-local
    shuffle exists to prevent."""
    mesh, env, net, train_step, args, shardings = _build(dp_shards=1)
    ops, _ = audit_jitted(train_step, args, in_shardings=shardings)
    mb = ROLLOUT_LEN * NUM_ENVS // 2  # num_minibatches=2
    moved = [
        o
        for o in ops
        if o.kind != "all-reduce"
        or any(dt == "u8" for dt, _ in o.shapes)
    ]
    assert moved, "expected observation data on the wire at dp_shards=1"
    assert max(o.max_elems for o in moved) >= mb * 300  # (mb, 10*10*3) obs
