"""Evaluation layer tests (gym_multigrid_tpu/rl/evaluate.py).

The reference has no evaluation tooling at all — its training script rolls
one episode for a gif (reference scripts/main_mvn_ctf_rl.py:39-52).  These
pin the batched evaluator: episode accounting, CtF outcome classification
(wins + losses + draws must partition completed episodes), determinism of
greedy eval, and checkpoint-layout handling.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gym_multigrid_tpu.rl.evaluate import (
    evaluate,
    evaluate_ctf,
    load_params,
    make_policy,
)
from gym_multigrid_tpu.rl.families import make_family_batch
from gym_multigrid_tpu.rl.networks import ActorCritic

BOARD = os.path.join(os.path.dirname(__file__), "assets", "board.txt")


def _init_params(env, net, seed=0):
    _, obs = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    return net.init(jax.random.PRNGKey(seed + 1), obs[:1])


def _small_ctf_cfg(max_steps=20):
    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec

    return CtfConfig.from_map_path(
        BOARD,
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
        observation_option="flattened",
        max_steps=max_steps,
    )


def test_evaluate_generic_counts_episodes():
    env, cfg, num_actions, agents = make_family_batch("collect", 8)
    net = ActorCritic(num_actions=num_actions, num_agents=agents, hidden=(16,))
    params = _init_params(env, net)
    # max_steps=50: every env truncates at least once within 55 steps.
    res = evaluate(env, net, params, jax.random.PRNGKey(2), 55)
    assert res["episodes"] >= 8
    assert np.isfinite(res["ep_return_mean"])
    assert np.isfinite(res["reward_per_step"])


def test_evaluate_ctf_outcomes_partition_episodes():
    cfg = _small_ctf_cfg(max_steps=20)
    from gym_multigrid_tpu.parallel.vector import make_ctf_batch

    env = make_ctf_batch(cfg, 8)
    net = ActorCritic(num_actions=5, num_agents=2, hidden=(16,))
    params = _init_params(env, net)
    res = evaluate_ctf(
        cfg, 8, net, params, jax.random.PRNGKey(3), 25, deterministic=False
    )
    assert res["episodes"] >= 8
    assert res["wins"] + res["losses"] + res["draws"] == res["episodes"]
    for k in ("win_rate", "loss_rate", "draw_rate"):
        assert 0.0 <= res[k] <= 1.0
    assert 0 < res["ep_len_mean"] <= 20
    assert np.isfinite(res["ep_return_mean"])


def test_evaluate_greedy_is_deterministic():
    cfg = _small_ctf_cfg(max_steps=10)
    net = ActorCritic(num_actions=5, num_agents=2, hidden=(16,))
    from gym_multigrid_tpu.parallel.vector import make_ctf_batch

    env = make_ctf_batch(cfg, 4)
    params = _init_params(env, net)
    a = evaluate_ctf(cfg, 4, net, params, jax.random.PRNGKey(7), 12)
    b = evaluate_ctf(cfg, 4, net, params, jax.random.PRNGKey(7), 12)
    assert a == b


def test_make_policy_shapes_and_greedy_mode():
    env, cfg, num_actions, agents = make_family_batch("collect", 4)
    net = ActorCritic(num_actions=num_actions, num_agents=agents, hidden=(16,))
    params = _init_params(env, net)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    greedy = make_policy(env, net)(params, jax.random.PRNGKey(1), states)
    assert greedy.shape == (4, agents) and greedy.dtype == jnp.int32
    # Greedy actions are the logits' argmax.
    logits, _ = net.apply(params, obs)
    assert (greedy == jnp.argmax(logits, axis=-1)).all()


def test_load_params_both_snapshot_layouts(tmp_path):
    from gym_multigrid_tpu.utils.checkpoint import load_pytree, save_pytree

    env, cfg, num_actions, agents = make_family_batch("collect", 4)
    net = ActorCritic(num_actions=num_actions, num_agents=agents, hidden=(16,))
    params = _init_params(env, net)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))

    full = os.path.join(tmp_path, "full")
    save_pytree(full, {
        "params": params,
        "opt_state": {"m": jnp.zeros(3)},
        "states": states,
        "key": jax.random.PRNGKey(0),
    })
    bare = os.path.join(tmp_path, "bare")
    save_pytree(bare, params)

    for path in (full, bare):
        loaded = load_params(path)
        for x, y in zip(
            jax.tree_util.tree_leaves(loaded),
            jax.tree_util.tree_leaves(params),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
