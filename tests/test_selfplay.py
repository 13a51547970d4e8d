"""Self-play PPO on CtF (rl/selfplay.py): both teams learned.

The reference can only train against its scripted heuristics; this is the
adversarial extension the functional core's step_actions_fn enables."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
from gym_multigrid_tpu.rl.ppo import PPOConfig
from gym_multigrid_tpu.rl.selfplay import (
    make_ctf_selfplay_batch,
    make_selfplay_ppo,
)

MAP = os.path.join(os.path.dirname(__file__), "assets/board.txt")


def _cfg():
    return CtfConfig.from_map_path(
        MAP,
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
        observation_option="flattened",
    )


def _setup(num_envs=8, **ppo_kwargs):
    cfg = _cfg()
    env = make_ctf_selfplay_batch(cfg, num_envs)
    ppo_cfg = PPOConfig(rollout_len=8, **ppo_kwargs)
    init_fn, train_step, nets = make_selfplay_ppo(
        env, cfg, ppo_cfg, hidden=(32, 32)
    )
    return env, cfg, init_fn, train_step


def _delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        )
    )


def test_selfplay_env_steps_all_agents():
    cfg = _cfg()
    env = make_ctf_selfplay_batch(cfg, 4)
    states, obs = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.randint(jax.random.PRNGKey(1), (4, 4), 0, 5)
    states2, obs2, rew, term, trunc = env.step(states, acts)
    assert obs2.shape == obs.shape
    assert rew.shape == (4,)
    # red agents actually moved under external control at least somewhere
    # over a few steps
    moved_red = False
    for i in range(5):
        acts = jax.random.randint(jax.random.PRNGKey(2 + i), (4, 4), 0, 5)
        nxt, *_ = env.step(states2, acts)
        moved_red = moved_red or bool(
            jnp.any(nxt.pos[:, cfg.num_blue_agents:, :]
                    != states2.pos[:, cfg.num_blue_agents:, :])
        )
        states2 = nxt
    assert moved_red


def test_selfplay_train_step_updates_both_sides():
    env, cfg, init_fn, train_step = _setup(num_epochs=1, num_minibatches=2)
    sp = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    sp2, key, metrics = step(sp, jax.random.PRNGKey(1))
    for k in ("blue_loss", "red_loss", "blue_entropy", "red_entropy",
              "ep_return_mean"):
        assert np.isfinite(float(metrics[k])), k
    assert _delta(sp.blue_params, sp2.blue_params) > 0
    assert _delta(sp.red_params, sp2.red_params) > 0
    # adversarial objective: red's rollout reward is minus blue's
    assert float(metrics["red_reward_per_step"]) == pytest.approx(
        -float(metrics["blue_reward_per_step"]), abs=1e-6
    )


def test_selfplay_deterministic():
    env, cfg, init_fn, train_step = _setup(num_epochs=1, num_minibatches=2)
    sp = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    a, _, ma = step(sp, jax.random.PRNGKey(1))
    b, _, mb = step(sp, jax.random.PRNGKey(1))
    assert _delta(a.blue_params, b.blue_params) == 0
    assert float(ma["blue_loss"]) == float(mb["blue_loss"])
