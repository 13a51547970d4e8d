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
    make_league_ppo,
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


def _league_setup(num_envs=8, pool_size=3, league_fraction=0.5,
                  **ppo_kwargs):
    cfg = _cfg()
    env = make_ctf_selfplay_batch(cfg, num_envs)
    ppo_cfg = PPOConfig(rollout_len=8, **ppo_kwargs)
    return cfg, env, make_league_ppo(
        env, cfg, ppo_cfg, pool_size=pool_size,
        league_fraction=league_fraction, hidden=(32, 32),
    )


def test_league_train_step_and_snapshot():
    cfg, env, (init_fn, train_step, snapshot_fn, nets) = _league_setup(
        num_epochs=1, num_minibatches=2
    )
    ls = init_fn(jax.random.PRNGKey(0))
    assert int(ls.filled) == 1
    step = jax.jit(train_step)
    ls2, key, m = step(ls, jax.random.PRNGKey(1))
    for k in ("blue_loss", "red_loss", "blue_reward_selfplay",
              "blue_reward_league", "league_opponent"):
        assert np.isfinite(float(m[k])), k
    # both sides updated; pool untouched by a plain train step
    assert _delta(ls.sp.blue_params, ls2.sp.blue_params) > 0
    assert _delta(ls.sp.red_params, ls2.sp.red_params) > 0
    assert _delta(ls.pool, ls2.pool) == 0
    # snapshot writes the live red into the ring slot and advances it
    ls3 = jax.jit(snapshot_fn)(ls2)
    assert int(ls3.filled) == 2
    assert int(ls3.slot) == 2 % 3
    written = jax.tree_util.tree_map(lambda x: x[1], ls3.pool)
    assert _delta(written, ls2.sp.red_params) == 0


def test_league_red_trains_only_on_selfplay_slice():
    # changing ONLY the pool opponent must not change red's update (red
    # trains on the self-play slice; per-env transitions are independent)
    cfg, env, (init_fn, train_step, snapshot_fn, nets) = _league_setup(
        num_epochs=1, num_minibatches=2
    )
    ls = init_fn(jax.random.PRNGKey(0))
    perturbed = ls._replace(
        pool=jax.tree_util.tree_map(lambda x: x + 0.05, ls.pool)
    )
    step = jax.jit(train_step)
    a, _, ma = step(ls, jax.random.PRNGKey(1))
    b, _, mb = step(perturbed, jax.random.PRNGKey(1))
    assert _delta(a.sp.red_params, b.sp.red_params) == 0
    assert float(ma["red_loss"]) == float(mb["red_loss"])
    # ...while the league slice DID see a different opponent
    assert float(ma["blue_reward_league"]) != pytest.approx(
        float(mb["blue_reward_league"])
    ) or _delta(a.sp.blue_params, b.sp.blue_params) > 0


def test_evaluate_ctf_match_outcomes():
    from gym_multigrid_tpu.rl.evaluate import evaluate_ctf_match
    from gym_multigrid_tpu.rl.networks import ActorCritic

    cfg = _cfg()
    env = make_ctf_selfplay_batch(cfg, 4)
    _, obs = env.reset(jax.random.PRNGKey(0))
    net = ActorCritic(num_actions=5, num_agents=2, hidden=(16, 16))
    bp = net.init(jax.random.PRNGKey(1), obs[:1])
    rp = net.init(jax.random.PRNGKey(2), obs[:1])
    r = evaluate_ctf_match(cfg, 16, net, bp, net, rp,
                           jax.random.PRNGKey(3), 150,
                           deterministic=False)
    assert r["episodes"] > 0
    assert r["wins"] + r["losses"] + r["draws"] == r["episodes"]
    assert 0.0 <= r["win_rate"] <= 1.0
    assert np.isfinite(r["ep_return_mean"])


def test_selfplay_train_step_sharded_over_mesh():
    """The self-play train step runs with the env batch sharded over the
    'data' axis of an 8-device mesh (params/opt replicated) — the same
    GSPMD pattern as the single-sided learner in __graft_entry__."""
    from gym_multigrid_tpu.parallel.mesh import (
        batch_tree_shardings,
        make_mesh,
        replicated,
    )
    from gym_multigrid_tpu.rl.selfplay import SelfPlayState

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_parallel=1)
    env, cfg, init_fn, train_step = _setup(
        num_envs=16, num_epochs=1, num_minibatches=2
    )
    sp = init_fn(jax.random.PRNGKey(0))
    rep = replicated(mesh)
    sp_shard = SelfPlayState(
        blue_params=jax.tree_util.tree_map(lambda _: rep, sp.blue_params),
        red_params=jax.tree_util.tree_map(lambda _: rep, sp.red_params),
        blue_opt=jax.tree_util.tree_map(lambda _: rep, sp.blue_opt),
        red_opt=jax.tree_util.tree_map(lambda _: rep, sp.red_opt),
        states=batch_tree_shardings(sp.states, mesh),
    )
    sp = jax.device_put(sp, sp_shard)
    step = jax.jit(train_step, in_shardings=(sp_shard, rep))
    sp2, key, m = step(sp, jax.device_put(jax.random.PRNGKey(1), rep))
    assert np.isfinite(float(m["blue_loss"]))
    assert np.isfinite(float(m["red_loss"]))
    env_leaf = jax.tree_util.tree_leaves(sp2.states.env)[0]
    assert not env_leaf.sharding.is_fully_replicated


def test_league_validation():
    cfg = _cfg()
    env = make_ctf_selfplay_batch(cfg, 8)
    with pytest.raises(ValueError, match="league_fraction"):
        make_league_ppo(env, cfg, PPOConfig(rollout_len=8), pool_size=2,
                        league_fraction=1.0)
    with pytest.raises(ValueError, match="pool_size"):
        make_league_ppo(env, cfg, PPOConfig(rollout_len=8), pool_size=0)


def test_selfplay_1v1_variant():
    """Self-play composes with the 1v1 CtF variant unchanged (the
    factory only reads team sizes from the config)."""
    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec

    cfg = CtfConfig.from_map_path(
        MAP, num_blue_agents=1, num_red_agents=1, variant="1v1",
        enemy_policies=(PolicySpec("rw"),),
        observation_option="flattened",
    )
    env = make_ctf_selfplay_batch(cfg, 8)
    init_fn, train_step, nets = make_selfplay_ppo(
        env, cfg, PPOConfig(rollout_len=8, num_minibatches=2),
        hidden=(16, 16),
    )
    sp = init_fn(jax.random.PRNGKey(0))
    sp2, key, m = jax.jit(train_step)(sp, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["blue_loss"]))
    assert np.isfinite(float(m["red_loss"]))
    assert _delta(sp.blue_params, sp2.blue_params) > 0


def test_selfplay_obs_buffer_dtype_guard():
    """Self-play shares make_ppo's obs-store guards (rl/ppo.py
    make_obs_store): a non-integer buffer dtype fails at build time."""
    cfg = _cfg()
    env = make_ctf_selfplay_batch(cfg, 4)
    with pytest.raises(ValueError, match="integer dtype"):
        make_selfplay_ppo(
            env, cfg,
            PPOConfig(rollout_len=4, obs_buffer_dtype="float16"),
            hidden=(16, 16),
        )
