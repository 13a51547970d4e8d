"""Learning regressions: the PPO stack must actually improve a policy
(VERDICT round 1, missing item 2), and training metrics must persist.

The fast default test trains Collect (dense pickup reward) on CPU; the
CtF MvN proof runs at scale on TPU via scripts/train_mvn_ctf_rl.py with
its learning curve committed under artifacts/ (set RUN_SLOW_TESTS=1 to
also train CtF in-suite).
"""

import os

import numpy as np
import jax
import pytest

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.parallel.vector import make_collect_batch, make_ctf_batch
from gym_multigrid_tpu.rl.networks import ActorCritic
from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo


def _train(env, net, ppo_cfg, iters, seed=0):
    init_fn, train_step = make_ppo(env, net, ppo_cfg)
    params, opt_state, states = init_fn(jax.random.PRNGKey(seed))
    step = jax.jit(train_step, donate_argnums=(1, 2))
    key = jax.random.PRNGKey(seed + 1)
    history = []
    for _ in range(iters):
        params, opt_state, states, key, metrics = step(
            params, opt_state, states, key
        )
        history.append(
            {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
        )
    return params, history


def test_ppo_learns_collect():
    """Mean reward/step over the last quarter of training must beat the
    first iterations by a clear margin — random play picks balls rarely;
    a learning policy seeks them out."""
    cfg = CollectConfig(layout="quadrants", respawn=False, max_steps=30)
    env = make_collect_batch(cfg, 64)
    net = ActorCritic(num_actions=4, num_agents=2, hidden=(64, 64))
    ppo_cfg = PPOConfig(
        rollout_len=16, num_epochs=2, num_minibatches=4, lr=1e-3
    )
    _, hist = _train(env, net, ppo_cfg, iters=60)

    early = np.mean([h["reward_per_step"] for h in hist[:5]])
    late = np.mean([h["reward_per_step"] for h in hist[-15:]])
    assert late > early * 1.3, (early, late)
    # Episode-return accounting flows through training metrics too.
    assert hist[-1]["episodes"] > 0
    assert np.isfinite(hist[-1]["ep_return_mean"])


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="CtF CPU training is minutes-long; covered by the TPU artifact "
    "run (artifacts/ctf_train) — set RUN_SLOW_TESTS=1 to run here",
)
def test_ppo_learns_ctf_mvn():
    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec

    cfg = CtfConfig.from_map_path(
        "tests/assets/board.txt",
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
        observation_option="flattened",
    )
    env = make_ctf_batch(cfg, 64)
    net = ActorCritic(num_actions=5, num_agents=2, hidden=(128, 128))
    ppo_cfg = PPOConfig(
        rollout_len=32, num_epochs=2, num_minibatches=4, lr=5e-4
    )
    _, hist = _train(env, net, ppo_cfg, iters=200)
    early = np.mean([h["ep_return_mean"] for h in hist[1:10]])
    late = np.mean([h["ep_return_mean"] for h in hist[-30:]])
    assert late > early + 0.3, (early, late)


@pytest.mark.parametrize(
    "path,margin",
    [
        ("artifacts/ctf_train/logs/metrics.csv", 0.3),
        ("artifacts/ctf_train_phase2/logs/metrics.csv", 0.15),
        ("artifacts/wildfire_train/logs/wildfire/metrics.csv", 1.0),
    ],
)
def test_training_curve_artifact_shows_learning(path, margin):
    """Every committed TPU training run's curve must show the learner
    beating its starting episode return by a clear margin."""
    if not os.path.exists(path):
        pytest.skip("training artifact not yet generated")
    from gym_multigrid_tpu.utils.logging import read_metrics_csv

    m = read_metrics_csv(path)
    ep = [v for v in m.get("ep_return_mean", []) if np.isfinite(v)]
    if len(ep) < 50:
        pytest.skip("training artifact incomplete (run in progress?)")
    early = np.mean(ep[1:10])
    late = np.mean(ep[-len(ep) // 4 :])
    assert late > early + margin, (early, late)


def test_metrics_logger_roundtrip(tmp_path):
    from gym_multigrid_tpu.utils.logging import MetricsLogger, read_metrics_csv

    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    for i in range(4):
        logger.log(i, {"a": i * 1.5, "b": -i})
    logger.close()
    m = read_metrics_csv(str(tmp_path / "metrics.csv"))
    assert m["step"] == [0.0, 1.0, 2.0, 3.0]
    assert m["a"] == [0.0, 1.5, 3.0, 4.5]
    assert m["b"][3] == -3.0


def test_metrics_logger_resume_continues_step_axis(tmp_path):
    """Appending to an existing metrics.csv adopts its header, reports
    last_step for resume offsets, and warns on unknown keys instead of
    misaligning rows."""
    import warnings

    from gym_multigrid_tpu.utils.logging import MetricsLogger, read_metrics_csv

    l1 = MetricsLogger(str(tmp_path), use_tensorboard=False)
    assert l1.last_step == -1
    for i in range(3):
        l1.log(i, {"a": float(i), "b": 0.0})
    l1.close()

    l2 = MetricsLogger(str(tmp_path), use_tensorboard=False)
    assert l2.last_step == 2
    l2.log(3, {"a": 3.0, "b": 1.0})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        l2.log(4, {"a": 4.0, "b": 1.0, "new_key": 9.0})
    assert any("new_key" in str(x.message) for x in w)
    l2.close()

    m = read_metrics_csv(str(tmp_path / "metrics.csv"))
    assert m["step"] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert m["a"] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert "new_key" not in m


def test_train_loop_resume_semantics(tmp_path):
    """The shared trainer couples model resume to the metrics step axis,
    guards batch-size mismatches, and wraps legacy snapshots."""
    import jax
    import jax.numpy as jnp

    from gym_multigrid_tpu.rl.ppo import RolloutCarry
    from gym_multigrid_tpu.rl.trainer import resume_or_init, train_loop
    from gym_multigrid_tpu.utils.checkpoint import save_pytree
    from gym_multigrid_tpu.utils.logging import read_metrics_csv

    cfg = CollectConfig(layout="quadrants", max_steps=10)
    env = make_collect_batch(cfg, 8)
    net = ActorCritic(num_actions=4, num_agents=2, hidden=(16, 16))
    ppo_cfg = PPOConfig(rollout_len=4, num_minibatches=1)

    out = str(tmp_path)
    train_loop(env, net, ppo_cfg, iters=2, out=out, model_name="m",
               use_tensorboard=False)
    # resumed run continues the step axis
    train_loop(env, net, ppo_cfg, iters=2, out=out, model_name="m",
               use_tensorboard=False)
    m = read_metrics_csv(os.path.join(out, "logs", "metrics.csv"))
    assert m["step"] == [0.0, 1.0, 2.0, 3.0]

    # batch-size mismatch degrades to params-only (fresh env states)
    from gym_multigrid_tpu.rl.ppo import make_ppo

    env16 = make_collect_batch(cfg, 16)
    init16, _ = make_ppo(env16, net, ppo_cfg)
    p, o, s, k, resumed = resume_or_init(
        init16, os.path.join(out, "models", "m"), 16
    )
    assert resumed
    assert jax.tree_util.tree_leaves(s.env)[0].shape[0] == 16  # fresh

    # legacy raw env-states snapshot wraps into RolloutCarry
    init8, _ = make_ppo(env, net, ppo_cfg)
    p8, o8, s8 = init8(jax.random.PRNGKey(0))
    save_pytree(
        os.path.join(out, "models", "legacy"),
        {"params": p8, "opt_state": o8, "states": s8.env,
         "key": jax.random.PRNGKey(2)},
    )
    _, _, s_l, _, resumed = resume_or_init(
        init8, os.path.join(out, "models", "legacy"), 8
    )
    assert resumed and isinstance(s_l, RolloutCarry)

    # fresh model + stale logs: the whole log dir rotates aside (CSV and
    # any TB event files together, so curves never interleave two runs)
    os.remove(os.path.join(out, "models", "m.npz"))
    train_loop(env, net, ppo_cfg, iters=1, out=out, model_name="m",
               use_tensorboard=False)
    m2 = read_metrics_csv(os.path.join(out, "logs", "metrics.csv"))
    assert m2["step"] == [0.0]
    assert os.path.exists(os.path.join(out, "logs.old1", "metrics.csv"))


def test_train_loop_iters_per_call_equivalence(tmp_path):
    """Scanning K iterations per jitted dispatch must be bit-identical to
    K single-iteration dispatches: same RNG threading, same final params,
    same per-iteration metric rows on the same step axis."""
    from gym_multigrid_tpu.rl.trainer import train_loop
    from gym_multigrid_tpu.utils.logging import read_metrics_csv

    cfg = CollectConfig(layout="quadrants", max_steps=10)
    env = make_collect_batch(cfg, 8)
    net = ActorCritic(num_actions=4, num_agents=2, hidden=(16, 16))
    ppo_cfg = PPOConfig(rollout_len=4, num_minibatches=1)

    out1, out3 = str(tmp_path / "one"), str(tmp_path / "three")
    p1, _, _, _, m1 = train_loop(
        env, net, ppo_cfg, iters=5, out=out1, model_name="m",
        use_tensorboard=False,
    )
    # 5 iters at 3/call = one chunk of 3 + a trailing partial chunk of 2.
    p3, _, _, _, m3 = train_loop(
        env, net, ppo_cfg, iters=5, out=out3, model_name="m",
        use_tensorboard=False, iters_per_call=3,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p3)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m3["loss"])
    r1 = read_metrics_csv(os.path.join(out1, "logs", "metrics.csv"))
    r3 = read_metrics_csv(os.path.join(out3, "logs", "metrics.csv"))
    assert r1["step"] == r3["step"] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert r1["loss"] == pytest.approx(r3["loss"], abs=0)
