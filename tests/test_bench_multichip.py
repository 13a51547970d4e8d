"""The weak-scaling instrument must run on the virtual 8-device CPU mesh
(the exact path the driver would use on real multi-chip hardware)."""

import jax
import pytest

from bench_multichip import build_env, run_weak_scaling


def test_weak_scaling_instrument_runs_on_mesh():
    assert len(jax.devices()) >= 8
    results, eff = run_weak_scaling(
        family="collect",
        per_device_envs=32,
        steps=20,
        reps=1,
        points=[1, 4],
        verbose=False,
    )
    assert set(results) == {1, 4}
    for n, r in results.items():
        assert r["envs"] == 32 * n
        assert r["agent_steps_per_sec"] > 0
        assert r["per_chip"] > 0
    assert results[1]["efficiency"] == 1.0
    assert eff == results[4]["efficiency"] > 0


@pytest.mark.parametrize("family", ["collect", "ctf", "maze", "wildfire"])
def test_build_env_every_family(family):
    env, cfg, agents = build_env(family, num_envs=4, use_pallas=False)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_leaves(states)[0].shape[0] == 4
    assert agents >= 1


def test_weak_scaling_xla_ms_path_on_mesh():
    # The headline deep-unroll episode math, sharded per device — the pod
    # configuration of the xla-ms paths (sharded_episode_rollout).
    # Wildfire's shallow 8-step chunk keeps the CPU compile cheap.
    results, eff = run_weak_scaling(
        family="wildfire",
        per_device_envs=16,
        steps=8,
        reps=1,
        points=[1, 2],
        verbose=False,
        path="xla-ms",
    )
    assert results[2]["envs"] == 32 and eff > 0


def test_sharded_episode_rollout_metrics_replicated():
    # Scalar metrics psum to identical values on every shard; per-env
    # leaves stay batch-sharded; same key => same result (determinism).
    import numpy as np

    from gym_multigrid_tpu.envs.wildfire import WildfireConfig
    from gym_multigrid_tpu.ops.pallas_wildfire import (
        make_wildfire_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.mesh import make_mesh, shard_batch_tree
    from gym_multigrid_tpu.parallel.shard import sharded_episode_rollout
    from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

    cfg = WildfireConfig(size=8, max_steps=6)
    env = make_wildfire_batch(cfg, 32)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    mesh = make_mesh(4, model_parallel=1)
    states = shard_batch_tree(states, mesh)
    ro = make_wildfire_episode_rollout(cfg, chunk=3, use_kernel=False)
    sharded = sharded_episode_rollout(ro, mesh)
    run = jax.jit(lambda s, k: sharded(s, k, 6))
    s1, m1 = run(states, jax.random.PRNGKey(1))
    s2, m2 = run(states, jax.random.PRNGKey(1))
    assert m1["reward_sum"].shape == ()
    assert m1["run_return"].shape[0] == 32
    assert np.isfinite(float(m1["reward_sum"]))
    assert float(m1["reward_sum"]) == float(m2["reward_sum"])
    assert int(m1["episodes"]) > 0


def test_weak_scaling_ppo_train_path_on_mesh():
    # The FULL PPO train step sharded over the mesh — the weak-scaling
    # instrument for BASELINE's multi-host RL half.
    #
    # The efficiency band is a RELATIVE-timing measurement on a shared
    # host: a transient CPU-load spike during either timing window can
    # crater the ratio without any resharding bug (observed once when a
    # concurrent compile pinned the core).  Timing is therefore
    # RECORD-AND-WARN — the hard gates here are the semantic ones
    # (correct env counts, positive throughput, finite efficiency); a
    # determinism/semantics suite must stay green on a busy machine
    # (round-5 task 7).  Only a near-zero ratio — which no load spike
    # produces but a step-serializing resharding bug would approach —
    # hard-fails, and only after a confirming re-measure.
    import warnings

    last = None
    for attempt in range(2):
        results, eff = run_weak_scaling(
            family="collect",
            per_device_envs=16,
            steps=8,
            reps=1,
            points=[1, 2],
            verbose=False,
            path="ppo-train",
        )
        assert results[2]["envs"] == 32
        assert results[1]["agent_steps_per_sec"] > 0
        assert eff > 0
        last = eff
        if 0.2 < eff < 1.5:
            return
        warnings.warn(
            f"ppo-train weak-scaling efficiency {eff:.3f} outside the "
            "expected (0.2, 1.5) band — consistent with host CPU load, "
            "not treated as a failure (attempt "
            f"{attempt + 1}/2; see test docstring)",
            stacklevel=1,
        )
    # Generous hard floor: both measures near zero means the sharded
    # step effectively did not run in parallel at all.
    assert last > 0.02, (
        f"weak-scaling efficiency {last} near zero twice — not plausible "
        "as load noise; investigate resharding"
    )
