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
    env, agents = build_env(family, num_envs=4, use_pallas=False)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_leaves(states)[0].shape[0] == 4
    assert agents >= 1
