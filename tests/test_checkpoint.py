"""Checkpoint/resume: a snapshot of the env-state pytree resumes a rollout
bit-exactly (SURVEY.md §5 — absent upstream, trivial by construction here)."""

import numpy as np
import jax

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.parallel.vector import make_collect_batch
from gym_multigrid_tpu.utils.checkpoint import load_pytree, save_pytree


def test_env_state_checkpoint_resume(tmp_path):
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    env = make_collect_batch(cfg, num_envs=8)
    states, _ = env.reset(jax.random.PRNGKey(0))
    states, _ = env.rollout(
        states, jax.random.PRNGKey(1), 10, num_actions=4, actions_shape=(2,)
    )

    path = str(tmp_path / "snap")
    save_pytree(path, states)
    restored = load_pytree(path)

    # Continue both from the snapshot: must be bit-identical.
    a, ma = env.rollout(
        states, jax.random.PRNGKey(2), 10, num_actions=4, actions_shape=(2,)
    )
    b, mb = env.rollout(
        restored, jax.random.PRNGKey(2), 10, num_actions=4, actions_shape=(2,)
    )
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert float(ma["reward_sum"]) == float(mb["reward_sum"])


def test_params_checkpoint_roundtrip(tmp_path):
    tree = {
        "w": np.arange(12, dtype=np.float32).reshape(3, 4),
        "nested": [np.ones(3), {"b": np.int32(7)}],
    }
    path = str(tmp_path / "params")
    save_pytree(path, tree)
    out = load_pytree(path)
    np.testing.assert_array_equal(out["w"], tree["w"])
    np.testing.assert_array_equal(out["nested"][0], tree["nested"][0])
    assert int(out["nested"][1]["b"]) == 7
