"""Wildfire family tests (new family — semantics fixed by the design note in
envs/wildfire.py; these are its specification tests)."""

import numpy as np
import gymnasium as gym
import jax
import jax.numpy as jnp
import pytest

import gym_multigrid_tpu  # noqa: F401
from gym_multigrid_tpu.envs.wildfire import (
    BURNT,
    FIRE,
    TREE,
    WildfireConfig,
    WildfireState,
    make_wildfire,
)


def _state(cells, pos, seed=0):
    cells = jnp.asarray(cells, dtype=jnp.int32)
    return WildfireState(
        cells=cells,
        agent_pos=jnp.asarray(pos, dtype=jnp.int32),
        step_count=jnp.int32(0),
        extinguished=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )


def test_wildfire_rollout():
    env = gym.make("multigrid-wildfire-v0")
    obs, info = env.reset(seed=0)
    assert obs.shape == (16, 16, 3) and obs.dtype == np.uint8
    assert info["burning"] >= 1
    total_r = 0.0
    for _ in range(120):
        obs, r, term, trunc, info = env.step(env.action_space.sample())
        total_r += float(np.sum(r))
        if term or trunc:
            break
    assert term or trunc
    if term:
        assert info["burning"] == 0
    env.unwrapped.render()


def test_extinguish_semantics():
    cfg = WildfireConfig(size=5, num_agents=1, agents_index=(4,), p_spread=0.0, p_burnout=0.0)
    fns = make_wildfire(cfg)
    cells = np.zeros((5, 5), dtype=int)
    cells[2, 3] = FIRE  # (y=2, x=3)
    st = _state(cells, [[2, 2]])  # agent at x=2, y=2
    # Move right onto the fire -> extinguished, +ext_reward.
    st2, obs, r, term, trunc, info = fns.step_fn(st, jnp.asarray([3]))
    assert np.asarray(st2.cells)[2, 3] == BURNT
    assert float(np.sum(r)) == pytest.approx(cfg.ext_reward)
    assert bool(term)  # no fire left
    assert int(info["extinguished"]) == 1


def test_spread_deterministic_limits():
    # p_spread=1: every tree adjacent to fire ignites; p_spread=0: none.
    for p, expect in [(1.0, FIRE), (0.0, TREE)]:
        cfg = WildfireConfig(size=5, num_agents=1, agents_index=(4,), p_spread=p, p_burnout=0.0)
        fns = make_wildfire(cfg)
        cells = np.full((5, 5), TREE, dtype=int)
        cells[2, 2] = FIRE
        st = _state(cells, [[0, 0]])
        st2, *_ = fns.step_fn(st, jnp.asarray([0]))
        c2 = np.asarray(st2.cells)
        for (y, x) in [(1, 2), (3, 2), (2, 1), (2, 3)]:
            assert c2[y, x] == expect, (p, y, x)
        # diagonal never ignites in one step
        assert c2[1, 1] == TREE
        # fire persists (no burnout)
        assert c2[2, 2] == FIRE


def test_no_toroidal_spread():
    cfg = WildfireConfig(size=4, num_agents=1, agents_index=(4,), p_spread=1.0, p_burnout=0.0)
    fns = make_wildfire(cfg)
    cells = np.full((4, 4), TREE, dtype=int)
    cells[0, 0] = FIRE
    st = _state(cells, [[2, 2]])
    st2, *_ = fns.step_fn(st, jnp.asarray([0]))
    c2 = np.asarray(st2.cells)
    # opposite edges must NOT ignite from wrap-around
    assert c2[3, 0] == TREE and c2[0, 3] == TREE
    assert c2[1, 0] == FIRE and c2[0, 1] == FIRE


def test_burnout():
    cfg = WildfireConfig(size=3, num_agents=1, agents_index=(4,), p_spread=0.0, p_burnout=1.0)
    fns = make_wildfire(cfg)
    cells = np.zeros((3, 3), dtype=int)
    cells[1, 1] = FIRE
    st = _state(cells, [[0, 0]])
    st2, obs, r, term, trunc, info = fns.step_fn(st, jnp.asarray([0]))
    assert np.asarray(st2.cells)[1, 1] == BURNT
    assert bool(term)


def test_agents_block_each_other():
    cfg = WildfireConfig(size=4, num_agents=2, agents_index=(4, 5), p_spread=0.0, p_burnout=0.0)
    fns = make_wildfire(cfg)
    st = _state(np.zeros((4, 4), dtype=int), [[1, 1], [2, 1]])
    st2, *_ = fns.step_fn(st, jnp.asarray([3, 0]))  # agent0 right into agent1
    np.testing.assert_array_equal(np.asarray(st2.pos if hasattr(st2,'pos') else st2.agent_pos)[0], [1, 1])


def test_config_validation_errors_early():
    # Bad configs must fail at construction with a readable message, not
    # deep inside tracing ("Need at least one array to concatenate").
    import pytest

    from gym_multigrid_tpu.envs.wildfire import WildfireConfig

    with pytest.raises(ValueError, match="num_agents"):
        WildfireConfig(num_agents=0)
    with pytest.raises(ValueError, match="p_spread"):
        WildfireConfig(p_spread=2.0)
    with pytest.raises(ValueError, match="num_initial_fires"):
        WildfireConfig(num_initial_fires=0)


def test_adapter_rejects_wrong_action_count():
    import gymnasium as gym
    import pytest

    import gym_multigrid_tpu

    gym_multigrid_tpu.register_envs()
    env = gym.make("multigrid-wildfire-v0").unwrapped
    env.reset(seed=0)
    with pytest.raises(ValueError, match="expected 2 actions"):
        env.step([1, 2, 3, 4])


def test_agents_index_length_validated():
    import pytest

    from gym_multigrid_tpu.envs.wildfire import WildfireConfig

    with pytest.raises(ValueError, match="agents_index"):
        WildfireConfig(num_agents=3)
    WildfireConfig(num_agents=3, agents_index=(1, 4, 5))


def test_compact_gate_rejects_unrepresentable_probabilities():
    """The u8-threshold compact path quantizes probabilities to 1/256.
    compact_supported must reject configs where a nonzero probability
    rounds to threshold 0 (the event would silently never fire) or
    lands more than 5% relative error away — those configs keep the
    distribution-exact in-loop form (ADVICE r4: p_burnout < 1/512
    previously slipped through the gate)."""
    from gym_multigrid_tpu.envs.wildfire import (
        _u8_threshold_ok,
        compact_supported,
        wf_tables,
    )

    # shipping defaults stay on the compact path
    assert compact_supported(wf_tables(WildfireConfig(size=16)))

    # tiny p_burnout: threshold rounds to 0 -> fires would never burn out
    t = wf_tables(WildfireConfig(size=16, p_burnout=0.001))
    assert t.burnout_u8 == 0
    assert not compact_supported(t)

    # representable but >5% relative error (p=0.005 -> T=1 = 1/256
    # = 0.0039, a 22% shift) is also rejected
    assert not _u8_threshold_ok(1, 0.005)
    assert not compact_supported(wf_tables(WildfireConfig(size=16, p_burnout=0.005)))

    # zero probabilities must stay exactly zero, not "representable"
    assert _u8_threshold_ok(0, 0.0)
    assert not _u8_threshold_ok(1, 0.0)


def test_tiny_burnout_runs_on_fallback_and_still_burns_out():
    """With p_burnout below u8 resolution the episode rollout must take
    the plain in-loop form, where burnout events still occur at the true
    probability (on the rejected compact form they would NEVER occur)."""
    from gym_multigrid_tpu.envs.wildfire import wf_tables, compact_supported
    from gym_multigrid_tpu.ops.pallas_wildfire import (
        make_wildfire_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

    cfg = WildfireConfig(size=8, max_steps=25, p_burnout=0.002)
    assert not compact_supported(wf_tables(cfg))
    rollout = make_wildfire_episode_rollout(
        cfg, use_kernel=False, rnd_mode="inloop"
    )
    env = make_wildfire_batch(cfg, 256)
    states, _ = env.reset(jax.random.PRNGKey(0))
    states, metrics = rollout(states, jax.random.PRNGKey(1), 100)
    assert np.isfinite(float(metrics["reward_sum"]))
    # Burnout flips fire -> burnt.  Expected burnt events over
    # 256 envs x 100 steps x ~2+ fires x p=0.002 is >~100; seeing at
    # least one burnt cell in the final boards is overwhelmingly likely
    # (P(none at the end) ~ 0) yet impossible if quantized to zero.
    assert int(jnp.sum(states.cells == BURNT)) > 0


def test_large_board_compact_uses_lane_shift_stencil():
    """Boards past the 24x24 gate run the compact path with the
    matmul-free lane-shift stencil (bit-identical integers to the
    adjacency matmul; the (C,C) matmul cost 25% of the work rate at
    32x32 — artifacts/board_scaling.md).  The rollout must still run and
    keep the fire/tree physics sane."""
    from gym_multigrid_tpu.ops.pallas_wildfire import (
        make_wildfire_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

    cfg = WildfireConfig(size=32, max_steps=20)
    env = make_wildfire_batch(cfg, 16)
    states, _ = env.reset(jax.random.PRNGKey(0))
    rollout = make_wildfire_episode_rollout(
        cfg, chunk=5, use_kernel=False, rnd_mode="inloop"
    )
    states, metrics = rollout(states, jax.random.PRNGKey(1), 20)
    assert np.isfinite(float(metrics["reward_sum"]))
    cells = np.asarray(states.cells)
    # boards contain only legal cell codes and some vegetation
    assert set(np.unique(cells)) <= {0, 1, 2, 3, 4}
    assert (cells == TREE).sum() > 0
