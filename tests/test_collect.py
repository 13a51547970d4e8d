"""Collect env tests.

Ports the reference smoke test (tests/test_collect.py:9-22 — which FAILS
upstream due to the num_balls isinstance bug, SURVEY.md §2.2) and adds the
strong semantic assertions the reference lacks: encoding parity, transition
invariants, respawn distribution support, termination/truncation rules.
"""

import gymnasium as gym
import numpy as np
import pytest

import gym_multigrid_tpu  # noqa: F401  (registers env ids)
from gym_multigrid_tpu.core.world import CollectWorld

ALL_IDS = [
    "multigrid-collect-v0",
    "multigrid-collect-single-v0",
    "multigrid-collect-quadrants-v0",
    "multigrid-collect-rooms-v0",
    "multigrid-collect-rooms-fixed-horizon-v0",
    "multigrid-collect-rooms-respawn-v0",
    "multigrid-collect-respawn-v0",
    "multigrid-collect-respawn-clustered-v0",
    "multigrid-collect-quadrants15-v0",
]

EMPTY = CollectWorld.OBJECT_TO_IDX["empty"]
WALL = CollectWorld.OBJECT_TO_IDX["wall"]
BALL = CollectWorld.OBJECT_TO_IDX["ball"]
AGENT = CollectWorld.OBJECT_TO_IDX["agent"]


@pytest.mark.parametrize("env_id", ["multigrid-collect-v0"])
def test_collect_game(env_id) -> None:
    """Reference smoke test verbatim semantics (tests/test_collect.py:9-22)."""
    env = gym.make(env_id)
    obs, info = env.reset()
    while True:
        actions = [env.action_space.sample() for a in env.unwrapped.agents]
        obs, reward, terminated, truncated, info = env.step(actions)
        if terminated or truncated:
            break
    assert terminated or truncated


@pytest.mark.parametrize("env_id", ALL_IDS)
def test_all_registered_ids_run(env_id) -> None:
    """Every registered id constructs, resets and steps (upstream, several
    of these raise — SURVEY.md §2.2)."""
    env = gym.make(env_id)
    obs, info = env.reset(seed=0)
    size = env.unwrapped.size
    assert obs.shape == (size, size, 3)
    assert obs.dtype == np.uint8
    for _ in range(5):
        actions = [env.action_space.sample() for _ in env.unwrapped.agents]
        obs, reward, terminated, truncated, info = env.step(actions)
        if terminated or truncated:
            break
    assert set(info.keys()) == {
        "agent1ball1", "agent1ball2", "agent1ball3",
        "agent2ball1", "agent2ball2", "agent2ball3",
    }


def test_reset_encoding_quadrants() -> None:
    """Reset grid parity: walls on the perimeter, 15 balls in their color's
    quadrant rect, agents at (1, h-2), (2, h-2) with dir channel 3
    (collect_game.py:266-300, multigrid.py:374)."""
    env = gym.make("multigrid-collect-quadrants-v0").unwrapped
    obs, _ = env.reset(seed=3)
    w = h = 10
    # perimeter walls
    for i in range(w):
        assert obs[i, 0, 0] == WALL and obs[i, h - 1, 0] == WALL
        assert obs[0, i, 0] == WALL and obs[w - 1, i, 0] == WALL
    # agents at fixed spawn
    assert obs[1, h - 2, 0] == AGENT and obs[2, h - 2, 0] == AGENT
    assert obs[1, h - 2, 1] == 3 and obs[2, h - 2, 1] == 5  # green, purple
    assert obs[1, h - 2, 2] == 3 and obs[2, h - 2, 2] == 3  # dir == 3
    # 15 balls, 5 per color, each inside its inclusive partition rect
    balls = np.argwhere(obs[..., 0] == BALL)
    assert len(balls) == 15
    rects = {0: ((0, 4), (0, 4)), 1: ((4, 8), (4, 8)), 2: ((4, 8), (0, 4))}
    counts = {0: 0, 1: 0, 2: 0}
    for x, y in balls:
        c = int(obs[x, y, 1])
        (x0, x1), (y0, y1) = rects[c]
        assert x0 <= x <= x1 and y0 <= y <= y1, (x, y, c)
        counts[c] += 1
    assert counts == {0: 5, 1: 5, 2: 5}


def test_step_semantics_move_and_block() -> None:
    """Deterministic micro-transitions: move into empty, blocked by wall,
    blocked by other agent (collect_game.py:149-181)."""
    import jax
    import jax.numpy as jnp
    from gym_multigrid_tpu.envs.collect import (
        CollectConfig, CollectState, make_collect,
    )

    cfg = CollectConfig(layout="quadrants")
    reset_fn, step_fn, encode_fn = make_collect(cfg)
    st = reset_fn(jax.random.PRNGKey(0))
    # agents at (1,8) and (2,8); agent 0 west -> wall at (0,8): blocked
    # agent 1 east -> (3,8) empty in this seed or ball; just check invariants
    st2, obs, rew, term, trunc, _ = step_fn(st, jnp.array([3, 1]))
    p = np.asarray(st2.agent_pos)
    assert tuple(p[0]) == (1, 8)  # west blocked by wall
    # grid/agent-pos consistency + conservation invariants
    obj = np.asarray(st2.grid_obj)
    assert (obj == AGENT).sum() == 2
    for i in range(2):
        x, y = p[i]
        assert obj[y * 10 + x] == AGENT
    # both agents trying to enter the same cell: only the first mover wins
    st3 = CollectState(
        grid_obj=st2.grid_obj, grid_color=st2.grid_color,
        grid_slot=st2.grid_slot, agent_pos=st2.agent_pos,
        collected=st2.collected, step_count=st2.step_count,
        info_counts=st2.info_counts, key=st2.key,
    )
    for _ in range(20):
        st3, obs, rew, term, trunc, _ = step_fn(st3, jnp.array([1, 3]))
        pp = np.asarray(st3.agent_pos)
        assert not np.array_equal(pp[0], pp[1])  # never overlap
        assert (np.asarray(st3.grid_obj) == AGENT).sum() == 2


def test_pickup_reward_and_termination() -> None:
    """Collect all balls -> terminated (no respawn), rewards flat +1 per
    ball, info counters track (agent, color) (collect_game.py:121-147,
    208-209)."""
    import jax
    import jax.numpy as jnp
    from gym_multigrid_tpu.envs.collect import CollectConfig, make_collect

    cfg = CollectConfig(layout="even", num_balls=15)
    reset_fn, step_fn, _ = make_collect(cfg)
    step_fn = jax.jit(step_fn)
    st = reset_fn(jax.random.PRNGKey(42))
    key = jax.random.PRNGKey(7)
    total = 0.0
    for t in range(100):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (2,), 0, 4)
        st, obs, rew, term, trunc, info = step_fn(st, acts)
        total += float(rew.sum())
        nballs = int((np.asarray(st.grid_obj) == BALL).sum())
        assert nballs == 15 - int(st.collected)  # conservation
        assert abs(float(np.asarray(st.info_counts).sum()) - float(st.collected)) < 1e-9
        if bool(term):
            break
    assert total == float(st.collected)
    if bool(term):
        assert int(st.collected) == 15


def test_respawn_keeps_ball_count_and_partition() -> None:
    """Respawn-clustered: ball count conserved at 15, every ball stays inside
    its color's partition rect (collect_game.py:401-409)."""
    import jax
    import jax.numpy as jnp
    from gym_multigrid_tpu.envs.collect import CollectConfig, make_collect

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True)
    reset_fn, step_fn, encode_fn = make_collect(cfg)
    step_fn = jax.jit(step_fn)
    st = reset_fn(jax.random.PRNGKey(5))
    rects = {0: ((0, 6), (0, 6)), 1: ((4, 9), (4, 9)), 2: ((4, 9), (0, 6))}
    key = jax.random.PRNGKey(11)
    for t in range(50):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (2,), 0, 4)
        st, obs, rew, term, trunc, info = step_fn(st, acts)
        assert not bool(term)  # respawn envs never terminate
        obs = np.asarray(obs)
        balls = np.argwhere(obs[..., 0] == BALL)
        assert len(balls) == 15
        for x, y in balls:
            c = int(obs[x, y, 1])
            (x0, x1), (y0, y1) = rects[c]
            assert x0 <= x <= x1 and y0 <= y <= y1
    assert bool(trunc) is (int(st.step_count) >= 100) or t < 99


def test_truncation_at_max_steps() -> None:
    env = gym.make("multigrid-collect-respawn-clustered-v0")
    env.reset(seed=0)
    for t in range(50):
        obs, r, term, trunc, info = env.step([0, 0])
        assert not term
    assert trunc  # TimeLimit at 50 (reference __init__.py:125)


def test_render_rgb() -> None:
    env = gym.make("multigrid-collect-quadrants-v0").unwrapped
    env.reset(seed=0)
    img = env.render()
    assert img.shape == (320, 320, 3) and img.dtype == np.uint8
    assert img.max() > 0


def test_per_ball_instance_rewards() -> None:
    """The reference pays each Ball *instance* its constructor reward
    (collect_game.py:146): duplicate colors with different rewards, and
    quadrants_respawn originals (hardcoded reward 1, collect_game.py:391)
    vs respawns (balls_reward[color], :409), must not collapse."""
    import jax
    import jax.numpy as jnp
    from gym_multigrid_tpu.envs.collect import (
        CollectConfig, CollectState, build_plan, make_collect,
        reward_slot_tables,
    )

    # Duplicate colors, distinct rewards: slots 0-4 pay 1.0, 5-9 pay 5.0,
    # 10-14 pay 3.0 even though slots 0-9 share color 0.
    cfg = CollectConfig(
        layout="even",
        balls_index=(0, 0, 1),
        balls_reward=(1.0, 5.0, 3.0),
        num_balls=15,
    )
    slot_rewards, slot_info, nb = reward_slot_tables(cfg, build_plan(cfg))
    assert nb == 15
    np.testing.assert_allclose(slot_rewards[:15], [1.0] * 5 + [5.0] * 5 + [3.0] * 5)

    reset_fn, step_fn, _ = make_collect(cfg)
    st = reset_fn(jax.random.PRNGKey(0))
    go = np.asarray(st.grid_obj)
    gs = np.asarray(st.grid_slot)
    # Construct the needed adjacency instead of sampling-and-skipping
    # (VERDICT r2 weak item 5): relocate a ball onto the east cell of an
    # adjacent empty pair and teleport agent 0 onto the west cell.  With
    # 47 empty interior cells in 8 rows, some row holds >= 6 empties, so
    # a horizontally adjacent empty pair always exists.
    go2 = go.copy(); gc2 = np.asarray(st.grid_color).copy(); gs2 = gs.copy()
    empty = go2 == 0
    pair = next(
        c for c in np.flatnonzero(empty)
        if 1 <= c % 10 < 8 and empty[c + 1]
    )
    x, y = int(pair % 10) + 1, int(pair // 10)  # ball goes east of agent
    ball_cell = int(np.flatnonzero(go2 == 2)[0])
    slot = int(gs2[ball_cell])
    go2[x + y * 10] = 2; gc2[x + y * 10] = gc2[ball_cell]
    gs2[x + y * 10] = gs2[ball_cell]
    go2[ball_cell] = 0; gc2[ball_cell] = 0; gs2[ball_cell] = 0
    p = np.asarray(st.agent_pos).copy()
    old = p[0]
    go2[old[1] * 10 + old[0]] = 0; gc2[old[1] * 10 + old[0]] = 0
    go2[y * 10 + x - 1] = 3; gc2[y * 10 + x - 1] = cfg.agents_index[0]
    p[0] = (x - 1, y)
    st = CollectState(
        grid_obj=jnp.asarray(go2), grid_color=jnp.asarray(gc2),
        grid_slot=jnp.asarray(gs2), agent_pos=jnp.asarray(p),
        collected=st.collected, step_count=st.step_count,
        info_counts=st.info_counts, key=st.key,
    )
    # Step east repeatedly until agent 0 picks it (move order is random;
    # agent 1 stays put).
    for _ in range(4):
        st, obs, rew, term, trunc, _ = step_fn(st, jnp.array([1, -1]))
        if float(rew[0]) != 0.0:
            break
    assert float(rew[0]) == pytest.approx(float(slot_rewards[slot]))

    # quadrants_respawn: originals pay 1, respawns pay balls_reward[color].
    cfg2 = CollectConfig(
        layout="quadrants_respawn", respawn=True,
        balls_reward=(2.0, 2.0, 2.0), max_steps=50,
    )
    sr2, _, nb2 = reward_slot_tables(cfg2, build_plan(cfg2))
    np.testing.assert_allclose(sr2[:nb2], 1.0)
    np.testing.assert_allclose(sr2[nb2 : nb2 + 3], 2.0)


def test_config_validation_errors_early():
    from gym_multigrid_tpu.envs.collect import CollectConfig

    with pytest.raises(ValueError, match="size"):
        CollectConfig(size=2)
    with pytest.raises(ValueError, match="agents_index"):
        CollectConfig(agents_index=())
    with pytest.raises(ValueError, match="region with only"):
        CollectConfig(num_balls=300)
    with pytest.raises(ValueError, match="max_steps"):
        CollectConfig(max_steps=0)
    CollectConfig()  # defaults still construct


def test_layout_aware_capacity_and_adapter_action_validation():
    from gym_multigrid_tpu.envs.collect import CollectConfig

    # rooms: 20 balls (15 + extra-ball quirk) need a 16-cell partition
    # at num_balls=60 -> rejected; the default 15 still fits.
    with pytest.raises(ValueError, match="region with only"):
        CollectConfig(layout="rooms", num_balls=60)
    CollectConfig(layout="rooms")
    with pytest.raises(ValueError, match="balls_reward"):
        CollectConfig(balls_reward=(1.0,))

    import gymnasium as gym

    import gym_multigrid_tpu

    gym_multigrid_tpu.register_envs()
    env = gym.make("multigrid-collect-quadrants-v0").unwrapped
    env.reset(seed=0)
    with pytest.raises(ValueError, match="expected 2 actions"):
        env.step([1])
    with pytest.raises(ValueError, match="expected 2 actions"):
        env.step([1, 2, 3, 4])
