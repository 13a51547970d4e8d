"""CtF env family tests.

Mirrors the reference suite (reference tests/test_ctf.py: random rollouts,
seeding, scripted-policy rollouts, render artifacts) and adds the strong
assertions the reference lacks: exact transition/reward semantics, obs
encodings, and differential checks against the reference package itself.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs import Ctf1v1Env, CtFMvNEnv
from gym_multigrid_tpu.envs.ctf import CtfConfig, CtfState, PolicySpec, make_ctf
from gym_multigrid_tpu.policy.ctf.heuristic import (
    CapturePolicy,
    FightPolicy,
    PatrolFightPolicy,
    PatrolPolicy,
    RwPolicy,
)

from _reference import load_reference

MAP_PATH = os.path.join(os.path.dirname(__file__), "assets", "board.txt")
OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def _state(fns_cfg, pos, terminated=None, seed=0):
    """Hand-built CtfState for transition unit tests."""
    n = len(pos)
    return CtfState(
        pos=jnp.asarray(pos, dtype=jnp.int32),
        dir=jnp.full((n,), 3, dtype=jnp.int32),
        terminated=jnp.asarray(
            terminated if terminated is not None else [False] * n
        ),
        collided=jnp.zeros((n,), dtype=bool),
        step_count=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )


# ---------------------------------------------------------------------------
# Reference-suite ports (tests/test_ctf.py:20-236)
# ---------------------------------------------------------------------------


def test_ctf():
    env = Ctf1v1Env(
        map_path=MAP_PATH, render_mode="rgb_array", observation_option="flattened"
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == env.observation_space.shape
    env.render()
    for _ in range(env.max_steps + 1):
        action = np.random.choice(list(env.actions_set))
        obs, reward, terminated, truncated, info = env.step(action)
        if terminated or truncated:
            break
    assert terminated or truncated


def test_ctf_random_seeding():
    env = Ctf1v1Env(
        map_path=MAP_PATH, render_mode="rgb_array", observation_option="flattened"
    )
    env.reset(seed=1)
    array1 = env.np_random.random(10)
    env.reset(seed=1)
    array2 = env.np_random.random(10)
    np.testing.assert_allclose(array1, array2)


def test_ctf_full_rollout_seeding():
    """Stronger than upstream: same seed => identical whole trajectory."""

    def rollout(seed):
        env = CtFMvNEnv(
            num_blue_agents=2,
            num_red_agents=2,
            map_path=MAP_PATH,
            observation_option="flattened",
        )
        obs, _ = env.reset(seed=seed)
        traj = [obs]
        rng = np.random.default_rng(0)
        for _ in range(20):
            obs, r, term, trunc, _ = env.step(rng.integers(0, 5, size=2))
            traj.append(obs)
            if term or trunc:
                break
        return np.stack(traj)

    np.testing.assert_array_equal(rollout(7), rollout(7))


def test_ctf_mvn():
    env = CtFMvNEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        render_mode="rgb_array",
        observation_option="flattened",
    )
    obs, _ = env.reset(seed=0)
    env.render()
    for _ in range(env.max_steps + 1):
        obs, reward, terminated, truncated, info = env.step(
            env.action_space.sample()
        )
        if terminated or truncated:
            break
    assert terminated or truncated


@pytest.mark.parametrize(
    "policy_factory",
    [RwPolicy, FightPolicy, CapturePolicy, PatrolPolicy, PatrolFightPolicy],
)
def test_ctf_mvn_policies(policy_factory):
    """One episode per scripted policy + gif artifact
    (reference tests/test_ctf.py:97-214)."""
    import imageio

    os.makedirs(os.path.join(OUT_DIR, "animations"), exist_ok=True)
    animation_path = os.path.join(
        OUT_DIR, "animations", f"ctf_mvn_{policy_factory.__name__}.gif"
    )
    from gym_multigrid_tpu.utils.map import load_text_map

    field_map = load_text_map(MAP_PATH)
    enemy_policy = (
        policy_factory() if policy_factory is RwPolicy else policy_factory(field_map)
    )
    env = CtFMvNEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        render_mode="rgb_array",
        observation_option="flattened",
        enemy_policies=[enemy_policy, RwPolicy()],
    )
    assert env._in_graph  # stock policies compile into the step
    obs, _ = env.reset(seed=3)
    frames = [env.render()]
    for _ in range(env.max_steps + 1):
        obs, reward, terminated, truncated, info = env.step(
            env.action_space.sample()
        )
        frames.append(env.render())
        if terminated or truncated:
            break
    imageio.mimsave(animation_path, frames, duration=0.5)
    assert os.path.exists(animation_path)


def test_custom_policy_host_fallback():
    """User-defined policy subclasses run host-side and still work."""

    class AlwaysStay(FightPolicy):
        def act(self, observation, curr_pos):
            return 0

    env = CtFMvNEnv(
        num_blue_agents=1,
        num_red_agents=1,
        map_path=MAP_PATH,
        observation_option="positional",
        enemy_policies=[AlwaysStay()],
    )
    assert not env._in_graph
    obs, _ = env.reset(seed=0)
    red0 = np.asarray(env.agents[1].pos).copy()
    for _ in range(5):
        env.step([0])
    np.testing.assert_array_equal(np.asarray(env.agents[1].pos), red0)


def test_mvn_ctf_render():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.join(OUT_DIR, "plots"), exist_ok=True)
    img_save_path = os.path.join(OUT_DIR, "plots", "mvn_ctf_render.png")
    env = CtFMvNEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        render_mode="rgb_array",
        observation_option="flattened",
    )
    env.reset(seed=0)
    env.step(env.action_space.sample())
    img = env.render()
    plt.imsave(img_save_path, img, dpi=600)
    assert os.path.exists(img_save_path)


# ---------------------------------------------------------------------------
# Exact transition semantics (golden unit tests on hand-built states)
# ---------------------------------------------------------------------------


def _fns(**kw):
    kw.setdefault("num_blue_agents", 1)
    kw.setdefault("num_red_agents", 1)
    kw.setdefault("variant", "1v1")
    kw.setdefault("enemy_policies", tuple([PolicySpec("rw")] * kw["num_red_agents"]))
    cfg = CtfConfig.from_map_path(MAP_PATH, **kw)
    return cfg, make_ctf(cfg)


def test_move_blocking_and_flags():
    cfg, fns = _fns()
    t_blue_flag = np.argwhere(cfg.field_map == 4)[0]
    # Blue next to red flag (red flag at field map value 5).
    red_flag = np.argwhere(cfg.field_map == 5)[0]
    # Put blue one cell left of the red flag and capture with 'right'.
    start = [int(red_flag[0]), int(red_flag[1]) - 1]
    st = _state(cfg, [start, [9, 9]])
    st2, obs, r, term, trunc, info = fns.step_actions_fn(
        st, jnp.asarray([3, 0])
    )  # right, stay
    np.testing.assert_array_equal(np.asarray(st2.pos[0]), red_flag)
    assert bool(term)
    assert float(r) == pytest.approx(cfg.flag_reward - cfg.step_penalty)
    assert bool(info["red_flag_captured"])

    # Obstacle blocks (zero penalty -> not enterable): board obstacles at
    # field map value 6.
    ob = np.argwhere(cfg.field_map == 6)[0]
    start = [int(ob[0]), int(ob[1]) - 1]
    st = _state(cfg, [start, [9, 9]])
    st2, *_ = fns.step_actions_fn(st, jnp.asarray([3, 0]))  # right into obstacle
    np.testing.assert_array_equal(np.asarray(st2.pos[0]), start)

    # Out-of-bounds blocked.
    st = _state(cfg, [[0, 0], [9, 9]])
    st2, *_ = fns.step_actions_fn(st, jnp.asarray([1, 0]))  # left off the board
    np.testing.assert_array_equal(np.asarray(st2.pos[0]), [0, 0])

    # Agents block each other: red stays, blue tries to move onto red.
    st = _state(cfg, [[5, 5], [5, 6]])
    st2, *_ = fns.step_actions_fn(st, jnp.asarray([3, 0]))
    np.testing.assert_array_equal(np.asarray(st2.pos[0]), [5, 5])


def test_battle_outcomes_forced():
    # randomness=1.0: blue in own territory vs red not in own -> blue always
    # wins; reversed -> always loses (truth table ctf.py:609-627).
    cfg, fns = _fns(randomness=1.0)
    blue_cell = np.argwhere(cfg.field_map == 0)[0]
    # adjacent cell sharing row (must also be blue territory or anything)
    st = _state(
        cfg, [[int(blue_cell[0]), int(blue_cell[1])], [int(blue_cell[0]), int(blue_cell[1]) + 1]]
    )
    # both stay; battle resolves because distance 1 <= battle_range
    st2, obs, r, term, trunc, info = fns.step_actions_fn(st, jnp.asarray([0, 0]))
    fm = cfg.field_map
    red_in_own = fm[int(blue_cell[0]), int(blue_cell[1]) + 1] == 1
    if not red_in_own:
        # (T, F): p_blue = randomness = 1 -> red defeated, +battle_reward
        assert bool(st2.terminated[1])
        assert float(r) == pytest.approx(cfg.battle_reward - cfg.step_penalty)
        assert not bool(term)


def test_defeated_red_freezes_and_maps_to_obstacle():
    cfg, fns = _fns(observation_option="map")
    st = _state(cfg, [[5, 5], [0, 0]], terminated=[False, True])
    st2, obs, r, term, trunc, info = fns.step_actions_fn(st, jnp.asarray([0, 3]))
    np.testing.assert_array_equal(np.asarray(st2.pos[1]), [0, 0])  # frozen
    obs = np.asarray(obs)
    # encode_map: terminated agent renders as obstacle id (ctf.py:426-430),
    # transposed layout.
    assert obs[0, 0] == 6
    assert obs[5, 5] == 2  # blue agent id at (i=5, j=5) -> obs[j, i]


def test_mvn_collision_flag_sticky():
    """obstacle_penalty != 0: bumping an agent (or standing still) sets a
    sticky collided flag costing obstacle_penalty per step
    (ctf.py:1231-1238, 1316-1332)."""
    cfg, fns = _fns(
        num_blue_agents=2,
        num_red_agents=1,
        variant="mvn",
        obstacle_penalty_ratio=0.5,
        enemy_policies=(PolicySpec("rw"),),
    )
    st = _state(cfg, [[5, 5], [2, 2], [9, 9]])
    # Blue 0 stays -> reads its own cell -> collided (reference quirk).
    st2, obs, r, term, trunc, info = fns.step_actions_fn(st, jnp.asarray([0, 0, 0]))
    assert bool(st2.collided[0]) and bool(st2.collided[1])
    assert bool(st2.terminated[0]) and bool(st2.terminated[1])
    # both blues collided: -2 * obstacle_penalty - 2 * step_penalty
    assert float(r) == pytest.approx(
        -2 * cfg.obstacle_penalty - cfg.step_penalty * 2
    )


def test_truncation():
    cfg, fns = _fns(max_steps=3)
    st = _state(cfg, [[5, 5], [9, 9]])
    for i in range(3):
        st, obs, r, term, trunc, info = fns.step_actions_fn(st, jnp.asarray([0, 0]))
    assert bool(trunc)


# ---------------------------------------------------------------------------
# Differential tests against the reference package
# ---------------------------------------------------------------------------

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")


@needs_ref
@pytest.mark.parametrize("option", ["positional", "map", "flattened"])
def test_obs_matches_reference_mvn(option):
    from gym_multigrid.envs.ctf import CtFMvNEnv as RefEnv

    ref_env = RefEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        observation_option=option,
    )
    ref_env.reset(seed=0)
    # Force known positions/terminated into the reference env.
    pos = [[2, 3], [7, 7], [5, 1], [9, 9]]
    for a, p in zip(ref_env.agents, pos):
        a.pos = np.array(p)
        a.terminated = False
    ref_env.agents[3].terminated = True
    ref_obs = ref_env._get_obs()
    ref_info = ref_env._get_info()

    cfg = CtfConfig.from_map_path(
        MAP_PATH,
        num_blue_agents=2,
        num_red_agents=2,
        variant="mvn",
        observation_option=option,
        enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
    )
    fns = make_ctf(cfg)
    st = _state(cfg, pos, terminated=[False, False, False, True])
    obs = fns.obs_fn(st)
    info = fns.info_fn(st)

    if option == "positional":
        for k in ref_obs:
            np.testing.assert_array_equal(
                np.asarray(obs[k]), np.asarray(ref_obs[k]), err_msg=k
            )
    else:
        np.testing.assert_array_equal(np.asarray(obs), np.asarray(ref_obs))
    for k, v in ref_info.items():
        assert float(info[k]) == pytest.approx(v), k


@needs_ref
@pytest.mark.parametrize("option", ["positional", "map", "flattened"])
def test_obs_matches_reference_1v1(option):
    from gym_multigrid.envs.ctf import Ctf1v1Env as RefEnv

    ref_env = RefEnv(map_path=MAP_PATH, observation_option=option)
    ref_env.reset(seed=0)
    pos = [[2, 3], [7, 7]]
    for a, p in zip(ref_env.agents, pos):
        a.pos = np.array(p)
    ref_env._is_red_agent_defeated = False
    ref_obs = ref_env._get_obs()
    ref_info = ref_env._get_info()

    cfg = CtfConfig.from_map_path(
        MAP_PATH, num_blue_agents=1, num_red_agents=1, variant="1v1",
        observation_option=option, enemy_policies=(PolicySpec("rw"),),
    )
    fns = make_ctf(cfg)
    st = _state(cfg, pos)
    obs = fns.obs_fn(st)
    info = fns.info_fn(st)

    if option == "positional":
        for k in ref_obs:
            np.testing.assert_array_equal(
                np.asarray(obs[k]), np.asarray(ref_obs[k]), err_msg=k
            )
    else:
        np.testing.assert_array_equal(np.asarray(obs), np.asarray(ref_obs))
    for k, v in ref_info.items():
        assert float(info[k]) == pytest.approx(v), k


@needs_ref
def test_spaces_match_reference():
    from gym_multigrid.envs.ctf import CtFMvNEnv as RefEnv

    for option in ["map", "flattened"]:
        ref_env = RefEnv(
            num_blue_agents=2,
            num_red_agents=2,
            map_path=MAP_PATH,
            observation_option=option,
        )
        env = CtFMvNEnv(
            num_blue_agents=2,
            num_red_agents=2,
            map_path=MAP_PATH,
            observation_option=option,
        )
        assert env.observation_space.shape == ref_env.observation_space.shape
        assert env.observation_space.dtype == ref_env.observation_space.dtype
        assert env.action_space == ref_env.action_space


def test_policy_spec_validation_errors_early():
    # An unknown kind used to surface as a NameError inside the traced
    # policy body on the first step; now it fails at construction.
    from gym_multigrid_tpu.envs.ctf import PolicySpec

    with pytest.raises(ValueError, match="unknown scripted-policy kind"):
        PolicySpec("bogus")
    with pytest.raises(ValueError, match="randomness"):
        PolicySpec("rw", randomness=-0.1)
    PolicySpec("patrol_fight")  # all real kinds still construct


def test_adapter_accepts_policy_spec_enemies():
    # PolicySpec (the functional core's policy currency) converts to the
    # matching heuristic class inside the adapter — and still compiles
    # the scripted reds in-graph.
    from gym_multigrid_tpu.envs import CtFMvNEnv
    from gym_multigrid_tpu.envs.ctf import PolicySpec

    env = CtFMvNEnv(
        num_blue_agents=2,
        num_red_agents=2,
        map_path=MAP_PATH,
        observation_option="flattened",
        enemy_policies=[PolicySpec("fight"), PolicySpec("patrol")],
    )
    env.reset(seed=0)
    assert env._in_graph
    for _ in range(5):
        obs, rew, term, trunc, info = env.step([1, 2])
    assert np.isfinite(float(np.asarray(rew).sum()))


def test_ctf_config_validation_errors_early():
    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec

    mk = lambda **kw: CtfConfig.from_map_path(MAP_PATH, **kw)  # noqa: E731
    with pytest.raises(ValueError, match="variant"):
        mk(variant="bogus")
    with pytest.raises(ValueError, match="at least one agent"):
        mk(num_blue_agents=0, num_red_agents=1)
    with pytest.raises(ValueError, match="exactly one agent"):
        mk(variant="1v1", num_blue_agents=2, num_red_agents=2,
           enemy_policies=(PolicySpec("rw"), PolicySpec("rw")))
    with pytest.raises(ValueError, match="max_steps"):
        mk(max_steps=0)


def test_enemy_policies_length_validated():
    from gym_multigrid_tpu.envs.ctf import CtfConfig

    with pytest.raises(ValueError, match="enemy_policies"):
        CtfConfig.from_map_path(
            MAP_PATH, num_blue_agents=2, num_red_agents=2
        )
