"""Deterministic step-trajectory differential: our CtF core vs the live
reference, stepped side by side.

With a scripted stay-policy red agent, no battles in range and zero
obstacle penalty, the 1v1 transition is fully deterministic (blue moves
first, red never moves), so whole trajectories — positions, rewards,
termination, flattened obs — must match the reference exactly.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.ctf import CtfConfig, CtfState, PolicySpec, make_ctf

from _reference import load_reference

MAP_PATH = os.path.join(os.path.dirname(__file__), "assets", "board.txt")

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")


def _force_ref_positions(env, blue, red):
    """Teleport the reference agents, keeping the grid consistent
    (agent objects occupy cells; old cells restore from init_grid)."""
    for agent, pos in zip(env.agents, [blue, red]):
        old = agent.pos
        env.grid.set(int(old[0]), int(old[1]), env.init_grid.get(int(old[0]), int(old[1])))
    for agent, pos in zip(env.agents, [blue, red]):
        agent.pos = np.array(pos)
        env.grid.set(int(pos[0]), int(pos[1]), agent)


def _our_state(pos, seed=0):
    return CtfState(
        pos=jnp.asarray(pos, dtype=jnp.int32),
        dir=jnp.full((len(pos),), 3, dtype=jnp.int32),
        terminated=jnp.zeros((len(pos),), dtype=bool),
        collided=jnp.zeros((len(pos),), dtype=bool),
        step_count=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )


SCRIPTS = [
    # (blue start, red start, action script)
    ([9, 3], [3, 1], [3, 3, 1, 1, 4, 4, 2, 2, 0, 3, 3, 3]),
    ([5, 0], [0, 5], [1, 1, 1, 2, 2, 3, 4, 4, 4, 2]),
    ([6, 9], [1, 8], [4, 4, 4, 4, 3, 3, 2, 1, 0, 0]),
    # drives blue into the obstacle block at (3,4)/(3,5): stays blocked
    ([3, 3], [0, 0], [3, 3, 3, 3, 2, 2, 4, 4]),
    # capture run: blue walks onto the red flag at (6, 1)
    ([6, 3], [0, 9], [1, 1]),
]


@needs_ref
@pytest.mark.parametrize("blue,red,script", SCRIPTS)
def test_1v1_trajectory_matches_reference(blue, red, script):
    from gym_multigrid.envs.ctf import Ctf1v1Env as RefEnv
    from gym_multigrid.policy.ctf.heuristic import RwPolicy as RefRw

    class StayPolicy(RefRw):
        def act(self, observation=None, curr_pos=None):
            return 0

    ref_env = RefEnv(
        map_path=MAP_PATH,
        enemy_policy=StayPolicy(),
        observation_option="flattened",
    )
    ref_env.reset(seed=0)
    _force_ref_positions(ref_env, blue, red)
    ref_env.step_count = 0

    cfg = CtfConfig.from_map_path(
        MAP_PATH, num_blue_agents=1, num_red_agents=1, variant="1v1",
        observation_option="flattened", enemy_policies=(PolicySpec("rw"),),
    )
    fns = make_ctf(cfg)
    st = _our_state([blue, red])

    for step_i, a in enumerate(script):
        ref_obs, ref_r, ref_term, ref_trunc, ref_info = ref_env.step(a)
        st, obs, r, term, trunc, info = fns.step_actions_fn(
            st, jnp.asarray([a, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(st.pos[0]), np.asarray(ref_env.agents[0].pos),
            err_msg=f"step {step_i} blue pos",
        )
        np.testing.assert_array_equal(
            np.asarray(obs, dtype=np.int64), np.asarray(ref_obs),
            err_msg=f"step {step_i} obs",
        )
        assert float(r) == pytest.approx(float(ref_r)), f"step {step_i} reward"
        assert bool(term) == bool(ref_term), f"step {step_i} terminated"
        assert bool(trunc) == bool(ref_trunc), f"step {step_i} truncated"
        for k, v in ref_info.items():
            assert float(info[k]) == pytest.approx(v), f"step {step_i} {k}"
        if ref_term or ref_trunc:
            break


@needs_ref
def test_1v1_red_policy_blocks_and_flags():
    """Red moving with scripted actions through our step_actions_fn vs
    reference with a scripted policy: red paths, blocking by blue, and the
    blue-flag capture penalty all match."""
    from gym_multigrid.envs.ctf import Ctf1v1Env as RefEnv
    from gym_multigrid.policy.ctf.heuristic import RwPolicy as RefRw

    red_script = [3, 3, 3, 1, 1, 1, 2, 4, 3, 3]

    class ScriptPolicy(RefRw):
        def __init__(self):
            super().__init__()
            self.i = 0

        def act(self, observation=None, curr_pos=None):
            a = red_script[self.i % len(red_script)]
            self.i += 1
            return a

    ref_env = RefEnv(
        map_path=MAP_PATH,
        enemy_policy=ScriptPolicy(),
        observation_option="flattened",
    )
    ref_env.reset(seed=0)
    blue, red = [9, 9], [2, 2]
    _force_ref_positions(ref_env, blue, red)
    ref_env.step_count = 0

    cfg = CtfConfig.from_map_path(
        MAP_PATH, num_blue_agents=1, num_red_agents=1, variant="1v1",
        observation_option="flattened", enemy_policies=(PolicySpec("rw"),),
    )
    fns = make_ctf(cfg)
    st = _our_state([blue, red])

    for step_i, ra in enumerate(red_script):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step(0)  # blue stays
        st, obs, r, term, trunc, info = fns.step_actions_fn(
            st, jnp.asarray([0, ra])
        )
        np.testing.assert_array_equal(
            np.asarray(st.pos[1]), np.asarray(ref_env.agents[1].pos),
            err_msg=f"step {step_i} red pos",
        )
        assert float(r) == pytest.approx(float(ref_r)), f"step {step_i} reward"
        assert bool(term) == bool(ref_term)
        if ref_term or ref_trunc:
            break


@needs_ref
def test_mvn_trajectory_matches_reference():
    """MvN with a single blue mover and stay-scripted reds is fully
    deterministic: whole trajectories must match, including the
    obstacle_penalty collided-flag semantics (sticky per-step penalty,
    self-bump on stay — ctf.py:1231-1332)."""
    from gym_multigrid.envs.ctf import CtFMvNEnv as RefEnv
    from gym_multigrid.policy.ctf.heuristic import RwPolicy as RefRw

    class StayPolicy(RefRw):
        def act(self, observation=None, curr_pos=None):
            return 0

    for penalty, script in [
        (0.0, [3, 3, 1, 4, 4, 2, 2, 1, 1, 3]),
        # with penalty != 0 the very first 'stay' self-bump sets collided
        (0.5, [0, 3, 3]),
        # bump into a stationary red agent
        (0.5, [3, 3]),
    ]:
        ref_env = RefEnv(
            num_blue_agents=1,
            num_red_agents=2,
            map_path=MAP_PATH,
            enemy_policies=StayPolicy(),
            observation_option="flattened",
            obstacle_penalty_ratio=penalty,
        )
        ref_env.reset(seed=0)
        blue, reds = [9, 9], [[2, 2], [2, 4]]
        for agent, pos in zip(ref_env.agents, [blue] + reds):
            old = agent.pos
            ref_env.grid.set(
                int(old[0]), int(old[1]),
                ref_env.init_grid.get(int(old[0]), int(old[1])),
            )
        for agent, pos in zip(ref_env.agents, [blue] + reds):
            agent.pos = np.array(pos)
            ref_env.grid.set(int(pos[0]), int(pos[1]), agent)
        ref_env.step_count = 0

        cfg = CtfConfig.from_map_path(
            MAP_PATH, num_blue_agents=1, num_red_agents=2, variant="mvn",
            observation_option="flattened",
            enemy_policies=(PolicySpec("rw"), PolicySpec("rw")),
            obstacle_penalty_ratio=penalty,
        )
        fns = make_ctf(cfg)
        st = _our_state([blue] + reds)

        for step_i, a in enumerate(script):
            ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step([a])
            st, obs, r, term, trunc, info = fns.step_actions_fn(
                st, jnp.asarray([a, 0, 0])
            )
            np.testing.assert_array_equal(
                np.asarray(st.pos[0]), np.asarray(ref_env.agents[0].pos),
                err_msg=f"p={penalty} step {step_i} blue pos",
            )
            np.testing.assert_array_equal(
                np.asarray(obs, dtype=np.int64), np.asarray(ref_obs),
                err_msg=f"p={penalty} step {step_i} obs",
            )
            assert float(r) == pytest.approx(float(ref_r)), (penalty, step_i)
            assert bool(term) == bool(ref_term), (penalty, step_i)
            assert bool(st.collided[0]) == bool(ref_env.agents[0].collided)
            if ref_term or ref_trunc:
                break
