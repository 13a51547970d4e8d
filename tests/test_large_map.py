"""The CtF stack on a 20x20 board (tests/assets/board_large.txt) — 4x the
reference's 10x10 cell count, 3v3 teams.

The reference ships only 10x10/13x13 assets; everything here is config-
driven (territory masks, flags, obstacles and the in-graph scripted
policies are all derived from the map at build time, envs/ctf.py), so a
bigger board must work unchanged.  The differential test steps the live
reference on the same asset to pin exactness at the new scale.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec, make_ctf
from gym_multigrid_tpu.parallel.vector import make_ctf_batch

from _reference import load_reference
from test_ctf_differential import _force_ref_positions, _our_state

MAP = os.path.join(os.path.dirname(__file__), "assets", "board_large.txt")

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")


def _mvn_cfg(**kw):
    kw.setdefault("num_blue_agents", 3)
    kw.setdefault("num_red_agents", 3)
    kw.setdefault(
        "enemy_policies",
        (PolicySpec("fight"), PolicySpec("capture"), PolicySpec("rw")),
    )
    return CtfConfig.from_map_path(
        MAP, variant="mvn", observation_option="flattened",
        max_steps=200, **kw,
    )


def test_large_map_mvn_scripted_policies_run():
    cfg = _mvn_cfg()
    env = make_ctf_batch(cfg, 32)
    states, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape[0] == 32
    for i in range(60):
        acts = jax.random.randint(jax.random.PRNGKey(i), (32, 3), 0, 5)
        states, obs, rew, term, trunc = env.step(states, acts)
    assert bool((states.pos >= 0).all()) and bool((states.pos < 20).all())
    assert np.isfinite(np.asarray(rew)).all()


def test_large_map_selfplay_train_step():
    from gym_multigrid_tpu.rl.ppo import PPOConfig
    from gym_multigrid_tpu.rl.selfplay import (
        make_ctf_selfplay_batch,
        make_selfplay_ppo,
    )

    cfg = _mvn_cfg()
    env = make_ctf_selfplay_batch(cfg, 8)
    init_fn, train_step, nets = make_selfplay_ppo(
        env, cfg, PPOConfig(rollout_len=4, num_minibatches=2),
        hidden=(16, 16),
    )
    sp = init_fn(jax.random.PRNGKey(0))
    sp2, key, m = jax.jit(train_step)(sp, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["blue_loss"]))
    assert np.isfinite(float(m["red_loss"]))


def test_large_map_render_shape():
    from gym_multigrid_tpu.render import tiles

    cfg = _mvn_cfg()
    fns = make_ctf(cfg)
    state = fns.reset_fn(jax.random.PRNGKey(0))
    img = np.asarray(tiles.render_ctf(cfg, state))
    assert img.shape[0] == img.shape[1] and img.shape[0] >= 20 * 8
    assert img.ndim == 3 and img.shape[2] == 3


LARGE_SCRIPTS = [
    # (blue start, red start, blue action script) — far apart, stay-red:
    # deterministic trajectories at 20x20
    ([15, 15], [3, 3], [1, 1, 1, 2, 2, 3, 3, 4, 4, 0, 1, 2]),
    ([18, 10], [2, 16], [4, 4, 4, 3, 3, 1, 1, 1, 2, 2]),
    # walk into the centerline obstacle wall: stays blocked
    ([11, 8], [1, 1], [1, 1, 1, 1, 2, 4, 1, 1]),
]


@needs_ref
@pytest.mark.parametrize("blue,red,script", LARGE_SCRIPTS)
def test_large_map_trajectory_matches_reference(blue, red, script):
    """MvN 1-blue/1-red on the 20x20 board, stepped against the live
    reference.  (The reference's Ctf1v1Env cannot run here at all: its
    flattened observation space hardcodes the 10x10 board's 200
    territory entries — `np.ones([8 + 200 + 1])`, reference
    ctf.py:255-262 — and crashes constructing on any other map size.
    Our 1v1 derives the space from the map; the MvN differential pins
    transition exactness at the new scale.)"""
    from gym_multigrid.envs.ctf import CtFMvNEnv as RefEnv
    from gym_multigrid.policy.ctf.heuristic import RwPolicy as RefRw

    class StayPolicy(RefRw):
        def act(self, observation=None, curr_pos=None):
            return 0

    ref_env = RefEnv(
        num_blue_agents=1,
        num_red_agents=1,
        map_path=MAP,
        enemy_policies=[StayPolicy()],
        observation_option="flattened",
    )
    ref_env.reset(seed=0)
    _force_ref_positions(ref_env, blue, red)
    ref_env.step_count = 0

    cfg = CtfConfig.from_map_path(
        MAP, num_blue_agents=1, num_red_agents=1, variant="mvn",
        observation_option="flattened", enemy_policies=(PolicySpec("rw"),),
    )
    fns = make_ctf(cfg)
    st = _our_state([blue, red])

    for step_i, a in enumerate(script):
        ref_obs, ref_r, ref_term, ref_trunc, ref_info = ref_env.step(
            np.array([a])
        )
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
