"""Fused Pallas Collect kernel: spec equality + semantic invariants.

The kernel body and the pure-jax spec are literally the same function
(_step_math), so the pallas_call (interpret mode on CPU) must be bit-equal
to calling the math directly; the invariants then tie both to the env
semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.collect import CollectConfig, make_collect
from gym_multigrid_tpu.ops.pallas_collect import (
    _step_math,
    collect_step_slab,
    make_collect_step_batch,
    make_tables,
)
from gym_multigrid_tpu.parallel.vector import make_collect_batch

CFG = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)


def _batched_states(cfg, n, seed=0):
    reset_one, _, _ = make_collect(cfg)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(reset_one)(keys)


def test_kernel_matches_spec():
    n = 8
    states = _batched_states(CFG, n)
    t = make_tables(CFG)
    acts = jax.random.randint(jax.random.PRNGKey(1), (n, 2), 0, 4)
    rnd = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    pos = states.agent_pos.reshape(n, -1)

    rects = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
    C = states.grid_obj.shape[1]
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)
    want = _step_math(
        t, states.grid_obj, states.grid_color, states.grid_slot, pos,
        acts, rnd, rects, tril,
    )
    got = collect_step_slab(
        t, states.grid_obj, states.grid_color, states.grid_slot, pos,
        acts, rnd, True,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_step_batch_invariants():
    n = 16
    env = make_collect_batch(CFG, n, use_pallas=True)
    assert env.step_batch is not None
    states, obs = env.reset(jax.random.PRNGKey(0))

    def ball_count(st):
        return np.asarray((st.grid_obj == 2).sum(axis=1))

    balls0 = ball_count(states)
    key = jax.random.PRNGKey(3)
    for i in range(20):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (n, 2), 0, 4)
        states, obs, rewards, term, trunc = env.step(states, acts)
        # Respawn keeps the ball count EXCEPT when a respawn lands on the
        # just-vacated pickup cell and the agent stomps it — a faithful
        # reference quirk (collect_game.py:140-176: respawn samples any
        # empty cell incl. next_pos, then the agent is set unconditionally).
        bc = ball_count(states)
        assert (bc <= balls0).all()
        assert (bc >= balls0 - np.asarray(states.collected)).all()
        # exactly two agents per grid
        assert (np.asarray((states.grid_obj == 3).sum(axis=1)) == 2).all()
    assert int(jnp.sum(states.collected)) >= 0


def test_pallas_and_slab_agree_with_vmapped_core_distribution():
    """Aggregate statistics must agree across all THREE step paths: the
    vmapped per-env core (envs/collect.py — the semantics source of
    truth), the slab-math XLA batch (the default), and the fused kernel.
    Streams differ, so compare expectations, not trajectories.  Pinning
    the vmap core keeps this a real differential — slab vs kernel alone
    would compare _step_math against itself."""
    import dataclasses

    n, steps = 64, 60
    env_s = make_collect_batch(CFG, n, use_pallas=False)  # slab XLA
    env_p = make_collect_batch(CFG, n, use_pallas=True)  # fused kernel
    env_core = dataclasses.replace(env_s, step_batch=None)  # vmap core

    def total_reward(env, seed):
        states, _ = env.reset(jax.random.PRNGKey(seed))
        states, metrics = env.rollout(
            states, jax.random.PRNGKey(seed + 1), steps,
            num_actions=4, actions_shape=(2,),
        )
        return float(metrics["reward_sum"]) / (n * steps)

    rc = np.mean([total_reward(env_core, s) for s in range(3)])
    rs = np.mean([total_reward(env_s, s) for s in range(3)])
    rp = np.mean([total_reward(env_p, s) for s in range(3)])
    # Random-walk pickup rates should match within sampling noise.
    assert abs(rc - rs) < 0.03, (rc, rs)
    assert abs(rc - rp) < 0.03, (rc, rp)


def test_even_layout_no_respawn_terminates():
    cfg = CollectConfig(layout="even", respawn=False, max_steps=100)
    env = make_collect_batch(cfg, 4, use_pallas=True, auto_reset=False)
    states, _ = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    done_seen = False
    for _ in range(100):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (4, 2), 0, 4)
        states, obs, rewards, term, trunc, *_ = (*env.step(states, acts),)
        if bool(jnp.any(term | trunc)):
            done_seen = True
            break
    assert done_seen


def test_multistep_math_matches_repeated_single_steps():
    """The XLA K-step episode math (the perf headline's inner loop) must
    equal K applications of the single-step spec on the same draws.
    (Through round 4 this pinned the multi-step episode KERNEL; the
    kernel was pruned after the slab-width sweep —
    artifacts/kernel_vs_xla.md — and the ms math is now pinned to the
    spec directly.)"""
    from gym_multigrid_tpu.envs.collect import build_plan, reward_slot_tables
    from gym_multigrid_tpu.ops.pallas_collect import (
        _collect_ms_math,
        make_collect_episode_rollout,
    )

    n, K = 8, 5
    t = make_tables(CFG)
    states = _batched_states(CFG, n)
    pos = states.agent_pos.reshape(n, -1)
    A = 2
    key = jax.random.PRNGKey(9)
    acts = jax.random.randint(key, (n, K, A), 0, 4).astype(jnp.float32)
    rnd = jax.random.uniform(jax.random.PRNGKey(10), (n, K, 3))
    packed = jnp.concatenate([acts, rnd], axis=2).reshape(n, K * (A + 3))

    rwd_tab, slot_tab, _ = reward_slot_tables(CFG, build_plan(CFG))
    rects_ms = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
    C_ = states.grid_obj.shape[1]
    tril_ms = jnp.asarray(np.tril(np.ones((C_, C_), dtype=np.float32)).T)
    go, gc, gs, p, rew, cnt = _collect_ms_math(
        t, K, states.grid_obj, states.grid_color, states.grid_slot, pos,
        packed, rects_ms, tril_ms,
        jnp.asarray(np.array(rwd_tab, dtype=np.float32)),
        jnp.asarray(np.array(slot_tab, dtype=np.int32)),
        CFG.num_ball_types,
    )

    # Reference: K applications of the single-step math.
    rects = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
    C = states.grid_obj.shape[1]
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)
    go2, gc2, gs2, p2 = (
        states.grid_obj, states.grid_color, states.grid_slot, pos,
    )
    rew2 = np.zeros((n, A), dtype=np.float32)
    for k in range(K):
        go2, gc2, gs2, p2, picked = _step_math(
            t, go2, gc2, gs2, p2, acts[:, k].astype(jnp.int32), rnd[:, k],
            rects, tril,
        )
        pk = np.asarray(picked)
        for slot in range(len(rwd_tab)):
            rew2 += np.where((pk == slot), rwd_tab[slot], 0.0)

    np.testing.assert_array_equal(np.asarray(go), np.asarray(go2))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(gc2))
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(gs2))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(rew), rew2)

    # End-to-end episode rollout driver on the batch.
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    env = make_collect_batch(CFG, n)
    states, _ = env.reset(jax.random.PRNGKey(0))
    rollout = make_collect_episode_rollout(CFG, chunk=10)
    states2, metrics = rollout(states, jax.random.PRNGKey(1), CFG.max_steps)
    assert int(metrics["episodes"]) == n
    assert np.isfinite(float(metrics["reward_sum"]))
    assert int(jnp.max(states2.step_count)) == 0  # freshly reset


def test_reset_kernel_matches_spec_and_semantics():
    from gym_multigrid_tpu.envs.collect import _wall_mask, build_plan
    from gym_multigrid_tpu.ops.pallas_collect import (
        _reset_math,
        collect_reset_slab,
        make_collect_reset_batch,
        make_reset_tables,
    )

    n = 16
    rt, plan = make_reset_tables(CFG)
    wall = np.array(_wall_mask(CFG), dtype=bool)
    wall_tuple = tuple(bool(b) for b in wall)
    rects = jnp.asarray(plan.ball_rects & ~wall[None, :])
    C = CFG.num_cells
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)
    rnd = jax.random.uniform(jax.random.PRNGKey(4), (n, len(rt.ball_colors) + 2))

    want = _reset_math(rt, jnp.asarray(wall)[None, :], rects, rnd, tril)
    got = collect_reset_slab(rt, rnd, wall_tuple, rects, tril, True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # the packed-plane reset (the XLA episode rollout's in-carry reset)
    # is bit-equal to packing the three-plane spec's output
    from gym_multigrid_tpu.ops.pallas_collect import (
        _reset_math_packed,
        pack_planes,
    )

    p_got, pos_got = _reset_math_packed(
        rt, jnp.asarray(wall)[None, :], rects, rnd, tril
    )
    np.testing.assert_array_equal(
        np.asarray(p_got), np.asarray(pack_planes(*want[:3]))
    )
    np.testing.assert_array_equal(np.asarray(pos_got), np.asarray(want[3]))
    # original balls carry their placement slot
    go_np, gc_np, gs_np, _ = [np.asarray(x) for x in got]
    assert ((gs_np > 0) <= (go_np == 2)).all()

    # Batch API: correct per-partition ball counts and fixed agent spots.
    reset_batch = make_collect_reset_batch(CFG)
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    states = reset_batch(keys)
    go = np.asarray(states.grid_obj)
    gc = np.asarray(states.grid_color)
    # quadrants_respawn: 5 balls of each color 0..2, agents at (1,8),(2,8)
    for c in range(3):
        counts = ((go == 2) & (gc == c)).sum(axis=1)
        np.testing.assert_array_equal(counts, np.full(n, 5))
    np.testing.assert_array_equal(
        np.asarray(states.agent_pos),
        np.tile(np.array([[1, 8], [2, 8]]), (n, 1, 1)),
    )
    # balls only inside their partition
    rects_np = np.asarray(plan.respawn_rects, dtype=bool)
    for c in range(3):
        hit = (go == 2) & (gc == c)
        assert (hit <= rects_np[c][None, :]).all()
    # the walls are intact
    assert ((go == 1) == np.array(_wall_mask(CFG))[None, :]).all()


def test_packed_step_math_bit_equal_to_three_planes():
    """The packed-plane step (one int32 word: obj|color<<4|slot<<8) must be
    output-identical to the three-plane spec on the same draws — it is the
    XLA episode path's inner loop (_collect_ms_math packs at chunk
    boundaries for a third of the slab traffic)."""
    from gym_multigrid_tpu.ops.pallas_collect import (
        _rect_bits,
        _step_math_packed,
        pack_planes,
        unpack_planes,
    )

    n = 64
    states = _batched_states(CFG, n, seed=5)
    t = make_tables(CFG)
    rects = jnp.asarray(np.array(t.respawn_rects, dtype=np.bool_))
    C = states.grid_obj.shape[1]
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)

    go, gc, gs = states.grid_obj, states.grid_color, states.grid_slot
    pos = states.agent_pos.reshape(n, -1)
    p = pack_planes(go, gc, gs)
    # pack/unpack round trip on a freshly reset grid
    for a, b in zip(unpack_planes(p), (go, gc, gs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    key = jax.random.PRNGKey(9)
    for step in range(60):  # enough steps to hit pickups + respawns
        key, k_a, k_r = jax.random.split(key, 3)
        acts = jax.random.randint(k_a, (n, 2), 0, 4)
        rnd = jax.random.uniform(k_r, (n, 3))
        go, gc, gs, pos_w, picked_w = _step_math(
            t, go, gc, gs, pos, acts, rnd, rects, tril
        )
        p, pos, picked = _step_math_packed(
            t, p, pos, acts, rnd, _rect_bits(rects), tril
        )
        uo, uc, us = unpack_planes(p)
        np.testing.assert_array_equal(np.asarray(uo), np.asarray(go))
        np.testing.assert_array_equal(np.asarray(uc), np.asarray(gc))
        np.testing.assert_array_equal(np.asarray(us), np.asarray(gs))
        np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos_w))
        np.testing.assert_array_equal(np.asarray(picked), np.asarray(picked_w))
