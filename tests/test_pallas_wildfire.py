"""Wildfire Pallas kernels vs their pure-jax specs (bit-equality, interpret
mode on CPU — same contract as tests/test_pallas.py for Collect)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_multigrid_tpu.envs.wildfire import (
    FIRE,
    TREE,
    WildfireConfig,
    adjacency,
    make_wildfire_step_batch,
    reset_rnd_width,
    step_rnd_width,
    wf_reset_math,
    wf_step_math,
    wf_tables,
)
from gym_multigrid_tpu.ops.pallas_wildfire import (
    _ms_math,
    make_wildfire_episode_rollout,
    wildfire_step_slab,
)
from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

CFG = WildfireConfig(size=16, max_steps=20)


def _random_slab(B, key):
    t = wf_tables(CFG)
    C = t.n_cells
    ks = jax.random.split(key, 4)
    cells = jax.random.randint(ks[0], (B, C), 0, 4)  # empty/tree/fire/burnt
    pos = jax.random.randint(ks[1], (B, 2 * t.n_agents), 0, CFG.size)
    acts = jax.random.randint(ks[2], (B, t.n_agents), 0, 5)
    rnd = jax.random.uniform(ks[3], (B, step_rnd_width(t)))
    return t, cells, pos, acts, rnd


def _assert_match(spec, kern):
    """ints (cells/pos/counters/flags) bit-equal; float rewards to 1 ulp
    (interpret mode contracts the reward multiply-adds differently)."""
    for s, k in zip(spec, kern):
        s, k = np.asarray(s), np.asarray(k)
        if np.issubdtype(s.dtype, np.integer) or s.dtype == bool:
            np.testing.assert_array_equal(s, k)
        else:
            np.testing.assert_allclose(s, k, rtol=1e-6, atol=1e-5)


def test_step_kernel_matches_spec():
    t, cells, pos, acts, rnd = _random_slab(32, jax.random.PRNGKey(0))
    adj = jnp.asarray(adjacency(CFG))
    spec = wf_step_math(t, cells, pos, acts, rnd, adj)
    kern = wildfire_step_slab(t, cells, pos, acts, rnd, adj, True)
    _assert_match(spec, kern)


def test_multistep_math_matches_repeated_single_steps():
    """The K-step episode math must equal K manual applications of the
    single-step spec + the auto-reset selects on the same draws.
    (Through round 4 this pinned the multi-step episode kernel, pruned
    after the round-5 slab-width sweep — artifacts/kernel_vs_xla.md.)"""
    t, cells, pos, acts, rnd = _random_slab(16, jax.random.PRNGKey(1))
    B = cells.shape[0]
    K = 4
    Rs, Rr = step_rnd_width(t), reset_rnd_width(t)
    stride = t.n_agents + Rs + Rr
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    a = jax.random.randint(k1, (B, K, t.n_agents), 0, 5).astype(jnp.float32)
    r = jax.random.uniform(k2, (B, K, stride - t.n_agents))
    packed = jnp.concatenate([a, r], axis=2).reshape(B, K * stride)
    sc = jax.random.randint(jax.random.PRNGKey(3), (B, 1), 0, t.max_steps)
    ext = jnp.zeros((B, 1), jnp.int32)
    run_ret = jnp.zeros((B, 1), jnp.float32)
    adj = jnp.asarray(adjacency(CFG))
    tril = jnp.asarray(np.tril(np.ones((t.n_cells, t.n_cells), np.float32)).T)

    got = _ms_math(t, K, cells, pos, sc, ext, run_ret, packed, adj, tril)

    # independent oracle: unrolled single steps + reset selects
    w_c, w_p, w_sc, w_ext, w_run = cells, pos, sc, ext, run_ret
    w_rew = jnp.zeros((B, 1), jnp.float32)
    w_ep = jnp.zeros((B, 1), jnp.float32)
    w_eps = jnp.zeros((B, 1), jnp.int32)
    for k in range(K):
        base = k * stride
        a_k = packed[:, base : base + t.n_agents].astype(jnp.int32)
        rnd_step = packed[:, base + t.n_agents : base + t.n_agents + Rs]
        rnd_reset = packed[:, base + t.n_agents + Rs : base + stride]
        c2, p2, reward, n_ext, term = wf_step_math(
            t, w_c, w_p, a_k, rnd_step, adj
        )
        sc2 = w_sc + 1
        done = (term == 1) | (sc2 >= t.max_steps)
        run2 = w_run + reward
        w_rew = w_rew + reward
        w_ep = w_ep + jnp.where(done, run2, 0.0)
        w_eps = w_eps + done.astype(jnp.int32)
        w_run = jnp.where(done, 0.0, run2)
        ext2 = w_ext + n_ext
        rc, rp = wf_reset_math(t, rnd_reset, tril)
        w_c = jnp.where(done, rc, c2)
        w_p = jnp.where(done, rp, p2)
        w_sc = jnp.where(done, 0, sc2)
        w_ext = jnp.where(done, 0, ext2)
    want = (w_c, w_p, w_sc, w_ext, w_run, w_rew, w_ep, w_eps)
    _assert_match(want, got)


def test_step_batch_pallas_equals_xla():
    """Both step_batch paths consume the same key-derived uniforms, so on
    identical states they must agree bit-for-bit."""
    env = make_wildfire_batch(CFG, num_envs=8, auto_reset=False)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(4))
    actions = jax.random.randint(jax.random.PRNGKey(5), (8, 2), 0, 5)

    xla = make_wildfire_step_batch(CFG, use_pallas=False)
    pal = make_wildfire_step_batch(CFG, use_pallas=True)
    sx, ox, rx, tx, ux, _ = xla(states, actions)
    sp, op, rp, tp, up, _ = pal(states, actions)
    np.testing.assert_array_equal(np.asarray(sx.cells), np.asarray(sp.cells))
    np.testing.assert_array_equal(
        np.asarray(sx.agent_pos), np.asarray(sp.agent_pos)
    )
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(tx), np.asarray(tp))


def test_episode_rollout_invariants():
    """The fused auto-resetting rollout keeps state sane and accounts for
    every completed episode's return."""
    env = make_wildfire_batch(CFG, num_envs=8)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(6))
    rollout = make_wildfire_episode_rollout(CFG, chunk=4)
    states, m = rollout(states, jax.random.PRNGKey(7), 48)

    cells = np.asarray(states.cells)
    assert cells.min() >= 0 and cells.max() <= 4
    pos = np.asarray(states.agent_pos)
    assert pos.min() >= 0 and pos.max() < CFG.size
    # agents stay distinct (reset places them without replacement; moves
    # block on occupied cells)
    for b in range(pos.shape[0]):
        assert len({tuple(p) for p in pos[b]}) == CFG.num_agents
    # with max_steps=20 and 48 steps, every env completed >= 2 episodes
    assert int(m["episodes"]) >= 16
    assert np.isfinite(float(m["reward_sum"]))
    assert np.isfinite(float(m["ep_return_sum"]))
    # step_count never exceeds the horizon (auto-reset fired in-kernel)
    assert int(np.asarray(states.step_count).max()) < CFG.max_steps


def test_reset_math_distribution():
    """Initial fires land on trees; agent spawns are distinct."""
    t = wf_tables(CFG)
    C = t.n_cells
    tril = jnp.asarray(np.tril(np.ones((C, C), np.float32)).T)
    rnd = jax.random.uniform(jax.random.PRNGKey(8), (64, reset_rnd_width(t)))
    cells, pos = wf_reset_math(t, rnd, tril)
    cells = np.asarray(cells)
    assert ((cells == FIRE).sum(axis=1) == t.n_fires).all()
    trees_frac = (cells == TREE).mean()
    assert 0.4 < trees_frac + (cells == FIRE).mean() < 0.8  # ~density
    pos = np.asarray(pos).reshape(64, t.n_agents, 2)
    for b in range(64):
        assert len({tuple(p) for p in pos[b]}) == t.n_agents


def test_wildfire_slab_matches_vmapped_core_distribution():
    """The slab batch (default path) must agree with the vmapped per-env
    core distributionally — fire burn-down rates and rewards (streams
    differ: the core draws per-env inside step_fn)."""
    import dataclasses

    env_s = make_wildfire_batch(CFG, num_envs=48)
    env_core = dataclasses.replace(env_s, step_batch=None)

    def stats(env, seed):
        states, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))
        states, m = jax.jit(lambda s, k: env.rollout(s, k, 40))(
            states, jax.random.PRNGKey(seed + 1)
        )
        burning = float(np.asarray(states.cells == 2).mean())
        return float(m["reward_sum"]) / (48 * 40), burning

    rs = np.mean([stats(env_s, s)[0] for s in range(2)])
    rc = np.mean([stats(env_core, s)[0] for s in range(2)])
    assert abs(rs - rc) < 0.05, (rs, rc)


def test_matmul_and_matmul_free_forms_bit_equal():
    """wf_step_math/wf_reset_math have two forms each: the Mosaic-safe
    matmul forms (adj / tril) and the plain-XLA lane-shift / log-doubling
    forms (None).  Both compute exact small integers, so whole transitions
    must be bit-equal — the XLA episode path depends on it."""
    import numpy as np
    from gym_multigrid_tpu.envs.wildfire import (
        WildfireConfig,
        adjacency,
        reset_rnd_width,
        step_rnd_width,
        wf_reset_math,
        wf_step_math,
        wf_tables,
    )

    cfg = WildfireConfig(size=11, num_agents=3, agents_index=(4, 5, 6),
                         num_initial_fires=2, max_steps=50)
    t = wf_tables(cfg)
    C = t.n_cells
    adj = jnp.asarray(adjacency(cfg))
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)
    B = 32
    key = jax.random.PRNGKey(3)

    k1, k2, key = jax.random.split(key, 3)
    rr = jax.random.uniform(k1, (B, reset_rnd_width(t)))
    cells_a, pos_a = wf_reset_math(t, rr, tril)
    cells_b, pos_b = wf_reset_math(t, rr, None)
    np.testing.assert_array_equal(np.asarray(cells_a), np.asarray(cells_b))
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))

    cells, pos = cells_a, pos_a
    for _ in range(25):
        key, k_a, k_r = jax.random.split(key, 3)
        acts = jax.random.randint(k_a, (B, t.n_agents), 0, 5)
        rnd = jax.random.uniform(k_r, (B, step_rnd_width(t)))
        out_a = wf_step_math(t, cells, pos, acts, rnd, adj)
        out_b = wf_step_math(t, cells, pos, acts, rnd, None)
        for a, b in zip(out_a, out_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        cells, pos = out_a[0], out_a[1]
