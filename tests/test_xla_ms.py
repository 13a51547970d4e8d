"""The XLA multi-step episode paths: prefix-mode bit-identity, the
kernel-prune deprecation shim, and RNG-mode/impl distribution agreement.

The headline episode math is pinned to the per-step spec by the
"ms math == repeated single steps" oracles in test_pallas*.py (through
round 4 that chain ran via the multi-step episode kernels, pruned after
the round-5 slab-width sweep — artifacts/kernel_vs_xla.md); here we pin
everything AROUND that math: every prefix-sum form is bit-identical,
use_kernel=True warns and degrades to the identical XLA path, and the
packed / packedbits / in-loop / rbg randomness modes agree
distributionally (SURVEY.md §2.3 parity bar).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TESTS = os.path.dirname(os.path.abspath(__file__))


def _compare(roll_k, roll_x, states, steps, int_fields, float_fields):
    key = jax.random.PRNGKey(42)
    s_k, m_k = roll_k(states, key, steps)
    s_x, m_x = roll_x(states, key, steps)
    for f in int_fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(s_k, f)), np.asarray(getattr(s_x, f)), err_msg=f
        )
    for f in float_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_k, f)),
            np.asarray(getattr(s_x, f)),
            rtol=1e-5,
            atol=1e-5,
            err_msg=f,
        )
    assert int(m_k["episodes"]) == int(m_x["episodes"])
    for name in ("reward_sum", "ep_return_sum"):
        np.testing.assert_allclose(
            float(m_k[name]), float(m_x[name]), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(m_k["run_return"]),
        np.asarray(m_x["run_return"]),
        rtol=1e-4,
        atol=1e-4,
    )


def test_collect_prefix_modes_bit_identical():
    """The XLA path's three prefix-sum forms for the respawn picks —
    log-doubling integer adds, one f32 MXU tril matmul, and the bf16
    variant — are bit-identical end to end (0/1 counts <= C are exact in
    every form), so the TPU benchmark's prefix_mode="matmul" promotion
    (3.3x less HBM traffic per XLA's cost model, +12% measured) changes
    nothing observable."""
    from gym_multigrid_tpu.envs.collect import CollectConfig
    from gym_multigrid_tpu.ops.pallas_collect import (
        make_collect_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=10)
    env = make_collect_batch(cfg, 32)
    states, _ = env.reset(jax.random.PRNGKey(7))
    key = jax.random.PRNGKey(11)
    results = {}
    for mode in ("adds", "matmul", "matmul_bf16"):
        roll = make_collect_episode_rollout(
            cfg, chunk=5, use_kernel=False, rnd_mode="packed",
            prefix_mode=mode,
        )
        results[mode] = roll(states, key, 30)
    ref_s, ref_m = results["adds"]
    for mode in ("matmul", "matmul_bf16"):
        s, m = results[mode]
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_s), jax.tree_util.tree_leaves(s)
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=mode
            )
        np.testing.assert_array_equal(
            float(ref_m["reward_sum"]), float(m["reward_sum"]), err_msg=mode
        )


def test_use_kernel_shim_warns_and_matches():
    """The pruned multi-step episode kernels left a deprecation shim:
    use_kernel=True must warn once and produce the IDENTICAL rollout to
    use_kernel=False (same key, same draws, same XLA math)."""
    import warnings

    from gym_multigrid_tpu.envs.collect import CollectConfig
    from gym_multigrid_tpu.ops.pallas_collect import (
        make_collect_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=10)
    env = make_collect_batch(cfg, 16)
    states, _ = env.reset(jax.random.PRNGKey(0))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        roll_k = make_collect_episode_rollout(cfg, chunk=5, use_kernel=True)
    assert any("pruned" in str(w.message) for w in caught)
    roll_x = make_collect_episode_rollout(cfg, chunk=5, use_kernel=False)
    _compare(
        roll_k, roll_x, states, 20,
        int_fields=("grid_obj", "grid_color", "grid_slot", "agent_pos",
                    "step_count"),
        float_fields=(),
    )


def test_xla_ms_small_board_config_works():
    # Odd small boards (8x8 = 64 cells, not a lane multiple) must build
    # and run — the XLA episode math has no shape envelope.
    from gym_multigrid_tpu.envs.wildfire import WildfireConfig
    from gym_multigrid_tpu.ops.pallas_wildfire import (
        make_wildfire_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

    cfg = WildfireConfig(size=8, max_steps=4)
    roll_x = make_wildfire_episode_rollout(cfg, chunk=2, interpret=True)
    assert roll_x is not None
    env = make_wildfire_batch(cfg, 4)
    states, _ = env.reset(jax.random.PRNGKey(0))
    s, m = roll_x(states, jax.random.PRNGKey(1), 4)
    assert np.isfinite(float(m["reward_sum"]))


@pytest.mark.parametrize("C", [64, 256])
def test_prefix_sum_pick_matches_oracle(C):
    # The masked picks run prefix sums as a tril matmul on the MXU; float
    # accumulation is exact only because entries are 0/1 and counts never
    # exceed C <= 256.  Pin against a float64 numpy oracle at the C=256
    # edge (worst case: all lanes set) plus the empty-row and r==count-1
    # boundaries.
    from gym_multigrid_tpu.ops.pallas_collect import _masked_pick

    rng = np.random.default_rng(0)
    B = 257
    mask = rng.random((B, C)) < 0.5
    mask[0] = True  # full row: count == C, the largest partial sums
    mask[1] = False  # empty row: must pick nothing
    u = rng.random((B, 1)).astype(np.float32)
    u[2] = np.float32(1.0 - 1e-7)  # r == count-1 boundary
    tril = jnp.asarray(np.tril(np.ones((C, C), dtype=np.float32)).T)

    hit = np.asarray(_masked_pick(jnp.asarray(mask), jnp.asarray(u), tril))

    count = mask.sum(axis=1, keepdims=True)
    r = np.minimum((u * count).astype(np.int64), count - 1)
    cum = mask.astype(np.float64) @ np.triu(np.ones((C, C)))
    expect = (cum.astype(np.int64) == r + 1) & mask
    np.testing.assert_array_equal(hit, expect)
    assert hit[1].sum() == 0 and hit[0].sum() == 1


def test_inloop_rnd_matches_packed_distribution():
    """The DEFAULT xla-ms mode draws its uniforms in-loop (fused out of
    HBM — the round-3 throughput win); it must agree with the pre-drawn
    packed mode distributionally: identical lockstep episode accounting
    and the same reward rate within sampling noise (the streams differ by
    design, SURVEY.md §2.3 parity bar)."""
    from gym_multigrid_tpu.envs.collect import CollectConfig
    from gym_multigrid_tpu.ops.pallas_collect import (
        make_collect_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=25)
    env = make_collect_batch(cfg, 128)
    states, _ = env.reset(jax.random.PRNGKey(0))
    steps = 100
    roll_in = make_collect_episode_rollout(
        cfg, chunk=5, use_kernel=False, rnd_mode="inloop"
    )
    roll_pk = make_collect_episode_rollout(
        cfg, chunk=5, use_kernel=False, rnd_mode="packed"
    )
    _, m_in = jax.jit(lambda s, k: roll_in(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    _, m_pk = jax.jit(lambda s, k: roll_pk(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    assert int(m_in["episodes"]) == int(m_pk["episodes"]) == 128 * 4
    r_in = float(m_in["reward_sum"])
    r_pk = float(m_pk["reward_sum"])
    assert r_in > 0 and r_pk > 0
    assert abs(r_in - r_pk) / r_pk < 0.15


def test_packedbits_matches_packed_distribution_collect():
    """rnd_mode="packedbits" packs both actions and the move-order coin
    into one u32 word per env step (12 stream bytes instead of 20) —
    distribution-identical to "packed" by construction (disjoint bits of
    one threefry word are independent fair bits), different stream.
    Same lockstep accounting, same reward rate within sampling noise,
    and the action marginals are uniform."""
    from gym_multigrid_tpu.envs.collect import CollectConfig
    from gym_multigrid_tpu.ops.pallas_collect import (
        make_collect_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_collect_batch

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=25)
    env = make_collect_batch(cfg, 128)
    states, _ = env.reset(jax.random.PRNGKey(0))
    steps = 100
    roll_pb = make_collect_episode_rollout(
        cfg, chunk=5, use_kernel=False, rnd_mode="packedbits"
    )
    roll_pk = make_collect_episode_rollout(
        cfg, chunk=5, use_kernel=False, rnd_mode="packed"
    )
    _, m_pb = jax.jit(lambda s, k: roll_pb(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    _, m_pk = jax.jit(lambda s, k: roll_pk(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    assert int(m_pb["episodes"]) == int(m_pk["episodes"]) == 128 * 4
    r_pb = float(m_pb["reward_sum"])
    r_pk = float(m_pk["reward_sum"])
    assert r_pb > 0 and r_pk > 0
    assert abs(r_pb - r_pk) / r_pk < 0.15


def test_inloop_rnd_matches_packed_distribution_wildfire():
    from gym_multigrid_tpu.envs.wildfire import WildfireConfig
    from gym_multigrid_tpu.ops.pallas_wildfire import (
        make_wildfire_episode_rollout,
    )
    from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

    cfg = WildfireConfig(size=16, max_steps=50)
    env = make_wildfire_batch(cfg, 128)
    states, _ = env.reset(jax.random.PRNGKey(0))
    steps = 100
    roll_in = make_wildfire_episode_rollout(cfg, chunk=8, use_kernel=False)
    roll_pk = make_wildfire_episode_rollout(
        cfg, chunk=8, use_kernel=False, rnd_mode="packed"
    )
    _, m_in = jax.jit(lambda s, k: roll_in(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    _, m_pk = jax.jit(lambda s, k: roll_pk(s, k, steps))(
        states, jax.random.PRNGKey(1)
    )
    e_in, e_pk = int(m_in["episodes"]), int(m_pk["episodes"])
    assert e_in > 0 and e_pk > 0
    assert abs(e_in - e_pk) / e_pk < 0.15
    r_in = float(m_in["reward_sum"]) / e_in
    r_pk = float(m_pk["reward_sum"]) / e_pk
    assert abs(r_in - r_pk) / abs(r_pk) < 0.15


@pytest.mark.parametrize("family", ["wildfire", "ctf"])
def test_rbg_prng_matches_threefry_distribution(family):
    """The TPU headline runs use rbg-typed keys (XLA's native
    RngBitGenerator — 3.5x the bulk uniform rate of threefry on the chip,
    bench_all.py PRNG / artifacts/rng_impl.md).  rbg must agree with
    threefry distributionally: same episode accounting and reward rate
    within sampling noise (streams differ by design — SURVEY.md §2.3).

    Runs in a SUBPROCESS (tests/_rbg_dist_check.py): in round 3 this exact
    check reproducibly segfaulted when run at the END of the full suite
    (rbg keys through pjit after ~230 tests of accumulated executables on
    the 8-device mesh) while passing standalone — accumulated jaxlib
    process state, not semantics.  A fresh interpreter sidesteps it and
    keeps the distributional guard in every suite run.  Root cause note:
    artifacts/suite_segfault_rootcause.md.
    """
    import json
    import subprocess
    import sys

    script = os.path.join(TESTS, "_rbg_dist_check.py")
    env = dict(os.environ)
    repo = os.path.dirname(TESTS)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, script, family],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=repo,
    )
    assert proc.returncode == 0, (
        f"rbg check subprocess failed (rc={proc.returncode})\n"
        + proc.stdout[-3000:]
        + proc.stderr[-3000:]
    )
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True
    assert rec["family"] == family
