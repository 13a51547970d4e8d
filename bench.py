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
        # in; beats the fused Pallas episode kernel and the per-step slab
        # (README table).  Round-3 fresh-process sweeps picked chunk 25
        # and prefix_mode="matmul" (respawn-pick prefix sums as one f32
        # MXU matmul instead of log-doubling adds: 3.3x less HBM traffic
        # per XLA's cost model, 245.8M -> 275.7M agent-steps/s measured,
        # bit-identical outputs — tests/test_xla_ms.py).
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

    print(
        json.dumps(
            {
                "metric": "agent-steps/sec/chip (Collect, batch 8192)",
                "value": round(agent_steps_per_sec, 1),
                "unit": "agent-steps/s",
                "vs_baseline": round(
                    agent_steps_per_sec / REFERENCE_AGENT_STEPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
