"""Reproduce the 1M-env PPO throughput record (BASELINE.json #5, the
single-chip half): one full PPO iteration — in-graph rollout with network
forwards, GAE, minibatched clipped updates — over a million concurrent CtF
envs on one chip.

    python scripts/bench_ppo_scale.py                     # the record config
    python scripts/bench_ppo_scale.py --envs 262144 --rollout-len 8

Prints one JSON line and (with --out) rewrites the committed record
artifact.  The rollout buffer is stored int8 (PPOConfig.obs_buffer_dtype
— bit-identical updates, 4x less HBM; tests/test_ppo.py), which is what
lets rollout_len grow past the old f32-buffer bound of 4 at 1M envs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=1 << 20)
    p.add_argument("--rollout-len", type=int, default=16)
    p.add_argument("--minibatches", type=int, default=128)
    p.add_argument(
        "--shuffle-blocks", type=int, default=64,
        help="epoch-shuffle block count (PPOConfig.shuffle_blocks).  64 "
        "is the record default: the flat-buffer permutation sorts were "
        "~25%% of 1M-env train-step device time and 32-128 blocks all "
        "measure ~5.55M env-steps/s vs 4.68M global (2026-08-20 A/B); "
        "0 = global shuffle",
    )
    p.add_argument("--iters", type=int, default=4, help="timed train steps")
    p.add_argument("--obs-buffer-dtype", default="int8")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None, help="write the JSON record here")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gym_multigrid_tpu.rl.families import make_family_batch
    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo

    env, cfg, num_actions, policy_agents = make_family_batch(
        "ctf", args.envs
    )
    net = ActorCritic(num_actions=num_actions, num_agents=policy_agents)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len,
        num_minibatches=args.minibatches,
        obs_buffer_dtype=args.obs_buffer_dtype or None,
        shuffle_blocks=args.shuffle_blocks or None,
    )
    init_fn, train_step = make_ppo(env, net, ppo_cfg)
    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step, donate_argnums=(1, 2))

    key = jax.random.PRNGKey(1)
    params, opt_state, states, key, metrics = step(
        params, opt_state, states, key
    )  # compile + warm
    float(jax.device_get(metrics["loss"]))

    # Honest sync: the final loss depends on every chained iteration;
    # materializing it on the host proves the work ran (block_until_ready
    # returns early on the remote tunnel — artifacts/measurement.md).
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, states, key, metrics = step(
            params, opt_state, states, key
        )
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    sps = args.envs * args.rollout_len * args.iters / dt

    rec = {
        "config": "BASELINE.json #5 (single-chip half): 1M-env CtF batch "
        "feeding the PPO learner",
        "command": f"make_family_batch('ctf', {args.envs}) + make_ppo("
        f"rollout_len={args.rollout_len}, "
        f"num_minibatches={args.minibatches}, "
        f"obs_buffer_dtype={args.obs_buffer_dtype!r}, "
        f"shuffle_blocks={args.shuffle_blocks or None}); "
        f"{args.iters} jitted train steps timed after warmup "
        f"(scripts/bench_ppo_scale.py)",
        "envs": args.envs,
        "rollout_len": args.rollout_len,
        "num_minibatches": args.minibatches,
        "obs_buffer_dtype": args.obs_buffer_dtype,
        "shuffle_blocks": args.shuffle_blocks or None,
        "env_steps_per_sec": round(sps, 1),
        "backend": jax.default_backend(),
        "run_date": __import__("datetime").date.today().isoformat(),
        "harness": "honest timing v2 (device_get of the chained loss; "
        "artifacts/measurement.md)",
        "notes": "Round 5, two trace-driven learner wins (profiles in "
        "artifacts/sol_report.json ppo_train): (1) blocked epoch shuffle "
        "(shuffle_blocks=64; identical minibatch marginals over iid "
        "envs) cut the flat-buffer permutation sorts that were ~25% of "
        "train-step device time, 4.68M -> 5.55M env-steps/s; (2) the "
        "four per-sample scalar arrays (actions/logp/advantage/return) "
        "ride ONE packed f32 row so each minibatch runs two gathers "
        "instead of five (the gather fusions were ~32% of the step), "
        "5.55M -> 6.85M.  Plus the logsumexp-form action logprob "
        "replacing the materialized log_softmax in rollout and loss.",
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f)
            f.write("\n")


if __name__ == "__main__":
    main()
