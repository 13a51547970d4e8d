"""Roofline the PPO learner: observed xplane profile + FLOP/byte model.

The env simulator has a speed-of-light record per family
(artifacts/sol_report.json); this gives the FULL train step — rollout
with network forwards, GAE, minibatched clipped updates — the same
treatment at any (envs, rollout_len, minibatches) point:

  python scripts/profile_ppo.py --envs 1048576 --rollout-len 16 \
      --minibatches 128 --trace /tmp/ppo_trace --json

Prints one JSON record with:
* measured env-steps/s (honest device_get-synced windows),
* a FLOP model of the ActorCritic (forward per rollout step, forward+
  backward per update sample) -> achieved model TFLOP/s and MXU
  utilization vs the chip's bf16 peak,
* the dominant buffer traffic (rollout obs buffer bytes, per epoch),
* the observed per-op profile (utils/profiling.summarize_xplane) with
  the binding resource, same columns as the env families' records.

scripts/sol_record.py --ppo merges this into artifacts/sol_report.json.
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

#: Peak dense bf16 MXU rate per chip, FLOP/s (v5e ~197 TFLOP/s).
MXU_BF16_FLOPS = {"v5e": 197e12, "v4": 275e12, "v5p": 459e12}


def mlp_dims(obs_dim: int, hidden, num_agents: int, num_actions: int):
    """Dense layer (in, out) pairs of networks.ActorCritic."""
    dims = []
    d = obs_dim
    for h in hidden:
        dims.append((d, h))
        d = h
    dims.append((d, num_agents * num_actions))  # policy head
    dims.append((d, 1))  # value head
    return dims


def flops_per_sample(dims) -> tuple[float, float]:
    """(forward, forward+backward) matmul FLOPs for one sample."""
    fwd = sum(2.0 * a * b for a, b in dims)
    # backward: grad wrt activations + grad wrt weights, each the same
    # matmul volume as the forward -> 3x forward in total.
    return fwd, 3.0 * fwd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="ctf")
    p.add_argument("--envs", type=int, default=1 << 20)
    p.add_argument("--rollout-len", type=int, default=16)
    p.add_argument("--minibatches", type=int, default=128)
    p.add_argument("--obs-buffer-dtype", default="int8")
    p.add_argument(
        "--shuffle-blocks", type=int, default=0,
        help="PPOConfig.shuffle_blocks (0 = global shuffle)",
    )
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--chip", default="v5e")
    p.add_argument("--trace", default=None)
    p.add_argument("--json", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gym_multigrid_tpu.rl.families import make_family_batch
    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo
    from gym_multigrid_tpu.utils.profiling import summarize_xplane, trace

    env, cfg, num_actions, policy_agents = make_family_batch(
        args.family, args.envs
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
    )
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, states, key, metrics = step(
            params, opt_state, states, key
        )
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    env_steps_per_s = args.envs * args.rollout_len * args.iters / dt

    import numpy as np

    obs_shape = jax.eval_shape(
        lambda s: jax.vmap(env.encode_one)(s), states.env
    ).shape
    obs_dim = int(np.prod(obs_shape[1:]))
    dims = mlp_dims(obs_dim, net.hidden, policy_agents, num_actions)
    fwd, fwd_bwd = flops_per_sample(dims)
    samples = args.envs * args.rollout_len
    # rollout: one forward per env step (+ the rare truncation boot
    # forward, ignored); update: num_epochs (1) epochs of fwd+bwd over
    # every sample; plus one last-value forward per train step.
    flops_per_train_step = samples * fwd + samples * fwd_bwd + args.envs * fwd
    train_steps_per_s = env_steps_per_s / (args.envs * args.rollout_len)
    achieved_flops = flops_per_train_step * train_steps_per_s
    peak = MXU_BF16_FLOPS.get(args.chip, MXU_BF16_FLOPS["v5e"])

    itemsize = 1 if args.obs_buffer_dtype == "int8" else 4
    buffer_bytes = samples * obs_dim * itemsize

    rec = {
        "workload": "ppo_train",
        "family": args.family,
        "envs": args.envs,
        "rollout_len": args.rollout_len,
        "num_minibatches": args.minibatches,
        "obs_buffer_dtype": args.obs_buffer_dtype,
        "shuffle_blocks": args.shuffle_blocks or None,
        "backend": jax.default_backend(),
        "env_steps_per_s": round(env_steps_per_s, 1),
        "train_step_s": round(1.0 / train_steps_per_s, 4),
        "obs_dim": obs_dim,
        "model_flops_per_train_step": flops_per_train_step,
        "achieved_model_tflops_per_s": round(achieved_flops / 1e12, 3),
        "mxu_utilization_vs_bf16_peak": round(achieved_flops / peak, 4),
        "rollout_obs_buffer_gb": round(buffer_bytes / 1e9, 3),
        "chip": args.chip,
    }

    if args.trace:
        with trace(args.trace):
            params, opt_state, states, key, metrics = step(
                params, opt_state, states, key
            )
            float(jax.device_get(metrics["loss"]))
        prof = summarize_xplane(args.trace, top=8)
        if prof:
            rec["observed_profile"] = prof
            top_res, top_frac = next(iter(prof["bound_by"].items()))
            rec["binding_resource"] = (
                f"{top_res} ({top_frac:.0%} of observed device time)"
            )

    print(json.dumps(rec) if args.json else json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
