"""Profile a family's batched rollout: throughput, speed-of-light fraction,
and (optionally) a TensorBoard-loadable xplane trace.

Usage:
  python scripts/profile_rollout.py [--family collect] [--batch 8192]
      [--steps 100] [--trace /tmp/trace] [--cpu] [--pallas]

Prints one line per run with achieved agent-steps/s and the
bandwidth-bound SOL fraction (utils/profiling.py).  On CPU the SOL
numbers are meaningless (the table is calibrated for TPU HBM) — use
--cpu only to smoke the plumbing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--family",
        default="collect",
        choices=["collect", "ctf", "maze", "wildfire"],
    )
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--trace", default=None, help="xplane trace output dir")
    p.add_argument("--chip", default="v5e")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bench_multichip import build_env
    from gym_multigrid_tpu.utils.profiling import (
        sol_report,
        state_nbytes,
        trace,
    )

    env, _cfg, agents = build_env(args.family, args.batch, args.pallas)
    init = jax.jit(lambda k: env.reset(k)[0])
    run = jax.jit(lambda s, k: env.rollout(s, k, args.steps))

    states = init(jax.random.PRNGKey(0))
    states, m = run(states, jax.random.PRNGKey(1))  # compile + warm
    jax.block_until_ready(m["reward_sum"])

    if args.trace:
        with trace(args.trace):
            states, m = run(states, jax.random.PRNGKey(2))
            jax.block_until_ready(m["reward_sum"])
        print(f"trace written to {args.trace} (load in TensorBoard)")

    t0 = time.perf_counter()
    for r in range(args.reps):
        states, m = run(states, jax.random.PRNGKey(3 + r))
    jax.block_until_ready(m["reward_sum"])
    dt = time.perf_counter() - t0

    env_steps_per_s = args.batch * args.steps * args.reps / dt
    sol = sol_report(
        env_steps_per_s,
        state_nbytes(states),
        args.batch,
        chip=args.chip,
    )
    print(
        f"{args.family} batch={args.batch} "
        f"path={'pallas' if args.pallas else 'xla'} "
        f"backend={jax.default_backend()}: "
        f"{env_steps_per_s * agents:,.0f} agent-steps/s, "
        f"{sol.achieved_steps_per_s:,.0f} batched-steps/s vs "
        f"{sol.ceiling_steps_per_s:,.0f} bandwidth ceiling "
        f"({100 * sol.sol_fraction:.1f}% of {args.chip} HBM SOL, "
        f"{sol.bytes_per_step / 1e6:.1f} MB/step)"
    )


if __name__ == "__main__":
    main()
