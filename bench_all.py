"""Per-family benchmark harness: ONE JSON line per (family, path).

Regenerates every number in the README perf table from one command (the
driver-facing single-metric harness stays in bench.py):

  python bench_all.py                 # all families, best path per backend
  python bench_all.py --families collect,ctf --xla-also
  python bench_all.py --batch 256 --steps 50 --reps 2   # small smoke

Paths: "pallas" = fused kernels (real TPU only; ops/pallas_*.py),
"xla" = the plain vmapped lax.scan rollout.  vs_baseline divides by the
reference's measured single-core throughput (BASELINE.md); Wildfire has no
reference implementation, so its vs_baseline is against the 10M/chip
BASELINE.json north-star target instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# Reference agent-steps/s on one CPU core (BASELINE.md; CtF is the 1v1
# number — MvN 2v2 is strictly slower upstream, so this is conservative).
BASELINES = {
    "collect": 9_400.0,
    "ctf": 1_614.0,
    "maze": 4_525.0,
    "wildfire": 10_000_000.0,  # north-star target, no reference code exists
}


def _make_runner(family: str, batch: int, steps: int, use_pallas: bool):
    """Returns (init_fn(key)->states, run_fn(states,key)->(states,metrics),
    agents_per_env).  run_fn advances every env `steps` steps."""
    from bench_multichip import build_env

    if family == "collect" and use_pallas:
        # Fused multi-step episode kernel (step+reset in one launch).
        from gym_multigrid_tpu.envs.collect import CollectConfig
        from gym_multigrid_tpu.ops.pallas_collect import (
            make_collect_episode_rollout,
        )
        from gym_multigrid_tpu.parallel.vector import make_collect_batch

        cfg = CollectConfig(
            layout="quadrants_respawn", respawn=True, max_steps=50
        )
        env = make_collect_batch(cfg, batch)
        rollout = make_collect_episode_rollout(cfg)
        assert steps % cfg.max_steps == 0, "steps must align with episodes"
        return (
            jax.jit(lambda k: env.reset(k)[0]),
            jax.jit(lambda s, k: rollout(s, k, steps)),
            cfg.num_agents,
        )

    if family == "ctf" and use_pallas:
        # Auto-resetting multi-step episode kernel (10 steps per launch)
        # beats stepping the single-step kernel under scan.
        from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
        from gym_multigrid_tpu.ops.pallas_ctf import make_ctf_episode_rollout
        from gym_multigrid_tpu.parallel.vector import make_ctf_batch

        cfg = CtfConfig.from_map_path(
            os.path.join(os.path.dirname(__file__), "tests/assets/board.txt"),
            num_blue_agents=2,
            num_red_agents=2,
            variant="mvn",
            enemy_policies=(PolicySpec("fight"), PolicySpec("rw")),
            observation_option="flattened",
        )
        env = make_ctf_batch(cfg, batch)
        rollout = make_ctf_episode_rollout(cfg)
        return (
            jax.jit(lambda k: env.reset(k)[0]),
            jax.jit(lambda s, k: rollout(s, k, steps)),
            cfg.num_agents,
        )

    if family == "maze" and use_pallas:
        # Fused multi-step kernel with in-kernel auto-reset.
        from gym_multigrid_tpu.envs.maze import MazeConfig
        from gym_multigrid_tpu.ops.pallas_maze import make_maze_episode_rollout
        from gym_multigrid_tpu.parallel.vector import make_maze_batch

        cfg = MazeConfig.from_map_path(
            os.path.join(
                os.path.dirname(__file__), "tests/assets/board_maze.txt"
            ),
            max_steps=100,
        )
        env = make_maze_batch(cfg, batch)
        rollout = make_maze_episode_rollout(cfg)
        return (
            jax.jit(lambda k: env.reset(k)[0]),
            jax.jit(lambda s, k: rollout(s, k, steps)),
            1,
        )

    if family == "wildfire" and use_pallas:
        # Fused multi-step kernel with in-kernel per-env auto-reset.
        from gym_multigrid_tpu.envs.wildfire import WildfireConfig
        from gym_multigrid_tpu.ops.pallas_wildfire import (
            make_wildfire_episode_rollout,
        )
        from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

        cfg = WildfireConfig(size=16, max_steps=100)
        env = make_wildfire_batch(cfg, batch)
        rollout = make_wildfire_episode_rollout(cfg)
        return (
            jax.jit(lambda k: env.reset(k)[0]),
            jax.jit(lambda s, k: rollout(s, k, steps)),
            cfg.num_agents,
        )

    env, agents = build_env(family, batch, use_pallas)
    return (
        jax.jit(lambda k: env.reset(k)[0]),
        jax.jit(lambda s, k: env.rollout(s, k, steps)),
        agents,
    )


def measure(family: str, batch: int, steps: int, reps: int, use_pallas: bool):
    init, run, agents = _make_runner(family, batch, steps, use_pallas)
    states = init(jax.random.PRNGKey(0))
    states, metrics = run(states, jax.random.PRNGKey(1))  # compile + warm
    jax.block_until_ready(metrics["reward_sum"])
    t0 = time.perf_counter()
    for r in range(reps):
        states, metrics = run(states, jax.random.PRNGKey(2 + r))
    jax.block_until_ready(metrics["reward_sum"])
    dt = time.perf_counter() - t0
    agent_steps = batch * steps * reps * agents
    return agent_steps / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="collect,ctf,maze,wildfire")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument(
        "--xla-also",
        action="store_true",
        help="on TPU, also measure the plain XLA path where a kernel exists",
    )
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    on_tpu = jax.default_backend() not in ("cpu",)
    lines = []
    for family in args.families.split(","):
        # Collect's fused episode kernel needs episode-aligned steps.
        steps = args.steps
        if family == "collect" and on_tpu and steps % 50 != 0:
            steps = max(50, (steps // 50) * 50)
        paths = []
        from gym_multigrid_tpu.ops import kernels_available

        has_kernel = on_tpu and kernels_available(family)
        if family in ("wildfire", "ctf") and on_tpu:
            # The slab-math XLA paths measure faster than the fused
            # kernels here (wildfire 62.7M vs 32.9M, CtF 106.1M vs 57.7M
            # agent-steps/s on v5e @ 8192) — XLA is the headline path; the
            # compiler pipelines the pre-drawn uniform stream better than
            # the VMEM-resident kernels.
            paths.append(("xla", False))
            if args.xla_also and has_kernel:
                paths.append(("pallas", True))
        elif has_kernel:
            paths.append(("pallas", True))
            if args.xla_also:
                paths.append(("xla", False))
        else:
            paths.append(("xla", False))
        for path_name, use_pallas in paths:
            aps = measure(family, args.batch, steps, args.reps, use_pallas)
            base = BASELINES[family]
            rec = {
                "metric": (
                    f"agent-steps/sec/chip ({family}, batch {args.batch}, "
                    f"{path_name}, {jax.default_backend()})"
                ),
                "value": round(aps, 1),
                "unit": "agent-steps/s",
                "vs_baseline": round(aps / base, 2),
            }
            lines.append(rec)
            print(json.dumps(rec))
            sys.stdout.flush()
    return lines


if __name__ == "__main__":
    main()
