"""Perf sweep over rollout paths/chunks on the current backend.

Dev tool behind bench_all.py: measures any (family, path, chunk) combo and
prints one JSON line each, so new path candidates can be compared on the
real chip before being promoted to a headline in bench_all.py.

  python scripts/sweep_paths.py --spec maze:xla-ms:25 maze:xla-step
  python scripts/sweep_paths.py --spec ctf:xla-ms:25 --batch 8192 --steps 100

Paths: xla-ms (the
same multi-step math as plain XLA), xla-step (BatchedEnv.rollout over the
slab step), pallas-step (BatchedEnv.rollout over the single-step kernel).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Only configure the bench cache when the importing process hasn't set
# its own (the test suite uses a read-only dir — see tests/conftest.py).
if not jax.config.jax_compilation_cache_dir:
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _family_cfg(family: str):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if family == "collect":
        from gym_multigrid_tpu.envs.collect import CollectConfig
        from gym_multigrid_tpu.parallel.vector import make_collect_batch

        cfg = CollectConfig(
            layout="quadrants_respawn", respawn=True, max_steps=50
        )
        return cfg, make_collect_batch, cfg.num_agents
    if family == "ctf":
        from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
        from gym_multigrid_tpu.parallel.vector import make_ctf_batch

        cfg = CtfConfig.from_map_path(
            os.path.join(root, "tests/assets/board.txt"),
            num_blue_agents=2,
            num_red_agents=2,
            variant="mvn",
            enemy_policies=(PolicySpec("fight"), PolicySpec("rw")),
            observation_option="flattened",
        )
        return cfg, make_ctf_batch, cfg.num_agents
    if family == "maze":
        from gym_multigrid_tpu.envs.maze import MazeConfig
        from gym_multigrid_tpu.parallel.vector import make_maze_batch

        cfg = MazeConfig.from_map_path(
            os.path.join(root, "tests/assets/board_maze.txt"), max_steps=100
        )
        return cfg, make_maze_batch, 1
    if family == "wildfire":
        from gym_multigrid_tpu.envs.wildfire import WildfireConfig
        from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

        cfg = WildfireConfig(size=16, max_steps=100)
        return cfg, make_wildfire_batch, cfg.num_agents
    raise ValueError(family)


def _episode_rollout(family: str, cfg, chunk: int, use_kernel: bool,
                     rnd_mode: str = "packed", prefix_mode: str = "adds"):
    if family == "collect":
        from gym_multigrid_tpu.ops.pallas_collect import (
            make_collect_episode_rollout,
        )

        return make_collect_episode_rollout(
            cfg, chunk=chunk, use_kernel=use_kernel, rnd_mode=rnd_mode,
            prefix_mode=prefix_mode,
        )
    if family == "ctf":
        from gym_multigrid_tpu.ops.pallas_ctf import make_ctf_episode_rollout

        return make_ctf_episode_rollout(
            cfg, chunk=chunk, use_kernel=use_kernel, rnd_mode=rnd_mode
        )
    if family == "maze":
        from gym_multigrid_tpu.ops.pallas_maze import make_maze_episode_rollout

        return make_maze_episode_rollout(
            cfg, chunk=chunk, use_kernel=use_kernel, rnd_mode=rnd_mode
        )
    if family == "wildfire":
        from gym_multigrid_tpu.ops.pallas_wildfire import (
            make_wildfire_episode_rollout,
        )

        return make_wildfire_episode_rollout(
            cfg, chunk=chunk, use_kernel=use_kernel, rnd_mode=rnd_mode
        )
    raise ValueError(family)


def measure_one(spec: str, batch: int, steps: int, reps: int,
                prng: str = "threefry2x32"):
    # spec = family:path[:chunk[:rnd_mode[:prefix_mode]]]
    parts = spec.split(":")
    family, path = parts[0], parts[1]
    chunk = int(parts[2]) if len(parts) >= 3 else 25
    rnd_mode = parts[3] if len(parts) >= 4 else "packed"
    prefix_mode = parts[4] if len(parts) >= 5 else "adds"
    mk_key = lambda i: jax.random.key(i, impl=prng)  # noqa: E731
    cfg, make_batch, agents = _family_cfg(family)
    env = make_batch(cfg, batch, use_pallas=(path == "pallas-step"))
    init = jax.jit(lambda k: env.reset(k)[0])

    if path == "pallas-ms":
        # pruned in round 5 — artifacts/kernel_vs_xla.md
        print(json.dumps({"spec": spec, "error": "pallas-ms pruned"}))
        return
    if path == "xla-ms":
        ro = _episode_rollout(
            family, cfg, chunk, False,
            rnd_mode=rnd_mode, prefix_mode=prefix_mode,
        )
        if ro is None:
            print(json.dumps({"spec": spec, "error": "unsupported"}))
            return
        run = jax.jit(lambda s, k: ro(s, k, steps))
    else:
        run = jax.jit(lambda s, k: env.rollout(s, k, steps))

    states = init(mk_key(0))
    t0 = time.perf_counter()
    states, metrics = run(states, mk_key(1))
    float(jax.device_get(metrics["reward_sum"]))
    compile_s = time.perf_counter() - t0

    # Honest sync: device_get of the final chained metric (NOT
    # block_until_ready — it returns early on the remote tunnel, see
    # artifacts/measurement.md); windows auto-size to >=1 s.
    calib = 2
    t0 = time.perf_counter()
    for r in range(calib):
        states, metrics = run(states, mk_key(100 + r))
    float(jax.device_get(metrics["reward_sum"]))
    per_rep = max((time.perf_counter() - t0) / calib, 1e-4)
    reps = max(reps, int(1.0 / per_rep) + 1)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for r in range(reps):
            states, metrics = run(
                states, mk_key(2 + w * reps + r)
            )
        float(jax.device_get(metrics["reward_sum"]))
        best = min(best, time.perf_counter() - t0)
    aps = batch * steps * reps * agents / best
    print(
        json.dumps(
            {
                "spec": spec,
                "agent_steps_per_s": round(aps, 1),
                "compile_s": round(compile_s, 1),
                "prng": prng,
                "backend": jax.default_backend(),
            }
        )
    )
    sys.stdout.flush()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--spec", nargs="+", required=True,
                   help="family:path[:chunk], e.g. maze:xla-ms:25")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--prng", default="threefry2x32",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"])
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    for spec in args.spec:
        measure_one(spec, args.batch, args.steps, args.reps, prng=args.prng)


if __name__ == "__main__":
    main()
