"""Weak-scaling benchmark: per-chip throughput + efficiency over an n-device mesh.

The BASELINE target (BASELINE.md: >=90% weak-scaling efficiency at >=2
devices) needs an instrument: this script runs the explicit-collective
sharded rollout (parallel/shard.py) at a FIXED per-device env batch for
device counts 1..N and reports per-chip agent-steps/s and efficiency vs the
1-device run.  The env math is embarrassingly parallel — only the scalar
metric psums cross the interconnect — so efficiency measures runtime/
dispatch overhead, which is exactly what weak scaling is supposed to expose.

Hardware selection:
- Enough real TPU chips for --devices: runs on them (ICI collectives).
- Otherwise (this environment has ONE real chip behind a tunnel): falls
  back to a virtual CPU mesh via --xla_force_host_platform_device_count,
  the same mechanism the test suite uses.  The sharding program is
  identical either way; only the per-chip constant differs.

Usage:
  python bench_multichip.py [--devices 8] [--per-device-envs 512]
                            [--steps 100] [--family collect] [--json-only]

Prints ONE JSON line:
  {"metric": "weak-scaling efficiency (...)", "value": eff@N, "unit":
   "fraction", "vs_baseline": eff/0.90, "detail": {n: {...}, ...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--per-device-envs", type=int, default=512)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument(
        "--family",
        default="collect",
        choices=["collect", "ctf", "maze", "wildfire"],
    )
    p.add_argument(
        "--points",
        default=None,
        help="comma-separated device counts to measure (default: 1,2,4,..,N)",
    )
    p.add_argument(
        "--path",
        default="auto",
        choices=["auto", "xla-step", "xla-ms", "ppo-train"],
        help="program per shard: per-step slab rollout, the deep-unroll "
        "episode math (auto = the backend's headline path), or the FULL "
        "PPO train step (in-graph rollout + GAE + minibatched update — "
        "the weak-scaling instrument for BASELINE's multi-host RL half)",
    )
    p.add_argument("--json-only", action="store_true")
    p.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="pin the backend (e.g. cpu for a fair single-core baseline "
        "point against a multi-device CPU-mesh run)",
    )
    return p.parse_args(argv)


def _device_points(n: int, spec: str | None):
    if spec:
        return [int(x) for x in spec.split(",")]
    pts, d = [], 1
    while d < n:
        pts.append(d)
        d *= 2
    pts.append(n)
    return sorted(set(pts))


def build_env(family: str, num_envs: int, use_pallas: bool):
    """(BatchedEnv, cfg, agents_per_env) — the same per-family benchmark
    config as bench_all.py (one source of truth for what 'the benchmark
    config' means)."""
    import bench_all

    cfg, make_batch, agents = bench_all._family_cfg(family)
    return make_batch(cfg, num_envs, use_pallas=use_pallas), cfg, agents


def measure_point(
    family: str,
    n_devices: int,
    per_device_envs: int,
    steps: int,
    reps: int,
    use_pallas: bool,
    path: str = "xla-step",
):
    """Per-chip agent-steps/s for one mesh size at fixed per-device batch."""
    import jax

    from gym_multigrid_tpu.parallel.mesh import make_mesh, shard_batch_tree
    from gym_multigrid_tpu.parallel.shard import (
        sharded_episode_rollout,
        sharded_rollout,
    )

    num_envs = per_device_envs * n_devices
    mesh = make_mesh(n_devices, model_parallel=1)

    if path == "ppo-train":
        # The FULL training step, dp-sharded over the env batch
        # (params/optimizer replicated, gradients psum'd by GSPMD) —
        # the same pattern as __graft_entry__.dryrun_multichip, at size.
        from gym_multigrid_tpu.parallel.mesh import (
            batch_tree_shardings,
            replicated,
        )
        from gym_multigrid_tpu.rl.families import _FAMILY_SPECS
        from gym_multigrid_tpu.rl.networks import ActorCritic
        from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo

        # The SAME bench_all config every other --path measures (one
        # source of truth for the benchmark identity); the RL wiring
        # (action vocab, policy-agent count) comes from the family spec.
        env, cfg, agents = build_env(family, num_envs, use_pallas)
        num_actions, agents_fn = _FAMILY_SPECS[family]
        net = ActorCritic(num_actions=num_actions,
                          num_agents=agents_fn(cfg))
        init_fn, train_step = make_ppo(
            env, net,
            PPOConfig(
                rollout_len=steps, num_minibatches=2, dp_shards=n_devices
            ),
        )
        params, opt_state, states = init_fn(jax.random.PRNGKey(0))
        rep = replicated(mesh)
        p_sh = jax.tree_util.tree_map(lambda _: rep, params)
        o_sh = jax.tree_util.tree_map(lambda _: rep, opt_state)
        s_sh = batch_tree_shardings(states, mesh)
        params = jax.device_put(params, p_sh)
        opt_state = jax.device_put(opt_state, o_sh)
        states = jax.device_put(states, s_sh)
        key = jax.device_put(jax.random.PRNGKey(1), rep)
        step_fn = jax.jit(
            train_step,
            in_shardings=(p_sh, o_sh, s_sh, rep),
            donate_argnums=(1, 2),
        )
        params, opt_state, states, key, m = step_fn(
            params, opt_state, states, key
        )  # compile + warm
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, states, key, m = step_fn(
                params, opt_state, states, key
            )
        # Honest sync: materialize the chained loss (block_until_ready
        # returns early on remote backends — artifacts/measurement.md).
        float(jax.device_get(m["loss"]))
        dt = time.perf_counter() - t0
        agent_steps = num_envs * steps * reps * agents
        return {
            "devices": n_devices,
            "envs": num_envs,
            "agent_steps_per_sec": agent_steps / dt,
            "per_chip": agent_steps / dt / n_devices,
        }

    env, cfg, agents = build_env(family, num_envs, use_pallas)

    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    states = shard_batch_tree(states, mesh)
    if path == "xla-ms":
        import bench_all

        ro = bench_all._episode_rollout(family, cfg)
        rollout = sharded_episode_rollout(ro, mesh)
    else:
        rollout = sharded_rollout(env, mesh)
    run = jax.jit(lambda s, k: rollout(s, k, steps))

    states, metrics = run(states, jax.random.PRNGKey(1))  # compile + warm
    float(jax.device_get(metrics["reward_sum"]))
    t0 = time.perf_counter()
    for r in range(reps):
        states, metrics = run(states, jax.random.PRNGKey(2 + r))
    float(jax.device_get(metrics["reward_sum"]))
    dt = time.perf_counter() - t0

    agent_steps = num_envs * steps * reps * agents
    return {
        "devices": n_devices,
        "envs": num_envs,
        "agent_steps_per_sec": agent_steps / dt,
        "per_chip": agent_steps / dt / n_devices,
    }


def run_weak_scaling(
    family: str = "collect",
    devices: int = 8,
    per_device_envs: int = 512,
    steps: int = 100,
    reps: int = 4,
    points: list[int] | None = None,
    verbose: bool = True,
    path: str = "auto",
):
    """Measure each device count; return (results_by_n, efficiency@max)."""
    import bench_all
    import jax

    backend = jax.default_backend()
    use_pallas = backend not in ("cpu",)
    if path == "auto":
        # The per-backend headline path: deep-unroll episode math on TPU,
        # per-step slab on the CPU mesh (matches bench_all's HEADLINE).
        path = "xla-ms" if use_pallas else "xla-step"
    if path != "ppo-train":
        # xla-ms chunking needs an aligned horizon; a PPO rollout_len
        # has no such constraint — aligning would silently override
        # the user's --steps.
        steps = bench_all.align_steps(family, steps)
    pts = points or _device_points(devices, None)
    assert max(pts) <= len(jax.devices()), (
        f"need {max(pts)} devices, have {len(jax.devices())} ({backend})"
    )

    results = {}
    for n in pts:
        r = measure_point(
            family, n, per_device_envs, steps, reps, use_pallas, path
        )
        r["efficiency"] = r["per_chip"] / results[pts[0]]["per_chip"] if results else 1.0
        results[n] = r
        if verbose:
            print(
                f"  {family} @ {n} dev ({backend}): "
                f"{r['agent_steps_per_sec']:,.0f} agent-steps/s total, "
                f"{r['per_chip']:,.0f}/chip, eff {r['efficiency']:.3f}",
                file=sys.stderr,
            )
    eff = results[max(pts)]["efficiency"]
    return results, eff


def main(argv=None):
    args = parse_args(argv)
    # The virtual-device flag must be set before jax initializes; harmless
    # when real TPUs end up selected (it only affects the cpu platform).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

    import jax

    # Respect cache settings the host process already configured: the
    # test suite points runs at its own read-only dir (tests/conftest.py
    # — a concurrent TPU bench must never share writers with it, and
    # in-suite writes segfault in executable.serialize()), so only
    # standalone runs get the write-everything bench cache policy.
    if not jax.config.jax_compilation_cache_dir:
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif (
        args.platform != "tpu"
        and args.devices > 1
        and os.environ.get("BENCH_REAL_MULTICHIP") != "1"
    ):
        # This environment exposes ONE real chip behind a tunnel, and the
        # platform choice must flip BEFORE any jax op initializes the
        # backend — so multi-chip points default to the virtual CPU mesh.
        # On a real pod slice set BENCH_REAL_MULTICHIP=1 to use the TPUs.
        jax.config.update("jax_platforms", "cpu")
        print(
            f"using a {args.devices}-device virtual CPU mesh "
            "(set BENCH_REAL_MULTICHIP=1 on real multi-chip hardware)",
            file=sys.stderr,
        )

    results, eff = run_weak_scaling(
        family=args.family,
        devices=args.devices,
        per_device_envs=args.per_device_envs,
        steps=args.steps,
        reps=args.reps,
        path=args.path,
        points=_device_points(args.devices, args.points),
        verbose=not args.json_only,
    )
    n_max = max(results)
    cores = os.cpu_count() or 1
    if jax.default_backend() == "cpu" and n_max > cores:
        # On the virtual mesh each "device" is a host thread; past the
        # physical core count the efficiency measures oversubscription of
        # this machine, not the sharding program.  Real-ICI numbers need
        # real chips (BENCH_REAL_MULTICHIP=1 on a pod slice).
        print(
            f"note: {n_max} virtual devices > {cores} physical cores; "
            "efficiency past the core count reflects host oversubscription",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": (
                    f"weak-scaling efficiency ({args.family}, "
                    f"{n_max} devices, {args.per_device_envs} envs/device, "
                    f"{jax.default_backend()})"
                ),
                "value": round(eff, 4),
                "unit": "fraction",
                "vs_baseline": round(eff / 0.90, 3),
                "physical_cores": cores,
                "detail": {
                    str(n): {
                        "agent_steps_per_sec": round(r["agent_steps_per_sec"], 1),
                        "per_chip": round(r["per_chip"], 1),
                        "efficiency": round(r["efficiency"], 4),
                    }
                    for n, r in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
