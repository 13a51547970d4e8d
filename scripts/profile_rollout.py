"""Profile a family's batched rollout: throughput, speed-of-light fraction,
and (optionally) a TensorBoard-loadable xplane trace.

Usage:
  python scripts/profile_rollout.py [--family collect] [--batch 8192]
      [--steps 200] [--path xla-ms|xla-step] [--trace DIR]
      [--cpu] [--json]

Per run prints achieved agent-steps/s and the bandwidth-bound SOL fraction
(utils/profiling.py).  The bytes/step model counts the traffic the design
REQUIRES: state planes read+written once per env step (amortized over the
multi-step chunk for the ms paths) plus the pre-drawn uniform/action stream
written once and read once.  Intermediates XLA chooses to materialize are
not modeled — so the reported fraction is a lower bound on distance from
the true roofline (achieved / designed-traffic ceiling).

On CPU the SOL numbers are meaningless (the table is calibrated for TPU
HBM) — use --cpu only to smoke the plumbing.  scripts/sol_record.py runs
this across families/paths and commits artifacts/sol_report.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def designed_bytes_per_env_step(family: str, cfg, path: str, chunk: int) -> int:
    """Mandatory HBM bytes per env step under `path` (see module doc)."""
    if family == "collect":
        # ms draw layout: A action floats + 3 uniforms per env step
        # (ops/pallas_collect.make_collect_episode_rollout).
        n = cfg.size * cfg.size
        state = 3 * n * 4 + cfg.num_agents * 2 * 4 + 3 * 4 + 8
        rand = (cfg.num_agents + 3) * 4
    elif family == "ctf":
        from gym_multigrid_tpu.ops.pallas_ctf import (
            make_ctf_ktables,
            ms_stride,
        )

        t = make_ctf_ktables(cfg)
        a = cfg.num_agents
        state = a * 2 * 4 + a * 4 + a + a + 4 + 8
        rand = ms_stride(t) * 4
    elif family == "maze":
        from gym_multigrid_tpu.ops.pallas_maze import MS_STRIDE

        state = 2 * 4 + 4 + 4 + 8
        rand = MS_STRIDE * 4
    elif family == "wildfire":
        from gym_multigrid_tpu.envs.wildfire import (
            reset_rnd_width,
            step_rnd_width,
            wf_tables,
        )

        t = wf_tables(cfg)
        state = t.n_cells * 4 + t.n_agents * 2 * 4 + 4 + 4 + 8
        rand = (
            t.n_agents + step_rnd_width(t) + reset_rnd_width(t)
        ) * 4
    else:
        raise ValueError(family)

    if path == "xla-ms":
        from bench_all import MS_MODE

        if MS_MODE.get(family) == "inloop":
            # In-loop RNG: the uniform stream fuses into its consumers and
            # never touches HBM (artifacts/inloop_rng.md).
            rand = 0
        # State crosses HBM once per CHUNK (the model stays the designed
        # minimum); uniforms are written once + read once per step.
        return int(2 * state / max(chunk, 1) + 2 * rand)
    return int(2 * state + 2 * rand)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--family",
        default="collect",
        choices=["collect", "ctf", "maze", "wildfire"],
    )
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument(
        "--path",
        default="xla-ms",
        choices=["xla-step", "xla-ms"],
    )
    p.add_argument("--trace", default=None, help="xplane trace output dir")
    p.add_argument("--chip", default="v5e")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json", action="store_true")
    p.add_argument(
        "--prng",
        default="auto",
        choices=["auto", "threefry2x32", "rbg"],
        help="bit generator for the rollout uniforms; auto = the family's "
        "shipping default (bench_all.PRNG, artifacts/rng_impl.md)",
    )
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bench_all import (
        MS_CHUNKS,
        PRNG,
        _family_cfg,
        _make_runner,
        align_steps,
    )
    from gym_multigrid_tpu.utils.profiling import (
        HBM_BYTES_PER_S,
        trace,
    )

    steps = align_steps(args.family, args.steps)
    made = _make_runner(args.family, args.batch, steps, args.path)
    if made is None:
        print(f"path {args.path} unsupported for {args.family} here")
        return 1
    init, run, agents = made
    cfg = _family_cfg(args.family)[0]
    chunk = MS_CHUNKS.get(args.path, {}).get(args.family, 1)
    prng = PRNG[args.family] if args.prng == "auto" else args.prng
    mk_key = lambda i: jax.random.key(i, impl=prng)  # noqa: E731

    states = init(mk_key(0))
    # XLA's own cost model for the compiled rollout: total flops and HBM
    # bytes it expects to move per launch — the mechanical check behind the
    # binding-resource classification (designed-traffic says what the math
    # REQUIRES; cost_analysis says what the compiled program actually
    # schedules, intermediates included).
    compiled = jax.jit(run).lower(states, mk_key(1)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    launch_env_steps = args.batch * steps
    xla_flops_per_env_step = float(ca.get("flops", 0.0)) / launch_env_steps
    xla_bytes_per_env_step = (
        float(ca.get("bytes accessed", 0.0)) / launch_env_steps
    )

    states, m = run(states, mk_key(1))  # compile + warm
    float(jax.device_get(m["reward_sum"]))

    observed = None
    if args.trace:
        with trace(args.trace):
            states, m = run(states, mk_key(2))
            float(jax.device_get(m["reward_sum"]))
        print(f"trace written to {args.trace} (load in TensorBoard)")
        from gym_multigrid_tpu.utils.profiling import summarize_xplane

        observed = summarize_xplane(args.trace)

    # Honest timing: device_get of the final chained metric (NOT
    # block_until_ready, which returns early on the remote-tunnel backend
    # — artifacts/measurement.md), windows auto-sized to >=1 s.
    calib = 2
    t0 = time.perf_counter()
    for r in range(calib):
        states, m = run(states, mk_key(100 + r))
    float(jax.device_get(m["reward_sum"]))
    per_rep = max((time.perf_counter() - t0) / calib, 1e-4)
    reps = max(args.reps, int(1.0 / per_rep) + 1)
    best_dt = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for r in range(reps):
            states, m = run(states, mk_key(3 + 31 * w + r))
        float(jax.device_get(m["reward_sum"]))
        best_dt = min(best_dt, time.perf_counter() - t0)

    env_steps_per_s = args.batch * steps * reps / best_dt
    bytes_per_env_step = designed_bytes_per_env_step(
        args.family, cfg, args.path, chunk
    )
    bw = HBM_BYTES_PER_S.get(args.chip, HBM_BYTES_PER_S["v5e"])
    ceiling_env_steps = bw / bytes_per_env_step
    frac = env_steps_per_s / ceiling_env_steps
    rec = {
        "family": args.family,
        "path": args.path,
        "batch": args.batch,
        "backend": jax.default_backend(),
        "prng": prng,
        "agent_steps_per_s": round(env_steps_per_s * agents, 1),
        "env_steps_per_s": round(env_steps_per_s, 1),
        "designed_bytes_per_env_step": bytes_per_env_step,
        "hbm_ceiling_env_steps_per_s": round(ceiling_env_steps, 1),
        "sol_fraction": round(frac, 4),
        # XLA cost-model view of the same program (intermediates included).
        "xla_flops_per_env_step": round(xla_flops_per_env_step, 1),
        "xla_bytes_per_env_step": round(xla_bytes_per_env_step, 1),
        "achieved_hbm_gb_per_s": round(
            env_steps_per_s * xla_bytes_per_env_step / 1e9, 1
        ),
        "achieved_gflops_per_s": round(
            env_steps_per_s * xla_flops_per_env_step / 1e9, 1
        ),
        "xla_traffic_sol_fraction": round(
            env_steps_per_s * xla_bytes_per_env_step / bw, 4
        ),
        "chip": args.chip,
    }
    if observed is not None:
        # Observed device timeline (xprof over the jax.profiler xplane):
        # per-op self time + the profiler's own per-op roofline labels —
        # the evidence behind the binding-resource classification.
        rec["observed_profile"] = observed
    if args.json:
        print(json.dumps(rec))
    else:
        print(
            f"{args.family} batch={args.batch} path={args.path} "
            f"backend={jax.default_backend()}: "
            f"{rec['agent_steps_per_s']:,.0f} agent-steps/s, "
            f"{env_steps_per_s:,.0f} env-steps/s vs "
            f"{ceiling_env_steps:,.0f} designed-traffic ceiling "
            f"({100 * frac:.1f}% of {args.chip} HBM SOL, "
            f"{bytes_per_env_step} B/env-step)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
