"""Per-family benchmark harness: ONE JSON line per (family, path).

Regenerates every number in the README perf table from one command (the
driver-facing single-metric harness stays in bench.py):

  python bench_all.py                 # all families, headline path each
  python bench_all.py --families collect,ctf --all-paths
  python bench_all.py --batch 256 --steps 50 --reps 2   # small smoke

Paths (scripts/sweep_paths.py is the dev tool that picked the headlines):

- "xla-ms"      K env steps per launch as one plain-XLA program with bulk
                pre-drawn randomness and fused auto-reset.  Headline for
                every family.
- "xla-step"    per-step slab math under BatchedEnv.rollout's lax.scan.

(A "pallas-ms" path — fused multi-step episode kernels — existed through
round 4 and was pruned after the slab-width sweep left it 5-8x behind
xla-ms at every VMEM-feasible point: artifacts/kernel_vs_xla.md.)

vs_baseline divides by the reference's measured single-core throughput
(BASELINE.md); Wildfire has no reference implementation, so its
vs_baseline is against the 10M/chip BASELINE.json north-star target.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax  # noqa: E402

# Respect cache settings the importing process already configured: the
# test suite reaches this module via bench_multichip.run_weak_scaling and
# points runs at its own read-only cache dir (tests/conftest.py — in-suite
# cache WRITES segfault in executable.serialize(), a jaxlib bug), so only
# standalone bench runs get the write-everything cache policy here.
if not jax.config.jax_compilation_cache_dir:
    os.makedirs("/tmp/jax_cache", exist_ok=True)
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

# Fastest measured (family, path) chunk sizes and RNG modes (per-process
# sweeps on the real chip with the HONEST timing harness, v5e @ batch
# 8192 — round 3, artifacts/measurement.md).  rnd_mode "inloop" draws
# each step's uniforms inside the unrolled body so the threefry bits
# fuse into their consumers instead of round-tripping a pre-drawn
# buffer through HBM — a 13% win where the stream dominates HBM traffic
# (wildfire: 518 f32/env/step).  Where the stream is small (collect 5,
# maze 2, ctf ~20 f32/step), bulk pre-drawing ("packed") vectorizes the
# RNG better and stays ahead (artifacts/inloop_rng.md has the full
# sweep).
MS_CHUNKS = {
    "xla-ms": {"collect": 25, "ctf": 50, "maze": 100, "wildfire": 24},
}
MS_MODE = {
    "collect": "packed",
    "ctf": "packed",
    "maze": "packed",
    "wildfire": "inloop",
}
# Steps per run() call (one host dispatch each; chunks scan inside).
# Maze's 13x13 state makes its device time per dispatch the shortest of
# the four (~1 ms at the headline rate), so tunnel dispatch-latency
# jitter dominated its measurements — observed 366M-901M across five
# same-code runs on 2026-08-20.  1000 steps/dispatch amortizes the
# jitter 5x.  Round 5 lengthened the other families on the same
# evidence (the 400-step soak windows read ~5% above the 200-step bench
# rows): collect 500, ctf/wildfire 400 — each >=6 ms device time per
# dispatch, putting the per-launch gap in the noise.
MS_STEPS = {"collect": 500, "ctf": 400, "maze": 1000, "wildfire": 400}
# Bit generator for the rollout randomness, per family (paired
# fresh-process A/B on the real chip, artifacts/rng_impl.md).  "rbg"
# rides XLA's native RngBitGenerator — ~3.5x threefry's bulk uniform
# rate on v5e (130 vs 37 Gwords/s) — and every draw inside the rollouts
# derives from the caller's key via split/fold_in, so the key's impl
# selects the generator end to end with zero env-code changes.  Wins:
# wildfire 73->138M (+89%, the stream IS the workload: ~520 f32/env/
# step), maze 570->850M (+45%), ctf 885->1042M (+18%) agent-steps/s.
# Collect measured -7% with rbg (its stream is 5 f32/env/step and its
# headline already keeps the MXU busy with prefix matmuls), so it stays
# threefry.  Distribution-identical, different stream — the framework's
# parity bar (SURVEY.md §2.3); agreement pinned in
# tests/test_xla_ms.py::test_rbg_prng_matches_threefry_distribution.
PRNG = {
    "collect": "threefry2x32",
    "ctf": "rbg",
    "maze": "rbg",
    "wildfire": "rbg",
}

# Prefix-sum form for the respawn picks inside the xla-ms step math
# (collect only — the other families' picks start from full masks or use
# the stencil form).  "matmul" = one (B,C)x(C,C) MXU matmul per pick
# instead of log2(C) shifted integer adds: XLA's cost model drops from
# 3859 to 1167 bytes/env-step and honest fresh-process throughput gains
# 16% at batch 8192 (454.7M -> 528.8M agent-steps/s).  Round 5: since
# the prefix plane now stays in the matmul dtype through its compare
# (no whole-plane int32 convert), "matmul_bf16" pays (16,128)-tile
# relayouts on every bf16 vector op and measures 498M vs f32's 680M —
# the round-4 bf16 pick inverted.  Shipped form: "matmul_mixed" (bf16
# operands, f32 accumulate/compare; 700-724M vs plain matmul's 680M on
# the 2026-08-20 sweeps, though optimized-HLO inspection shows XLA
# upcasts the operands, so the two are near-equivalent; int8 operands
# likewise).  Bit-identical outputs all forms (tests/test_xla_ms.py).
MS_PREFIX = {"collect": "matmul_mixed"}

# Expected TPU headline per family at batch 8192 (2026-08-20 round-5
# freeze).  ±30% bands: the paths ride XLA lowering details (rbg,
# fusion choices) a toolchain bump can silently change — out-of-band
# results warn loudly instead of drifting (VERDICT r4 weak #7).
EXPECTED_TPU = {
    "collect": 815e6,
    "ctf": 1110e6,
    "maze": 1400e6,
    "wildfire": 256e6,
}

# Headline path per family; the rest are measured with --all-paths.
HEADLINE = {
    "collect": "xla-ms",
    "ctf": "xla-ms",
    "maze": "xla-ms",
    "wildfire": "xla-ms",
}
ALT_PATHS = ("xla-step", "xla-ms")


def _family_cfg(family: str):
    root = os.path.dirname(os.path.abspath(__file__))
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


def _episode_rollout(family: str, cfg):
    chunk = MS_CHUNKS["xla-ms"][family]
    mode = MS_MODE[family]
    if family == "collect":
        from gym_multigrid_tpu.ops.pallas_collect import (
            make_collect_episode_rollout,
        )

        return make_collect_episode_rollout(
            cfg, chunk=chunk, rnd_mode=mode,
            prefix_mode=MS_PREFIX["collect"],
        )
    if family == "ctf":
        from gym_multigrid_tpu.ops.pallas_ctf import make_ctf_episode_rollout

        return make_ctf_episode_rollout(cfg, chunk=chunk, rnd_mode=mode)
    if family == "maze":
        from gym_multigrid_tpu.ops.pallas_maze import make_maze_episode_rollout

        return make_maze_episode_rollout(cfg, chunk=chunk, rnd_mode=mode)
    if family == "wildfire":
        from gym_multigrid_tpu.ops.pallas_wildfire import (
            make_wildfire_episode_rollout,
        )

        return make_wildfire_episode_rollout(cfg, chunk=chunk, rnd_mode=mode)
    raise ValueError(family)


def _make_runner(family: str, batch: int, steps: int, path: str,
                 partial_view: int | None = None):
    """Returns (init_fn(key)->states, run_fn(states,key)->(states,metrics),
    agents_per_env) or None if `path` is unsupported for this family here.
    run_fn advances every env `steps` steps."""
    cfg, make_batch, agents = _family_cfg(family)
    if partial_view is not None:
        # Partial-obs cost is an ENCODE cost: only the per-step path
        # computes observations every step (the episode rollouts return
        # metrics, not obs), so that is the path whose full-grid vs FOV
        # encode comparison is meaningful.
        if path != "xla-step":
            return None
        env = make_batch(cfg, batch, partial_obs_view=partial_view)
    else:
        env = make_batch(cfg, batch)
    init = jax.jit(lambda k: env.reset(k)[0])
    if path == "xla-ms":
        if family == "collect" and steps % cfg.max_steps != 0:
            return None  # episode rollout needs episode-aligned steps
        ro = _episode_rollout(family, cfg)
        if ro is None:
            return None
        return init, jax.jit(lambda s, k: ro(s, k, steps)), agents
    return init, jax.jit(lambda s, k: env.rollout(s, k, steps)), agents


def align_steps(family: str, steps: int) -> int:
    """Collect's episode rollout needs `steps` to be a multiple of its
    fixed episode length (lockstep truncation); other families take any
    step count."""
    if family != "collect":
        return steps
    ms = _family_cfg(family)[0].max_steps
    return max(ms, (steps // ms) * ms)


#: Minimum timed-window length.  Each window costs ONE host round-trip
#: (the chained device_get below), ~20-40 ms on the remote tunnel; a >=1 s
#: window keeps that overhead under ~4%.
MIN_WINDOW_S = 1.0


def _timed_windows(run, states, key, work_per_rep, windows=3):
    """Best-of-N honest timed windows.

    Synchronization is a ``device_get`` of the LAST rep's scalar metric:
    each rep's input states depend on the previous rep's output, so
    materializing the final metric on the host forces every rep to have
    actually executed.  ``jax.block_until_ready`` is NOT trustworthy on
    the remote-tunnel backend — it returns long before the computation
    finishes (measured: wildfire xla-ms "6.3B env-steps/s" under
    block_until_ready vs 35M with a real value dependency, a 180x lie;
    collect/ctf/maze were inflated 2.5-3.6x at short windows.  See
    artifacts/measurement.md).  Window length adapts so the one
    round-trip per window stays in the noise.
    """
    # Calibrate per-rep cost with a short chained window.
    calib = 2
    t0 = time.perf_counter()
    for r in range(calib):
        states, metrics = run(states, key(1000 + r))
    float(jax.device_get(metrics["reward_sum"]))
    per_rep = max((time.perf_counter() - t0) / calib, 1e-4)
    reps = max(4, int(MIN_WINDOW_S / per_rep) + 1)
    best_dt = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for r in range(reps):
            states, metrics = run(states, key(2 + w * reps + r))
        float(jax.device_get(metrics["reward_sum"]))
        best_dt = min(best_dt, time.perf_counter() - t0)
    return work_per_rep * reps / best_dt


def measure(family: str, batch: int, steps: int, reps: int, path: str,
            prng: str = "auto", partial_view: int | None = None):
    made = _make_runner(family, batch, steps, path, partial_view)
    if made is None:
        return None
    init, run, agents = made
    # prng picks the bit generator for the rollout's uniforms (the hot
    # paths consume hundreds per env step); "auto" = the family's
    # measured winner (PRNG table).  Distribution-exactness — the
    # framework's parity bar (SURVEY.md §2.3) — holds for either.
    if prng == "auto":
        prng = PRNG[family]
    key = lambda i: jax.random.key(i, impl=prng)  # noqa: E731
    states = init(key(0))
    states, metrics = run(states, key(1))  # compile + warm
    float(jax.device_get(metrics["reward_sum"]))
    return _timed_windows(run, states, key, batch * steps * agents)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="collect,ctf,maze,wildfire")
    p.add_argument("--batch", type=int, default=8192)
    # 200 steps per run call: long enough that dispatch rides behind the
    # device (and maze's 200-step unroll fits one launch), short enough
    # that one --all-paths sweep stays under ~10 min warm.
    p.add_argument(
        "--steps", type=int, default=None,
        help="steps per dispatch (default: per-family MS_STEPS)",
    )
    p.add_argument("--reps", type=int, default=4)
    p.add_argument(
        "--all-paths",
        "--xla-also",
        action="store_true",
        dest="all_paths",
        help="measure every supported path, not just the headline",
    )
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--prng",
        default="auto",
        choices=["auto", "threefry2x32", "rbg"],
        help="bit generator for the rollout uniforms (rbg = XLA-native "
        "RngBitGenerator; auto = the family's measured winner)",
    )
    p.add_argument(
        "--partial-obs",
        type=int,
        default=None,
        metavar="V",
        help="measure the per-step path with partial_obs_view=V (FOV "
        "slice/rotate/shadow-cast encode) instead of the full-grid "
        "encode — the partial-obs capability's cost row",
    )
    p.add_argument(
        "--no-isolate",
        action="store_true",
        help="measure all families in THIS process (debug only: on the "
        "one-chip tunnel, programs degrade massively once other "
        "families' executables have run in the same client — measured "
        "13.2B -> 63M agent-steps/s for wildfire xla-ms)",
    )
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    families = args.families.split(",")
    if len(families) > 1 and not args.no_isolate:
        # One subprocess per family: honest per-family numbers.
        import subprocess

        lines = []
        for family in families:
            sub = [
                sys.executable, os.path.abspath(__file__),
                "--families", family,
                "--batch", str(args.batch),
                "--reps", str(args.reps),
                "--prng", args.prng,
            ]
            if args.steps is not None:
                sub += ["--steps", str(args.steps)]
            if args.all_paths:
                sub.append("--all-paths")
            if args.cpu:
                sub.append("--cpu")
            if args.partial_obs is not None:
                sub += ["--partial-obs", str(args.partial_obs)]
            out = subprocess.run(
                sub, capture_output=True, text=True, timeout=3500
            )
            for ln in out.stdout.splitlines():
                if ln.startswith("{"):
                    print(ln)
                    sys.stdout.flush()
                    lines.append(json.loads(ln))
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-2000:] + "\n")
        return lines

    on_tpu = jax.default_backend() not in ("cpu",)
    lines = []
    for family in args.families.split(","):
        steps = align_steps(family, args.steps or MS_STEPS[family])
        if args.partial_obs is not None:
            paths = ["xla-step"]
        else:
            headline = HEADLINE[family] if on_tpu else "xla-step"
            paths = [headline]
            if args.all_paths:
                paths += [q for q in ALT_PATHS if q != headline]
        for path_name in paths:
            aps = measure(family, args.batch, steps, args.reps, path_name,
                          prng=args.prng, partial_view=args.partial_obs)
            if aps is None:
                continue
            base = BASELINES[family]
            pov = (
                f", pov{args.partial_obs}"
                if args.partial_obs is not None else ""
            )
            rec = {
                "metric": (
                    f"agent-steps/sec/chip ({family}, batch {args.batch}, "
                    f"{path_name}{pov}, {jax.default_backend()})"
                ),
                "value": round(aps, 1),
                "unit": "agent-steps/s",
                "vs_baseline": round(aps / base, 2),
            }
            if (
                on_tpu
                and path_name == HEADLINE[family]
                and args.batch == 8192
                and args.partial_obs is None
                and family in EXPECTED_TPU
            ):
                lo = 0.7 * EXPECTED_TPU[family]
                hi = 1.3 * EXPECTED_TPU[family]
                rec["band_ok"] = bool(lo <= aps <= hi)
                if not rec["band_ok"]:
                    sys.stderr.write(
                        f"WARNING: {family} headline {aps:.3g} outside "
                        f"expected band [{lo:.3g}, {hi:.3g}] — check for "
                        "a toolchain/lowering change (bench_all."
                        "EXPECTED_TPU)\n"
                    )
            lines.append(rec)
            print(json.dumps(rec))
            sys.stdout.flush()
    return lines


if __name__ == "__main__":
    main()
