"""Batch-size scaling sweep for the headline (xla-ms) episode paths.

Measures agent-steps/s/chip as the vmapped batch grows, per family, using
the same timed-window method as bench_all.py.  The committed record lives
in artifacts/batch_scaling.md — regenerate with:

    python scripts/sweep_batch.py --families collect,ctf,maze,wildfire

Each (family, batch) prints one JSON line.  Throughput should rise until
the slab programs saturate HBM bandwidth, then flatten; the saturation
knee tells users the smallest batch that buys full chip utilization.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import bench_all  # noqa: E402  (its import configures the compile cache)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="collect,ctf")
    p.add_argument("--batches", default="1024,4096,16384,65536")
    # Match bench_all's default window so each (family, batch) point runs
    # the same tuned program (maze's xla-ms chunk is 200).
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() not in ("cpu",)
    path = "xla-ms" if on_tpu else "xla-step"
    for family in args.families.split(","):
        steps = bench_all.align_steps(family, args.steps)
        for batch in (int(b) for b in args.batches.split(",")):
            aps = bench_all.measure(family, batch, steps, args.reps, path)
            if aps is None:
                continue
            print(
                json.dumps(
                    {
                        "family": family,
                        "batch": batch,
                        "path": path,
                        "agent_steps_per_sec": round(aps, 1),
                    }
                )
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
