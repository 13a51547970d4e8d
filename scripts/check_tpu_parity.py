"""On-hardware kernel↔XLA parity check.

The test suite bit-compares every Pallas kernel against its pure-jax
spec in *interpret mode on CPU* (tests/test_pallas*.py); this script
closes the remaining gap by running the COMPILED kernels on the real
chip against the plain-XLA slab path from identical starts and identical
action streams, comparing every state/reward leaf per step.

Integer state (cells, positions, flags, counters) must agree exactly;
float rewards to 1e-5 (Mosaic and XLA may differ by ulps in float
reductions).  Prints one JSON line per family plus an overall verdict;
the committed record lives in artifacts/tpu_kernel_parity.json.

    python scripts/check_tpu_parity.py [--families collect,ctf,maze,wildfire]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import bench_all  # noqa: E402  (configures the compile cache)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def check_family(family: str, batch: int, steps: int, seed: int) -> dict:
    import warnings

    cfg, make_batch, agents = bench_all._family_cfg(family)
    # Out-of-envelope configs either return step_batch=None (collect/ctf
    # style) or warn and silently hand back the XLA slab path
    # (maze/wildfire style) — both must SKIP, not record a vacuous
    # XLA-vs-XLA "parity" pass.
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        env_k = make_batch(cfg, batch, use_pallas=True)
    fell_back = any("fall" in str(w.message).lower() for w in caught)
    env_x = make_batch(cfg, batch, use_pallas=False)
    if env_k.step_batch is None or fell_back:
        return {"family": family, "skipped": "no kernel for this config"}

    step_k = jax.jit(env_k.step)
    step_x = jax.jit(env_x.step)
    states_k, _ = jax.jit(env_k.reset)(jax.random.PRNGKey(seed))
    states_x, _ = jax.jit(env_x.reset)(jax.random.PRNGKey(seed))

    key = jax.random.PRNGKey(seed + 1)
    max_int_mismatch = 0
    max_float_err = 0.0
    for _ in range(steps):
        key, k = jax.random.split(key)
        actions = jax.random.randint(
            k, (batch, *env_k.actions_shape), 0, env_k.num_actions
        )
        states_k, _, rew_k, term_k, trunc_k = step_k(states_k, actions)
        states_x, _, rew_x, term_x, trunc_x = step_x(states_x, actions)
        for lk, lx in zip(
            jax.tree_util.tree_leaves(states_k),
            jax.tree_util.tree_leaves(states_x),
        ):
            a, b = np.asarray(lk), np.asarray(lx)
            if np.issubdtype(a.dtype, np.floating):
                max_float_err = max(
                    max_float_err, float(np.abs(a - b).max(initial=0.0))
                )
            else:
                max_int_mismatch = max(
                    max_int_mismatch, int((a != b).sum())
                )
        max_float_err = max(
            max_float_err,
            float(np.abs(np.asarray(rew_k) - np.asarray(rew_x)).max()),
        )
        max_int_mismatch = max(
            max_int_mismatch,
            int((np.asarray(term_k) != np.asarray(term_x)).sum()),
            int((np.asarray(trunc_k) != np.asarray(trunc_x)).sum()),
        )
    ok = max_int_mismatch == 0 and max_float_err <= 1e-5
    return {
        "family": family,
        "batch": batch,
        "steps": steps,
        "int_mismatches": max_int_mismatch,
        "max_float_err": max_float_err,
        "ok": ok,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="collect,ctf,maze,wildfire")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    results = []
    for family in args.families.split(","):
        r = check_family(family, args.batch, args.steps, args.seed)
        results.append(r)
        print(json.dumps(r), flush=True)
    all_ok = all(r.get("ok", True) for r in results)
    print(
        json.dumps(
            {
                "verdict": "PASS" if all_ok else "FAIL",
                "backend": jax.default_backend(),
            }
        )
    )
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
