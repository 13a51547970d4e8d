"""Standalone rbg-vs-threefry distribution check, run in a fresh process.

Why a subprocess: round 3's full suite reproducibly SIGSEGV'd at the END
of the run inside this check (pjit of the episode rollout with rbg-typed
keys, after ~230 prior tests had loaded hundreds of executables on the
8-device virtual CPU mesh).  The identical check passes standalone —
the crash is accumulated-process-state fragility in jaxlib, not a
semantics bug (root cause note: artifacts/suite_segfault_rootcause.md).
tests/test_xla_ms.py therefore launches this script per family; a fresh
interpreter has none of the accumulated state and also may safely WRITE
the persistent compile cache (the in-suite process must not — see
tests/conftest.py).

Usage: python tests/_rbg_dist_check.py <wildfire|ctf>
Prints one JSON line {"ok": true, ...} and exits 0 on success.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# Fresh process: cache writes are safe here (the serialize() segfault only
# manifests late in a long-lived process with hundreds of executables).
_cache = "/tmp/jax_cache_tests"
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

TESTS = os.path.dirname(os.path.abspath(__file__))


def run_check(family: str) -> dict:
    steps = 100
    if family == "wildfire":
        from gym_multigrid_tpu.envs.wildfire import WildfireConfig
        from gym_multigrid_tpu.ops.pallas_wildfire import (
            make_wildfire_episode_rollout,
        )
        from gym_multigrid_tpu.parallel.vector import make_wildfire_batch

        cfg = WildfireConfig(size=16, max_steps=50)
        env = make_wildfire_batch(cfg, 128)
        roll = make_wildfire_episode_rollout(cfg, chunk=8, use_kernel=False)
    elif family == "ctf":
        from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
        from gym_multigrid_tpu.ops.pallas_ctf import make_ctf_episode_rollout
        from gym_multigrid_tpu.parallel.vector import make_ctf_batch

        cfg = CtfConfig.from_map_path(
            os.path.join(TESTS, "assets/board.txt"),
            num_blue_agents=2,
            num_red_agents=2,
            variant="mvn",
            enemy_policies=(PolicySpec("fight"), PolicySpec("rw")),
            observation_option="flattened",
        )
        env = make_ctf_batch(cfg, 128)
        roll = make_ctf_episode_rollout(
            cfg, chunk=10, use_kernel=False, rnd_mode="packed"
        )
    else:  # pragma: no cover - caller passes a known family
        raise SystemExit(f"unknown family {family!r}")

    run = jax.jit(lambda s, k, K: roll(s, k, K), static_argnums=2)
    # Per-seed reward/episode is noisy (threefry's own seed-to-seed spread
    # is ~19% for wildfire at this size), so compare 3-seed MEANS.
    eps, rates = {}, {}
    for impl in ("threefry2x32", "rbg"):
        e_tot, r_tot = 0, 0.0
        for seed in range(3):
            states, _ = env.reset(jax.random.key(seed, impl=impl))
            _, m = run(states, jax.random.key(100 + seed, impl=impl), steps)
            e_tot += int(m["episodes"])
            r_tot += float(m["reward_sum"])
        eps[impl], rates[impl] = e_tot, r_tot / e_tot
    e_tf, e_rb = eps["threefry2x32"], eps["rbg"]
    assert e_tf > 0 and e_rb > 0
    assert abs(e_rb - e_tf) / e_tf < 0.1, (e_tf, e_rb)
    r_tf, r_rb = rates["threefry2x32"], rates["rbg"]
    assert abs(r_rb - r_tf) / max(abs(r_tf), 1e-6) < 0.15, (r_tf, r_rb)
    return {
        "ok": True,
        "family": family,
        "episodes": eps,
        "reward_rates": rates,
    }


if __name__ == "__main__":
    print(json.dumps(run_check(sys.argv[1])))
