"""True multi-process execution test (SURVEY.md §2.4 P3).

Launches scripts/multihost_dryrun.py as a subprocess: N coordinator-connected
JAX processes on localhost CPU (gloo collectives) run the full sharded PPO
train step and the shard_map rollout with non-addressable shards, and the
launcher compares losses against a single-process run at the same global
device count.  This is the one path the in-process 8-device virtual mesh
cannot validate (multi-process jit sharding rules, global-array assembly,
cross-process psum).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_dryrun.py")


def test_two_process_train_step_matches_single_process(tmp_path):
    out = tmp_path / "multihost.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The launcher spawns its own workers with their own XLA_FLAGS; strip
    # the conftest's 8-device forcing so each worker sets its own count.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable, SCRIPT,
            "--num-processes", "2",
            "--local-devices", "2",
            "--steps", "2",
            "--timeout", "520",
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    rec = json.loads(out.read_text())
    assert rec["ok"] is True
    assert rec["num_processes"] == 2
    assert rec["global_devices"] == 4
    assert rec["workers_agree"] is True
    assert rec["rollout_episodes"] > 0
    assert all(r < 5e-2 for r in rec["loss_rel_err_per_step"])
