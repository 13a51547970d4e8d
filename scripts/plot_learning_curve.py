"""Render a training run's metrics.csv into a learning-curve PNG.

Usage: python scripts/plot_learning_curve.py [logdir] [out.png]
Defaults to artifacts/ctf_train/logs -> artifacts/ctf_train/learning_curve.png
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/ctf_train/logs"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(logdir), "learning_curve.png")
    )
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from gym_multigrid_tpu.utils.logging import read_metrics_csv

    m = read_metrics_csv(os.path.join(logdir, "metrics.csv"))
    steps = np.asarray(m["step"])

    def smooth(x, k=9):
        x = np.asarray(x, dtype=float)
        if len(x) < k:
            return x
        pad = np.concatenate([np.full(k - 1, x[0]), x])
        c = np.convolve(pad, np.ones(k) / k, mode="valid")
        return c[: len(x)]

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    # Iterations whose rollout window completed no episode log
    # ep_return_mean = 0 — drop them rather than average the zeros in
    # (episodes end every max_steps, the window is shorter, so a fixed
    # fraction of iterations have no completions).
    ret = np.asarray(m["ep_return_mean"], dtype=float)
    if "episodes" in m:
        has_ep = np.asarray(m["episodes"], dtype=float) > 0
        rsteps, ret = steps[has_ep], ret[has_ep]
    else:
        rsteps = steps
    axes[0].plot(rsteps, ret, alpha=0.25, color="C0")
    axes[0].plot(rsteps, smooth(ret), color="C0")
    if len(ret) > 1:  # short runs may have no completed-episode rows yet
        axes[0].axhline(
            np.nanmean(ret[1:10]), ls="--", c="grey", lw=1,
            label="random-policy start",
        )
        axes[0].legend(loc="lower right", fontsize=8)
    # Title from the logdir's family name (logs/<family>); the CtF
    # artifact predates generic training and logs under logs/ directly.
    family = os.path.basename(os.path.normpath(logdir))
    label = {
        "logs": "CtF MvN 2v2 vs scripted reds",
        "ctf": "CtF MvN 2v2 vs scripted reds",
    }.get(family, family)
    axes[0].set_title(f"mean episode return ({label})")
    axes[0].set_xlabel("PPO iteration")
    axes[1].plot(steps, m["reward_per_step"], alpha=0.25, color="C1")
    axes[1].plot(steps, smooth(m["reward_per_step"]), color="C1")
    axes[1].set_title("reward per env-step")
    axes[1].set_xlabel("PPO iteration")
    axes[2].plot(steps, m["entropy"], color="C2")
    axes[2].set_title("policy entropy")
    axes[2].set_xlabel("PPO iteration")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({len(steps)} iterations)")


if __name__ == "__main__":
    main()
