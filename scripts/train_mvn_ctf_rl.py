"""PPO training on CtF MvN — TPU-native replacement for the reference's SB3
script (reference scripts/main_mvn_ctf_rl.py).

Differences by design: instead of one Python env + torch PPO, the rollout is
a vmapped in-graph batch of CtF envs with the scripted red team compiled
into the step, and the learner is the fully jitted flax/optax PPO
(gym_multigrid_tpu/rl/ppo.py) — one XLA program per iteration.  On a
multi-chip mesh the env batch shards over 'data' (see __graft_entry__).

Usage:
  python scripts/train_mvn_ctf_rl.py [--iters N] [--envs B] [--map PATH]

Artifacts (mirroring the reference script): model checkpoint at
out/models/ctf_ppo.npz (resumed if present), rollout gif at
out/animations/ctf_ppo.gif, scalar logs printed per iteration.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--rollout-len", type=int, default=64)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--map", default="tests/assets/board.txt")
    p.add_argument(
        "--opponents",
        default="rw,rw",
        help="comma list of red PolicySpec kinds (rw/fight/capture/"
        "patrol/patrol_fight), one per red agent",
    )
    p.add_argument("--out", default="out")
    p.add_argument(
        "--iters-per-call",
        type=int,
        default=1,
        help="PPO iterations scanned per jitted dispatch; >1 amortizes "
        "the remote TPU dispatch latency (pick a divisor of --iters)",
    )
    p.add_argument(
        "--obs-buffer-dtype",
        default=None,
        help="store rollout obs in this integer dtype (e.g. int8) — 4x "
        "smaller PPO buffer, numerically identical for these small-int obs",
    )
    p.add_argument("--cpu", action="store_true", help="force CPU platform")
    p.add_argument(
        "--no-pallas",
        action="store_true",
        help="use the XLA env step even on TPU (faster cold compile)",
    )
    p.add_argument(
        "--no-tensorboard",
        action="store_true",
        help="CSV metrics only (skip TB event files)",
    )
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec
    from gym_multigrid_tpu.parallel.vector import make_ctf_batch
    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig
    from gym_multigrid_tpu.rl.trainer import train_loop

    opponents = tuple(PolicySpec(k) for k in args.opponents.split(","))
    cfg = CtfConfig.from_map_path(
        args.map,
        num_blue_agents=2,
        num_red_agents=len(opponents),
        variant="mvn",
        enemy_policies=opponents,
        observation_option="flattened",
    )
    # The fused CtF kernel needs real TPU hardware; XLA path elsewhere.
    use_pallas = jax.default_backend() not in ("cpu",) and not args.no_pallas
    env = make_ctf_batch(cfg, args.envs, auto_reset=True, use_pallas=use_pallas)
    from gym_multigrid_tpu.envs.ctf import NUM_ACTIONS

    net = ActorCritic(num_actions=NUM_ACTIONS, num_agents=cfg.num_blue_agents)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
        lr=args.lr,
        ent_coef=args.ent_coef,
        obs_buffer_dtype=args.obs_buffer_dtype,
    )
    # Shared loop: full-state resume (with batch guard + legacy layouts),
    # CSV + TensorBoard metrics with a step axis coupled to the resume
    # (reference wires tensorboard_log via SB3, main_mvn_ctf_rl.py:31).
    params, opt_state, states, key, metrics = train_loop(
        env,
        net,
        ppo_cfg,
        iters=args.iters,
        out=args.out,
        model_name="ctf_ppo",
        use_tensorboard=not args.no_tensorboard,
        iters_per_call=args.iters_per_call,
    )

    # Greedy rollout gif through the reference-compatible adapter.
    from gym_multigrid_tpu.envs import CtFMvNEnv

    from gym_multigrid_tpu.policy.ctf.heuristic import (
        CapturePolicy,
        FightPolicy,
        PatrolFightPolicy,
        PatrolPolicy,
        RwPolicy,
    )

    _policy_cls = {
        "rw": RwPolicy,
        "fight": FightPolicy,
        "capture": CapturePolicy,
        "patrol": PatrolPolicy,
        "patrol_fight": PatrolFightPolicy,
    }
    genv = CtFMvNEnv(
        num_blue_agents=2,
        num_red_agents=len(opponents),
        map_path=args.map,
        enemy_policies=[_policy_cls[s.kind]() for s in opponents],
        render_mode="rgb_array",
        observation_option="flattened",
    )
    obs, _ = genv.reset(seed=0)
    apply = jax.jit(net.apply)
    frames = [genv.render()]
    while True:
        logits, _ = apply(params, np.asarray(obs, dtype=np.float32)[None])
        actions = np.argmax(np.asarray(logits)[0], axis=-1)
        obs, reward, terminated, truncated, info = genv.step(actions)
        frames.append(genv.render())
        if terminated or truncated:
            break

    import imageio

    os.makedirs(os.path.join(args.out, "animations"), exist_ok=True)
    gif = os.path.join(args.out, "animations", "ctf_ppo.gif")
    imageio.mimsave(gif, frames, fps=5)
    print(f"saved rollout to {gif}")


if __name__ == "__main__":
    main()
