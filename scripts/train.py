"""Generic PPO training for ANY env family (the CtF-specific flow with
reference-script parity lives in train_mvn_ctf_rl.py).

Usage:
  python scripts/train.py --family wildfire --iters 200 --envs 512
  python scripts/train.py --family collect --cpu --iters 50 --envs 64

The learner is the same fully jitted minibatched PPO; metrics stream to
<out>/logs (CSV + TensorBoard) and the full training state checkpoints
to <out>/models/<family>_ppo.npz for bit-exact resume.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    from gym_multigrid_tpu.rl.families import FAMILIES

    p = argparse.ArgumentParser()
    p.add_argument("--family", default="wildfire", choices=list(FAMILIES))
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--out", default="out")
    p.add_argument(
        "--opponents",
        default="rw,rw",
        help="ctf only: comma list of red PolicySpec kinds "
        "(rw/fight/capture/patrol/patrol_fight)",
    )
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
    p.add_argument(
        "--net",
        default="mlp",
        choices=("mlp", "conv"),
        help="policy torso: flattened MLP or ConvActorCritic (use with "
        "--obs-option map for CtF/Maze grid observations)",
    )
    p.add_argument(
        "--obs-option",
        default=None,
        help="ctf: flattened/map; maze: map/positional (default: the "
        "family's trained-artifact option)",
    )
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument(
        "--burn-penalty",
        type=float,
        default=1.0,
        help="wildfire only: per-ignition penalty (>= ext_reward keeps "
        "containment optimal)",
    )
    # wildfire defaults are the CONTROLLABLE config (the committed
    # learning artifact): at spread 0.3 on 16x16 the fire outruns two
    # agents and training goes nowhere (envs/wildfire.py design note).
    p.add_argument("--wf-size", type=int, default=8)
    p.add_argument("--wf-fires", type=int, default=1)
    p.add_argument("--wf-spread", type=float, default=0.15)
    p.add_argument("--wf-max-steps", type=int, default=50)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gym_multigrid_tpu.rl.families import make_family_batch
    from gym_multigrid_tpu.rl.networks import ActorCritic, ConvActorCritic
    from gym_multigrid_tpu.rl.ppo import PPOConfig
    from gym_multigrid_tpu.rl.trainer import train_loop

    env, cfg, num_actions, policy_agents = make_family_batch(
        args.family,
        args.envs,
        args.pallas,
        opponents=tuple(args.opponents.split(",")),
        obs_option=args.obs_option,
        burn_penalty=args.burn_penalty,
        wf_size=args.wf_size,
        wf_fires=args.wf_fires,
        wf_spread=args.wf_spread,
        wf_max_steps=args.wf_max_steps,
    )
    if args.net == "conv":
        net = ConvActorCritic(
            num_actions=num_actions, num_agents=policy_agents
        )
    else:
        net = ActorCritic(num_actions=num_actions, num_agents=policy_agents)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
        lr=args.lr,
        ent_coef=args.ent_coef,
        obs_buffer_dtype=args.obs_buffer_dtype,
    )
    train_loop(
        env,
        net,
        ppo_cfg,
        iters=args.iters,
        out=args.out,
        model_name=f"{args.family}_ppo",
        log_subdir=args.family,
        use_tensorboard=not args.no_tensorboard,
        label=args.family,
        iters_per_call=args.iters_per_call,
    )


if __name__ == "__main__":
    main()
