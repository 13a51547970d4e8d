"""Evaluate a trained PPO checkpoint on any env family.

The reference's only post-training evaluation is one host-driven episode
saved as a gif (reference scripts/main_mvn_ctf_rl.py:39-52).  This runs
thousands of batched episodes through the jitted env instead and reports
the statistics that matter — mean episode return/length and, for CtF,
win/loss/draw rates against the scripted red team — plus the same gif
artifact on request.

Usage:
  python scripts/evaluate.py --family ctf --model out/models/ctf_ppo \\
      --envs 256 --cpu
  python scripts/evaluate.py --family wildfire --random --cpu   # baseline
  python scripts/evaluate.py --family ctf --model artifacts/ctf_train/models/ctf_ppo \\
      --gif out/animations/ctf_eval.gif --cpu

Prints ONE JSON line with the results (plus a --random baseline column
when requested).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_policy_gif(family, cfg, net, params, path, *, fps=5, seed=0):
    """Greedy single-env rollout rendered with the on-device sprite-bank
    renderer (render/tiles.py) — the same frames the batched pipeline
    produces, so the gif shows exactly what the policy was trained on."""
    import numpy as np

    from gym_multigrid_tpu.render import tiles

    render_fn = {
        "collect": tiles.render_collect,
        "ctf": tiles.render_ctf,
        "maze": tiles.render_maze,
        "wildfire": tiles.render_wildfire,
    }[family]
    # A fresh batch of ONE env without auto-reset (the episode should end
    # on screen, not silently restart).
    from gym_multigrid_tpu.parallel import vector as pv

    maker = {
        "collect": pv.make_collect_batch,
        "ctf": pv.make_ctf_batch,
        "maze": pv.make_maze_batch,
        "wildfire": pv.make_wildfire_batch,
    }[family]
    env = maker(cfg, 1, auto_reset=False)
    step = jax.jit(env.step)
    states, obs = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    apply = jax.jit(net.apply)

    def frame(states):
        one = jax.tree_util.tree_map(lambda x: x[0], states)
        return np.asarray(render_fn(cfg, one))

    frames = [frame(states)]
    for _ in range(cfg.max_steps):
        obs = jax.vmap(env.encode_one)(states)
        logits, _ = apply(params, obs)
        actions = jax.numpy.argmax(logits, axis=-1).astype(jax.numpy.int32)
        states, _, _, term, trunc = step(states, actions)
        frames.append(frame(states))
        if bool(term[0] | trunc[0]):
            break

    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, frames, fps=fps)
    print(f"saved rollout to {path}", file=sys.stderr)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="ctf",
                   choices=("collect", "ctf", "maze", "wildfire"))
    p.add_argument("--model", default=None,
                   help="checkpoint path without .npz (default "
                   "out/models/<family>_ppo; ctf_ppo for ctf)")
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=0,
                   help="rollout length (default 2*max_steps so every env "
                   "completes at least one episode)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample", action="store_true",
                   help="sample the policy instead of greedy argmax")
    p.add_argument("--random", action="store_true",
                   help="also report a random-policy baseline column")
    p.add_argument("--gif", default=None,
                   help="save a greedy single-episode gif to this path")
    p.add_argument("--map", default=None)
    p.add_argument("--opponents", default="rw,rw",
                   help="ctf: comma list of red PolicySpec kinds")
    p.add_argument("--wf-size", type=int, default=8)
    p.add_argument("--wf-fires", type=int, default=1)
    p.add_argument("--wf-spread", type=float, default=0.15)
    p.add_argument("--wf-max-steps", type=int, default=50)
    p.add_argument("--burn-penalty", type=float, default=1.0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--pallas", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gym_multigrid_tpu.rl.evaluate import (
        evaluate,
        evaluate_ctf,
        load_params,
    )
    from gym_multigrid_tpu.rl.families import make_family_batch
    from gym_multigrid_tpu.rl.networks import ActorCritic

    env, cfg, num_actions, policy_agents = make_family_batch(
        args.family,
        args.envs,
        args.pallas,
        map_path=args.map,
        opponents=tuple(args.opponents.split(",")),
        wf_size=args.wf_size,
        wf_fires=args.wf_fires,
        wf_spread=args.wf_spread,
        wf_max_steps=args.wf_max_steps,
        burn_penalty=args.burn_penalty,
    )
    net = ActorCritic(num_actions=num_actions, num_agents=policy_agents)

    model = args.model or os.path.join(
        "out", "models",
        "ctf_ppo" if args.family == "ctf" else f"{args.family}_ppo",
    )
    if not os.path.exists(model + ".npz"):
        p.error(f"no checkpoint at {model}.npz (train first, or --model)")
    params = load_params(model)

    steps = args.steps or 2 * cfg.max_steps
    key = jax.random.PRNGKey(args.seed)

    def run(params, deterministic):
        if args.family == "ctf":
            return evaluate_ctf(
                cfg, args.envs, net, params, key, steps,
                deterministic=deterministic,
            )
        return evaluate(
            env, net, params, key, steps, deterministic=deterministic
        )

    result = {
        "family": args.family,
        "model": model,
        "envs": args.envs,
        "steps": steps,
        "deterministic": not args.sample,
        **run(params, not args.sample),
    }
    if args.random:
        # Fresh-init params == an untrained (near-uniform) policy: the
        # baseline a trained checkpoint must beat.
        _, obs0 = jax.jit(env.reset)(jax.random.PRNGKey(123))
        rand_params = net.init(jax.random.PRNGKey(124), obs0[:1])
        rand = run(rand_params, False)
        result["random_baseline"] = {
            k: rand[k]
            for k in ("ep_return_mean", "win_rate", "episodes")
            if k in rand
        }

    print(json.dumps(result))

    if args.gif:
        save_policy_gif(
            args.family, cfg, net, params, args.gif, seed=args.seed
        )


if __name__ == "__main__":
    main()
