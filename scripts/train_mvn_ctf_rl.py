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
import time

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
    from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo
    from gym_multigrid_tpu.utils.checkpoint import load_pytree, save_pytree

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
    net = ActorCritic(num_actions=5, num_agents=cfg.num_blue_agents)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
        lr=args.lr,
        ent_coef=args.ent_coef,
    )
    init_fn, train_step = make_ppo(env, net, ppo_cfg)

    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    model_path = os.path.join(args.out, "models", "ctf_ppo")
    if os.path.exists(model_path + ".npz"):
        # Full-tuple resume: params + Adam moments + env states + RNG key
        # snapshot together (utils/checkpoint.py), so a resumed run
        # continues bit-exactly.  A legacy params-only .npz (or a snapshot
        # taken at a different --envs) degrades to params-only.
        ckpt = load_pytree(model_path)
        # A legacy params-only snapshot is itself a dict with a top-level
        # 'params' key (flax), so detect the full tuple by 'states'.
        if isinstance(ckpt, dict) and "states" in ckpt:
            params = ckpt["params"]
            same_batch = jax.tree_util.tree_leaves(ckpt["states"])[0].shape[
                0
            ] == jax.tree_util.tree_leaves(states)[0].shape[0]
            if same_batch:
                opt_state, states, key = (
                    ckpt["opt_state"],
                    ckpt["states"],
                    ckpt["key"],
                )
                # Snapshots from before the RolloutCarry wrapper hold raw
                # env states; wrap them (running returns restart at 0).
                from gym_multigrid_tpu.rl.ppo import RolloutCarry

                if not isinstance(states, RolloutCarry):
                    import jax.numpy as jnp

                    states = RolloutCarry(
                        env=states,
                        run_return=jnp.zeros((args.envs,), jnp.float32),
                    )
                print(f"resumed full state from {model_path}.npz")
            else:
                print(
                    f"resumed params only from {model_path}.npz "
                    "(env batch size changed)"
                )
        else:
            params = ckpt
            print(f"resumed params only from legacy {model_path}.npz")

    # Persistent metrics: CSV always + TensorBoard events (reference
    # wires tensorboard_log via SB3, scripts/main_mvn_ctf_rl.py:31).
    from gym_multigrid_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(
        os.path.join(args.out, "logs"),
        use_tensorboard=not args.no_tensorboard,
    )
    # Resumed runs continue the step axis where the previous run stopped
    # (appending step 0.. again would interleave two runs in the CSV/TB).
    it0 = logger.last_step + 1

    step = jax.jit(train_step, donate_argnums=(1, 2))
    env_steps_per_iter = args.envs * args.rollout_len
    t0 = time.perf_counter()
    for it in range(it0, it0 + args.iters):
        params, opt_state, states, key, metrics = step(
            params, opt_state, states, key
        )
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        sps = env_steps_per_iter * (it - it0 + 1) / dt
        logger.log(
            it,
            {
                "loss": metrics["loss"],
                "pg_loss": metrics["pg_loss"],
                "v_loss": metrics["v_loss"],
                "entropy": metrics["entropy"],
                "reward_per_step": metrics["reward_per_step"],
                "ep_return_mean": metrics["ep_return_mean"],
                "episodes": metrics["episodes"],
                "approx_kl": metrics["approx_kl"],
                "clip_fraction": metrics["clip_fraction"],
                "explained_variance": metrics["explained_variance"],
                "env_steps_per_sec": sps,
            },
        )
        if it % 10 == 0 or it == args.iters - 1:
            print(
                f"iter {it:4d}  loss {float(metrics['loss']):+.4f}  "
                f"reward/step {float(metrics['reward_per_step']):+.4f}  "
                f"ep_return {float(metrics['ep_return_mean']):+.3f}  "
                f"entropy {float(metrics['entropy']):.3f}  "
                f"env-steps/s {sps:,.0f}"
            )
    logger.close()
    print(f"metrics logged to {logger.logdir} (csv" + (
        " + tensorboard)" if logger.has_tensorboard else ")"
    ))

    save_pytree(
        model_path,
        {"params": params, "opt_state": opt_state, "states": states, "key": key},
    )
    print(f"saved full training state to {model_path}.npz")

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
