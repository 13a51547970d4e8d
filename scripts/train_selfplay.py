"""Self-play PPO on CtF MvN: BOTH teams learn (rl/selfplay.py).

The reference tops out at training blue against its fixed scripted
heuristics (reference scripts/main_mvn_ctf_rl.py); here red is a second
learned policy optimizing the negated team reward, so the opponent
curriculum is emergent.  After training, the blue policy is evaluated
against the scripted red teams (rw and fight+capture) with the standard
outcome evaluator to show transfer beyond the self-play opponent.

League mode (--pool-size N) mixes in frozen past red snapshots: a
fraction of the env batch plays a pool opponent sampled each step, which
is the standard guard against self-play cycling.

Fast smoke:  python scripts/train_selfplay.py --cpu --iters 8 --envs 32
Artifact:    python scripts/train_selfplay.py --iters 300 --envs 2048 \
                 --out artifacts/ctf_selfplay
League:      python scripts/train_selfplay.py --iters 300 --envs 2048 \
                 --pool-size 8 --league-fraction 0.5 --snapshot-every 25
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--map", default="tests/assets/board.txt")
    p.add_argument("--obs-buffer-dtype", default="int8")
    p.add_argument("--out", default="out/selfplay")
    p.add_argument("--eval-envs", type=int, default=512)
    p.add_argument("--eval-steps", type=int, default=400)
    p.add_argument("--iters-per-call", type=int, default=1)
    p.add_argument("--pool-size", type=int, default=0,
                   help="league mode: frozen red snapshots to keep (0 = "
                        "plain self-play)")
    p.add_argument("--league-fraction", type=float, default=0.5,
                   help="fraction of envs playing a pool opponent")
    p.add_argument("--snapshot-every", type=int, default=25,
                   help="iterations between red snapshots into the pool")
    p.add_argument("--resume", action="store_true",
                   help="continue from <out>/models/selfplay_state.npz "
                        "(full state: both nets, Adam moments, pool, env "
                        "batch, RNG key, iteration)")
    p.add_argument("--checkpoint-every", type=int, default=50,
                   help="iterations between full-state checkpoints "
                        "(0 = only at the end)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-tensorboard", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gym_multigrid_tpu.rl.evaluate import evaluate_ctf, evaluate_ctf_match
    from gym_multigrid_tpu.rl.ppo import PPOConfig
    from gym_multigrid_tpu.rl.selfplay import (
        make_ctf_selfplay_batch,
        make_league_ppo,
        make_selfplay_ppo,
    )
    from gym_multigrid_tpu.utils.checkpoint import save_pytree
    from gym_multigrid_tpu.utils.logging import MetricsLogger

    map_path = args.map if os.path.isabs(args.map) else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.map
    )

    from gym_multigrid_tpu.rl.families import make_ctf_cfg

    def ctf_cfg(opponents):
        return make_ctf_cfg(map_path, opponents)

    cfg = ctf_cfg(("rw", "rw"))  # enemy_policies unused in self-play
    env = make_ctf_selfplay_batch(cfg, args.envs)
    ppo_cfg = PPOConfig(
        lr=args.lr,
        ent_coef=args.ent_coef,
        rollout_len=args.rollout_len,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
        obs_buffer_dtype=args.obs_buffer_dtype or None,
    )
    if args.pool_size:
        init_fn, train_step, snapshot_fn, (blue_net, red_net) = (
            make_league_ppo(
                env, cfg, ppo_cfg, pool_size=args.pool_size,
                league_fraction=args.league_fraction,
            )
        )
        snapshot_fn = jax.jit(snapshot_fn)
    else:
        init_fn, train_step, (blue_net, red_net) = make_selfplay_ppo(
            env, cfg, ppo_cfg
        )
        snapshot_fn = None
    from gym_multigrid_tpu.utils.checkpoint import load_pytree

    state_path = os.path.join(args.out, "models", "selfplay_state")
    sp = init_fn(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    start_it = 0
    if args.resume and os.path.exists(state_path + ".npz"):
        snap = load_pytree(state_path)
        # structure catches mode/net changes; leaf SHAPES catch changed
        # --envs / --pool-size (the pool and batch dims are shape, not
        # structure — a shape mismatch would otherwise corrupt the ring
        # via silently-dropped out-of-bounds scatter updates)
        def sig(t):
            leaves, td = jax.tree_util.tree_flatten(t)
            return td, [x.shape for x in leaves]

        if sig((sp, key)) != sig((snap["state"], snap["key"])):
            raise SystemExit(
                f"--resume: snapshot at {state_path}.npz was written with "
                "different flags (mode/pool/envs/net) — train with the "
                "same configuration or start fresh"
            )
        sp, key, start_it = snap["state"], snap["key"], int(snap["iter"])
        print(f"resumed full self-play state at iter {start_it} "
              f"from {state_path}.npz")

    def save_state(it):
        os.makedirs(os.path.join(args.out, "models"), exist_ok=True)
        save_pytree(state_path, {
            "state": sp, "key": key, "iter": jnp.int32(it),
        })

    def multi(sp, key, n):
        def body(carry, _):
            sp, key = carry
            sp, key, m = train_step(sp, key)
            return (sp, key), m

        (sp, key), ms = jax.lax.scan(body, (sp, key), None, length=n)
        return sp, key, ms

    chunk_fns = {}
    logger = MetricsLogger(
        os.path.join(args.out, "logs"),
        use_tensorboard=not args.no_tensorboard,
    )
    log_keys = ("blue_loss", "red_loss", "blue_reward_per_step",
                "blue_entropy", "red_entropy", "ep_return_mean", "episodes")
    steps_per_iter = args.envs * args.rollout_len
    it = start_it
    while it < args.iters:
        n = min(max(1, args.iters_per_call), args.iters - it)
        if snapshot_fn is not None:
            # align chunks to snapshot boundaries so the pool write
            # happens at exactly every snapshot_every iterations
            to_snap = args.snapshot_every - it % args.snapshot_every
            n = min(n, to_snap)
        if args.checkpoint_every:
            # likewise align to checkpoint boundaries, or a chunk size
            # that never lands on the boundary would skip every save
            n = min(n, args.checkpoint_every - it % args.checkpoint_every)
        if n not in chunk_fns:
            chunk_fns[n] = jax.jit(lambda sp, k, _n=n: multi(sp, k, _n))
        t0 = time.perf_counter()
        sp, key, ms = chunk_fns[n](sp, key)
        # Honest sync (see artifacts/measurement.md): materialize the
        # chunk's final loss rather than block_until_ready.
        float(jax.device_get(ms["blue_loss"][-1]))
        sps = steps_per_iter * n / (time.perf_counter() - t0)
        for j in range(n):
            row = {k: ms[k][j] for k in log_keys}
            row["env_steps_per_sec"] = sps
            logger.log(it + j, row)
            if (it + j) % 10 == 0 or it + j == args.iters - 1:
                print(
                    f"iter {it + j:4d}  blue_loss "
                    f"{float(ms['blue_loss'][j]):+.4f}  red_loss "
                    f"{float(ms['red_loss'][j]):+.4f}  blue r/step "
                    f"{float(ms['blue_reward_per_step'][j]):+.4f}  "
                    f"env-steps/s {sps:,.0f}"
                )
        it += n
        if snapshot_fn is not None and it % args.snapshot_every == 0:
            sp = snapshot_fn(sp)
        if args.checkpoint_every and it % args.checkpoint_every == 0:
            save_state(it)
    logger.close()
    save_state(it)

    params_of = sp.sp if args.pool_size else sp
    os.makedirs(os.path.join(args.out, "models"), exist_ok=True)
    snapshot = {
        "blue_params": params_of.blue_params,
        "red_params": params_of.red_params,
    }
    if args.pool_size:
        # the frozen-opponent pool (filled slots only) — lets
        # scripts/league_matrix.py score blue against every past red
        snapshot["pool"] = jax.tree_util.tree_map(
            lambda x: x[: int(sp.filled)], sp.pool
        )
    save_pytree(os.path.join(args.out, "models", "selfplay"), snapshot)

    # head-to-head: final blue vs final red (learned, not scripted)
    results = {}
    results["final_red"] = evaluate_ctf_match(
        ctf_cfg(("rw", "rw")), args.eval_envs, blue_net,
        params_of.blue_params, red_net, params_of.red_params,
        jax.random.PRNGKey(11), args.eval_steps,
    )
    print("eval vs final_red: " + json.dumps(results["final_red"]))
    # transfer eval: self-play blue vs the scripted red teams
    for name, opp in (("rw", ("rw", "rw")),
                      ("fight_capture", ("fight", "capture"))):
        results[name] = evaluate_ctf(
            ctf_cfg(opp), args.eval_envs, blue_net, params_of.blue_params,
            jax.random.PRNGKey(7), args.eval_steps,
        )
        print(f"eval vs {name}: " + json.dumps(results[name]))
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"artifacts in {args.out}")


if __name__ == "__main__":
    main()
