"""Empirical game matrix for a league run: final blue vs every red in
the frozen-opponent pool (plus the final live red).

The pool is the opponent *history* — scoring blue against each slot
shows whether it stayed strong against past strategies (the failure mode
plain self-play is prone to is beating only the latest red).  Uses
`rl.evaluate.evaluate_ctf_match` (learned vs learned; the reference has
no counterpart — its red team is always scripted).

    python scripts/league_matrix.py artifacts/ctf_league [--envs 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402


def save_match_gif(cfg, net, blue_params, red_params, path, *, fps=5,
                   seed=0):
    """Greedy learned-vs-learned rollout of ONE env (no auto-reset),
    rendered with the sprite-bank renderer — the visual companion to the
    match outcome numbers."""
    import numpy as np

    from gym_multigrid_tpu.render import tiles
    from gym_multigrid_tpu.rl.selfplay import make_ctf_selfplay_batch

    env = make_ctf_selfplay_batch(cfg, 1, auto_reset=False)
    step = jax.jit(env.step)
    states, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    apply = jax.jit(net.apply)

    def frame(states):
        one = jax.tree_util.tree_map(lambda x: x[0], states)
        return np.asarray(tiles.render_ctf(cfg, one))

    frames = [frame(states)]
    for _ in range(cfg.max_steps):
        obs = jax.vmap(env.encode_one)(states)
        b_act = jax.numpy.argmax(apply(blue_params, obs)[0], axis=-1)
        r_act = jax.numpy.argmax(apply(red_params, obs)[0], axis=-1)
        actions = jax.numpy.concatenate(
            [b_act, r_act], axis=1
        ).astype(jax.numpy.int32)
        states, _, _, term, trunc = step(states, actions)
        frames.append(frame(states))
        if bool(term[0] | trunc[0]):
            break

    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, frames, fps=fps)
    print(f"saved match rollout to {path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="a scripts/train_selfplay.py --out dir")
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--map", default="tests/assets/board.txt")
    p.add_argument("--gif", action="store_true",
                   help="also save a blue-vs-final-red match gif into "
                        "<run_dir>/match.gif")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gym_multigrid_tpu.rl.evaluate import make_ctf_match_evaluator
    from gym_multigrid_tpu.rl.families import make_ctf_cfg
    from gym_multigrid_tpu.rl.networks import ActorCritic
    from gym_multigrid_tpu.utils.checkpoint import load_pytree

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    map_path = args.map if os.path.isabs(args.map) else os.path.join(
        root, args.map
    )
    ck = load_pytree(os.path.join(args.run_dir, "models", "selfplay"))
    if "pool" not in ck:
        raise SystemExit(
            f"{args.run_dir} has no pool — train with --pool-size to get "
            "a league snapshot"
        )
    cfg = make_ctf_cfg(map_path)
    from gym_multigrid_tpu.envs.ctf import NUM_ACTIONS

    net = ActorCritic(num_actions=NUM_ACTIONS,
                      num_agents=cfg.num_blue_agents)
    # one jitted program for every pairing — params are call arguments
    match = make_ctf_match_evaluator(cfg, args.envs, net, net, args.steps)
    pool_size = jax.tree_util.tree_leaves(ck["pool"])[0].shape[0]
    rows = {}
    opponents = [
        (f"pool_{i}",
         jax.tree_util.tree_map(lambda x, _i=i: x[_i], ck["pool"]))
        for i in range(pool_size)
    ] + [("final_red", ck["red_params"])]
    for name, rp in opponents:
        r = match(ck["blue_params"], rp, jax.random.PRNGKey(17))
        rows[name] = r
        print(
            f"{name:>10}: win {r['win_rate']:.3f}  loss "
            f"{r['loss_rate']:.3f}  draw {r['draw_rate']:.3f}  "
            f"({r['episodes']} episodes)"
        )
    out = os.path.join(args.run_dir, "league_matrix.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")
    if args.gif:
        save_match_gif(
            cfg, net, ck["blue_params"], ck["red_params"],
            os.path.join(args.run_dir, "match.gif"),
        )


if __name__ == "__main__":
    main()
