"""Policy evaluation over the jitted env batch.

The reference evaluates a trained model by rolling out ONE host-driven
episode and saving a gif (reference scripts/main_mvn_ctf_rl.py:39-52) —
no returns, no win rates.  Here evaluation is the same lax.scan rollout
the learner uses, so thousands of episodes complete in one device
program: mean episode return/length across the auto-reset boundary for
any family, plus CtF game outcomes (win/loss/draw vs the scripted red
team) lifted from the in-graph step infos.

All entry points are pure functions of (params, key) — jitted once,
reusable for periodic in-training eval.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from gym_multigrid_tpu.parallel.vector import BatchedEnv, _where_done


def make_policy(env: BatchedEnv, net, *, deterministic: bool = True):
    """policy(params, key, states) -> (B, A) int32 actions for
    ``BatchedEnv.rollout``-style drivers.  Greedy argmax by default —
    evaluation wants the mode of the policy, not a sample — or the
    learner's categorical sampling with ``deterministic=False``."""

    def policy(params, key, states):
        obs = jax.vmap(env.encode_one)(states)
        logits, _ = net.apply(params, obs)
        if deterministic:
            actions = jnp.argmax(logits, axis=-1)
        else:
            actions = jax.random.categorical(key, logits, axis=-1)
        return actions.astype(jnp.int32)

    return policy


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _evaluate_jit(env, net, params, key, num_steps, deterministic):
    policy = make_policy(env, net, deterministic=deterministic)
    k_reset, k_roll = jax.random.split(key)
    states, _ = env.reset(k_reset)
    states, metrics = env.rollout(
        states,
        k_roll,
        num_steps,
        policy=partial(policy, params),
    )
    return metrics


def evaluate(
    env: BatchedEnv,
    net,
    params,
    key: jax.Array,
    num_steps: int,
    *,
    deterministic: bool = True,
) -> dict[str, float]:
    """Run ``num_steps`` lockstep steps of the trained policy from a fresh
    reset; returns host-side scalars.  Works for every family (the CtF
    batch compiles its scripted red team into the step).

    ``episodes`` counts COMPLETED episodes only; ``ep_return_mean`` is
    exact across the auto-reset boundary (parallel/vector.py rollout
    accounting).  Pick ``num_steps > max_steps`` so every env finishes
    at least one episode.
    """
    metrics = _evaluate_jit(env, net, params, key, num_steps, deterministic)
    episodes = int(metrics["episodes"])
    return {
        "episodes": episodes,
        "ep_return_mean": float(metrics["ep_return_sum"]) / max(episodes, 1),
        "reward_per_step": float(metrics["reward_sum"])
        / (num_steps * env.num_envs),
    }


def _outcome_acc0(num_envs: int):
    return {
        "episodes": jnp.int32(0),
        "wins": jnp.int32(0),
        "losses": jnp.int32(0),
        "draws": jnp.int32(0),
        "ep_return_sum": jnp.float32(0.0),
        "ep_len_sum": jnp.int32(0),
        "reward_sum": jnp.float32(0.0),
        "run_return": jnp.zeros((num_envs,), jnp.float32),
        "run_len": jnp.zeros((num_envs,), jnp.int32),
    }


def _outcome_update(acc, rew, term, trunc, info):
    """Blue-centric outcome classification + episode accounting.

    Outcome of a completed episode: win — blue captured the red flag
    (and not vice versa that step); loss — red captured the blue flag,
    or the episode terminated without any capture (every non-capture
    terminal is a blue failure, envs/ctf.py:456-506); draw — truncation
    at max_steps, or simultaneous captures.  Mirrors the reference's
    ``game_stats`` bookkeeping (reference ctf.py:43-48, 1068-1073).
    """
    done = term | trunc
    rf = info["red_flag_captured"]
    bf = info["blue_flag_captured"]
    term_only = term & ~rf & ~bf
    win = done & rf & ~bf
    loss = done & ~win & (bf | term_only)
    draw = done & ~win & ~loss

    run_ret = acc["run_return"] + rew.astype(jnp.float32)
    run_len = acc["run_len"] + 1
    return done, {
        "episodes": acc["episodes"] + done.sum(),
        "wins": acc["wins"] + win.sum(),
        "losses": acc["losses"] + loss.sum(),
        "draws": acc["draws"] + draw.sum(),
        "ep_return_sum": acc["ep_return_sum"]
        + jnp.where(done, run_ret, 0.0).sum(),
        "ep_len_sum": acc["ep_len_sum"]
        + jnp.where(done, run_len, 0).sum(),
        "reward_sum": acc["reward_sum"] + rew.sum(),
        "run_return": jnp.where(done, 0.0, run_ret),
        "run_len": jnp.where(done, 0, run_len),
    }


def _outcome_summary(acc, num_steps: int, num_envs: int) -> dict[str, Any]:
    episodes = int(acc["episodes"])
    d = max(episodes, 1)
    return {
        "episodes": episodes,
        "wins": int(acc["wins"]),
        "losses": int(acc["losses"]),
        "draws": int(acc["draws"]),
        "win_rate": int(acc["wins"]) / d,
        "loss_rate": int(acc["losses"]) / d,
        "draw_rate": int(acc["draws"]) / d,
        "ep_return_mean": float(acc["ep_return_sum"]) / d,
        "ep_len_mean": int(acc["ep_len_sum"]) / d,
        "reward_per_step": float(acc["reward_sum"]) / (num_steps * num_envs),
    }


def evaluate_ctf(
    cfg,
    num_envs: int,
    net,
    params,
    key: jax.Array,
    num_steps: int,
    *,
    deterministic: bool = True,
) -> dict[str, Any]:
    """CtF evaluation with game outcomes.

    Drives the per-env functional core under vmap (not the slab batch)
    because outcome classification needs the step infos that
    ``BatchedEnv.step`` drops.  Outcome of a completed episode:

    * win  — blue captured the red flag (and not vice versa that step);
    * loss — red captured the blue flag, or the episode terminated
      without any capture (all blue agents defeated in MvN; blue losing
      a battle / stepping on an obstacle in 1v1 — every non-capture
      terminal is a blue failure, envs/ctf.py:456-506);
    * draw — truncation at max_steps, or simultaneous captures.

    Mirrors the reference's ``game_stats`` bookkeeping
    (reference ctf.py:43-48, 1068-1073) at batch scale.
    """
    from gym_multigrid_tpu.envs.ctf import make_ctf

    fns = make_ctf(cfg)
    reset_b = jax.vmap(fns.reset_fn)
    step_b = jax.vmap(fns.step_fn)
    obs_b = jax.vmap(fns.obs_fn)

    def run(params, key):
        k_reset, k_roll = jax.random.split(key)
        states = reset_b(jax.random.split(k_reset, num_envs))

        def body(carry, _):
            states, key, acc = carry
            key, k_act = jax.random.split(key)
            obs = obs_b(states)
            logits, _ = net.apply(params, obs)
            if deterministic:
                actions = jnp.argmax(logits, axis=-1)
            else:
                actions = jax.random.categorical(k_act, logits, axis=-1)
            new_states, _, rew, term, trunc, info = step_b(
                states, actions.astype(jnp.int32)
            )
            done, acc = _outcome_update(acc, rew, term, trunc, info)
            # Auto-reset from each env's own post-step key (same scheme as
            # BatchedEnv.step) so streams stay independent across resets.
            reset_keys = jax.vmap(jax.random.split)(new_states.key)
            fresh = reset_b(reset_keys[:, 0])
            new_states = _where_done(done, fresh, new_states)
            return (new_states, key, acc), None

        (_, _, acc), _ = jax.lax.scan(
            body, (states, k_roll, _outcome_acc0(num_envs)), None,
            length=num_steps,
        )
        return acc

    acc = jax.jit(run)(params, key)
    return _outcome_summary(acc, num_steps, num_envs)


def make_ctf_match_evaluator(
    cfg,
    num_envs: int,
    blue_net,
    red_net,
    num_steps: int,
    *,
    deterministic: bool = True,
):
    """Build ``match(blue_params, red_params, key) -> outcome dict`` for
    head-to-head CtF: TWO learned policies, one per team, via the
    all-agent external-action step (`step_actions_fn`).  Outcomes are
    blue-centric with the same classification as ``evaluate_ctf``.

    The params are arguments of the one jitted program, so scoring many
    pairings (e.g. blue vs every league pool slot, scripts/league_matrix.py)
    compiles once — per-call closures would re-trace every pairing.
    """
    from gym_multigrid_tpu.envs.ctf import make_ctf

    fns = make_ctf(cfg)
    reset_b = jax.vmap(fns.reset_fn)
    step_b = jax.vmap(fns.step_actions_fn)
    obs_b = jax.vmap(fns.obs_fn)

    def run(blue_params, red_params, key):
        k_reset, k_roll = jax.random.split(key)
        states = reset_b(jax.random.split(k_reset, num_envs))

        def body(carry, _):
            states, key, acc = carry
            key, k_b, k_r = jax.random.split(key, 3)
            obs = obs_b(states)
            b_logits, _ = blue_net.apply(blue_params, obs)
            r_logits, _ = red_net.apply(red_params, obs)
            if deterministic:
                b_act = jnp.argmax(b_logits, axis=-1)
                r_act = jnp.argmax(r_logits, axis=-1)
            else:
                b_act = jax.random.categorical(k_b, b_logits, axis=-1)
                r_act = jax.random.categorical(k_r, r_logits, axis=-1)
            actions = jnp.concatenate(
                [b_act, r_act], axis=1
            ).astype(jnp.int32)
            new_states, _, rew, term, trunc, info = step_b(states, actions)
            done, acc = _outcome_update(acc, rew, term, trunc, info)
            reset_keys = jax.vmap(jax.random.split)(new_states.key)
            fresh = reset_b(reset_keys[:, 0])
            new_states = _where_done(done, fresh, new_states)
            return (new_states, key, acc), None

        (_, _, acc), _ = jax.lax.scan(
            body, (states, k_roll, _outcome_acc0(num_envs)), None,
            length=num_steps,
        )
        return acc

    run = jax.jit(run)

    def match(blue_params, red_params, key):
        acc = run(blue_params, red_params, key)
        return _outcome_summary(acc, num_steps, num_envs)

    return match


def evaluate_ctf_match(
    cfg,
    num_envs: int,
    blue_net,
    blue_params,
    red_net,
    red_params,
    key: jax.Array,
    num_steps: int,
    *,
    deterministic: bool = True,
) -> dict[str, Any]:
    """One-shot head-to-head CtF evaluation (see
    ``make_ctf_match_evaluator`` — use the factory directly when scoring
    many pairings so the program compiles once)."""
    match = make_ctf_match_evaluator(
        cfg, num_envs, blue_net, red_net, num_steps,
        deterministic=deterministic,
    )
    return match(blue_params, red_params, key)


def load_params(model_path: str):
    """Policy params from a training snapshot (``utils/checkpoint``).

    Accepts both layouts the trainer has ever written: the full
    (params, opt_state, states, key) snapshot and legacy bare-params
    files.  A bare flax params dict also has a top-level "params" key,
    so — like ``rl.trainer.resume_or_init`` — the full snapshot is
    recognized by its "states" entry.
    """
    from gym_multigrid_tpu.utils.checkpoint import load_pytree

    ckpt = load_pytree(model_path)
    if isinstance(ckpt, dict) and "states" in ckpt:
        return ckpt["params"]
    return ckpt
