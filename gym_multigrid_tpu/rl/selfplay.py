"""Self-play and league PPO for CtF: both teams are learned policies.

The reference can only train blue against its scripted red heuristics
(reference scripts/main_mvn_ctf_rl.py + policy/ctf/heuristic.py); its env
hardwires red to `policy.act`.  The functional CtF core here exposes
`step_actions_fn` (all-agent external actions, envs/ctf.py), which makes
the adversarial setting a pure composition: one jitted train step rolls
out BOTH nets on the same env batch, computes GAE per side (red's reward
is the negation of the blue-centric team reward — the adversarial
objective), and applies independent minibatched PPO updates to each side.

League mode (`make_league_ppo`) extends plain self-play with a pool of
frozen past red snapshots: a static fraction of the env batch plays
against a pool opponent sampled each step (blue trains on every env; the
live red trains only on the self-play slice).  Mixing in past selves is
the standard fix for self-play cycling (rock-paper-scissors policy
chasing) — blue must stay good against the whole history, not just the
current red.

Everything (two rollout policies, two updates, the pool gather) compiles
into one XLA program; under a mesh the env batch shards over 'data'
exactly like the single-sided learner (see __graft_entry__.dryrun_multichip
for the sharding pattern).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gym_multigrid_tpu.parallel.vector import BatchedEnv
from gym_multigrid_tpu.rl.networks import ActorCritic, sample_actions
from gym_multigrid_tpu.rl.ppo import (
    PPOConfig,
    RolloutCarry,
    Transition,
    make_obs_store,
    make_update_fn,
)


def make_ctf_selfplay_batch(cfg, num_envs: int, auto_reset: bool = True):
    """BatchedEnv over the external-actions CtF step: actions are
    (num_envs, n_blue + n_red) ints for ALL agents, blue first (the same
    agent order as CtfState.pos).  Rewards stay the blue-centric scalar
    team reward of the base step (envs/ctf.py _transition)."""
    from gym_multigrid_tpu.envs.ctf import make_ctf

    from gym_multigrid_tpu.envs.ctf import NUM_ACTIONS

    fns = make_ctf(cfg)
    return BatchedEnv(
        reset_one=fns.reset_fn,
        step_one=fns.step_actions_fn,
        encode_one=fns.obs_fn,
        num_envs=num_envs,
        auto_reset=auto_reset,
        num_actions=NUM_ACTIONS,
        actions_shape=(cfg.num_blue_agents + cfg.num_red_agents,),
    )


class SelfPlayState(NamedTuple):
    blue_params: Any
    red_params: Any
    blue_opt: Any
    red_opt: Any
    states: RolloutCarry


class LeagueState(NamedTuple):
    sp: SelfPlayState
    # Stacked red-params pytree with a leading pool axis (static size).
    pool: Any
    filled: jax.Array  # int32 — slots holding a real snapshot
    slot: jax.Array  # int32 — next ring-buffer write position


def make_selfplay_ppo(env: BatchedEnv, cfg, ppo_cfg: PPOConfig,
                      hidden=(256, 256)):
    """(init_fn, train_step, (blue_net, red_net)) for simultaneous
    independent PPO on both CtF teams.  train_step(sp_state, key) ->
    (sp_state', key, metrics) with blue_*/red_* metric prefixes; fully
    jittable."""
    from gym_multigrid_tpu.envs.ctf import NUM_ACTIONS

    n_blue = cfg.num_blue_agents
    n_red = cfg.num_red_agents
    blue_net = ActorCritic(num_actions=NUM_ACTIONS, num_agents=n_blue,
                           hidden=hidden)
    red_net = ActorCritic(num_actions=NUM_ACTIONS, num_agents=n_red,
                          hidden=hidden)
    tx = optax.chain(
        optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
        optax.adam(ppo_cfg.lr),
    )
    # shared with the single-sided learner: integer-dtype + integer-obs
    # guards before compacting the rollout buffer (rl/ppo.py)
    _store = make_obs_store(ppo_cfg)

    def init_fn(key):
        k_env, k_b, k_r = jax.random.split(key, 3)
        env_states, obs = env.reset(k_env)
        bp = blue_net.init(k_b, obs[:1])
        rp = red_net.init(k_r, obs[:1])
        return SelfPlayState(
            blue_params=bp,
            red_params=rp,
            blue_opt=tx.init(bp),
            red_opt=tx.init(rp),
            states=RolloutCarry(
                env=env_states,
                run_return=jnp.zeros((env.num_envs,), jnp.float32),
            ),
        )

    def _rollout(bp, rp, league_rp, league_from, carry_in: RolloutCarry,
                 key):
        """Roll the batch with blue=bp everywhere, red=rp on envs
        [0, league_from) and red=league_rp on envs [league_from, B).
        Plain self-play passes league_rp=rp, league_from=B.

        Each red net forwards only its own static env slice — the live
        red's trajectory (and update) covers exactly [0, league_from), so
        running it on league envs would be wasted inference XLA cannot
        DCE.  Blue's trajectory covers the full batch."""
        n_sp = league_from

        def body(carry, _):
            states, key, run_ret, ep_sum, ep_cnt = carry
            key, k_b, k_r, k_lg = jax.random.split(key, 4)
            obs = jax.vmap(env.encode_one)(states)
            b_logits, b_value = blue_net.apply(bp, obs)
            b_act, b_logp = sample_actions(k_b, b_logits)
            r_logits, r_value = red_net.apply(rp, obs[:n_sp])
            r_act, r_logp = sample_actions(k_r, r_logits)
            if n_sp < env.num_envs:
                lg_logits, _ = red_net.apply(league_rp, obs[n_sp:])
                lg_act, _ = sample_actions(k_lg, lg_logits)
                red_play = jnp.concatenate([r_act, lg_act], axis=0)
            else:
                red_play = r_act
            actions = jnp.concatenate([b_act, red_play], axis=1)
            states, step_obs, reward, term, trunc = env.step(states, actions)
            done = term | trunc
            run_ret = run_ret + reward
            ep_sum = ep_sum + jnp.where(done, run_ret, 0.0).sum()
            ep_cnt = ep_cnt + done.sum()
            run_ret = jnp.where(done, 0.0, run_ret)
            boot = jax.lax.cond(
                jnp.any(trunc),
                lambda o: (
                    blue_net.apply(bp, o)[1],
                    red_net.apply(rp, o[:n_sp])[1],
                ),
                lambda o: (
                    jnp.zeros(o.shape[:1], jnp.float32),
                    jnp.zeros((n_sp,), jnp.float32),
                ),
                step_obs,
            )
            so = _store(obs)
            tb = Transition(so, b_act, b_logp, b_value, reward,
                            term.astype(jnp.float32),
                            trunc.astype(jnp.float32), boot[0])
            # red plays the adversarial objective: minus the blue-centric
            # team reward — over its self-play slice only
            tr = Transition(so[:n_sp], r_act, r_logp, r_value,
                            -reward[:n_sp],
                            term[:n_sp].astype(jnp.float32),
                            trunc[:n_sp].astype(jnp.float32), boot[1])
            return (states, key, run_ret, ep_sum, ep_cnt), (tb, tr)

        init = (carry_in.env, key, carry_in.run_return,
                jnp.float32(0.0), jnp.int32(0))
        (env_states, key, run_ret, ep_sum, ep_cnt), (tb, tr) = jax.lax.scan(
            body, init, None, length=ppo_cfg.rollout_len
        )
        last_obs = jax.vmap(env.encode_one)(env_states)
        last_b = blue_net.apply(bp, last_obs)[1]
        last_r = red_net.apply(rp, last_obs[:n_sp])[1]
        stats = {
            "episodes": ep_cnt,
            "ep_return_mean": ep_sum / jnp.maximum(ep_cnt, 1),
        }
        return (
            RolloutCarry(env=env_states, run_return=run_ret),
            (tb, last_b),
            (tr, last_r),
            stats,
        )

    # the exact update the single-sided learner runs (rl/ppo.py), once
    # per side
    update_blue = make_update_fn(blue_net, tx, ppo_cfg)
    update_red = make_update_fn(red_net, tx, ppo_cfg)

    def train_step(sp: SelfPlayState, key):
        key, k_roll, k_bu, k_ru = jax.random.split(key, 4)
        states, (tb, last_b), (tr, last_r), stats = _rollout(
            sp.blue_params, sp.red_params, sp.red_params, env.num_envs,
            sp.states, k_roll,
        )
        bp, bo, mb = update_blue(sp.blue_params, sp.blue_opt, tb, last_b,
                                 k_bu)
        rp, ro, mr = update_red(sp.red_params, sp.red_opt, tr, last_r, k_ru)
        metrics = {f"blue_{k}": v for k, v in mb.items()}
        metrics.update({f"red_{k}": v for k, v in mr.items()})
        metrics.update(stats)
        return (
            SelfPlayState(
                blue_params=bp, red_params=rp, blue_opt=bo, red_opt=ro,
                states=states,
            ),
            key,
            metrics,
        )

    # expose the internals the league factory composes
    train_step._internals = (init_fn, _rollout, update_blue, update_red,
                             blue_net, red_net)
    return init_fn, train_step, (blue_net, red_net)


def make_league_ppo(env: BatchedEnv, cfg, ppo_cfg: PPOConfig,
                    pool_size: int, league_fraction: float = 0.5,
                    hidden=(256, 256)):
    """Self-play PPO with a frozen-opponent league.

    A static `league_fraction` of the env batch plays against a red
    snapshot sampled uniformly from the filled pool slots each train step
    (one opponent per step — the mixture over steps is what matters);
    the rest is live self-play.  Blue updates on the full batch, red only
    on the self-play slice.

    Returns (init_fn, train_step, snapshot_fn, (blue_net, red_net)):
      init_fn(key) -> LeagueState (pool slot 0 = the initial red);
      train_step(ls, key) -> (ls', key, metrics);
      snapshot_fn(ls) -> ls' with the live red written into the next
      ring slot (call it from the host loop every snapshot_every iters).
    All three are jittable.
    """
    if not 0.0 <= league_fraction < 1.0:
        raise ValueError(
            f"league_fraction must be in [0, 1) — red needs a non-empty "
            f"self-play slice to train on (got {league_fraction})"
        )
    if pool_size < 1:
        raise ValueError(f"pool_size must be >= 1 (got {pool_size})")
    n_league = int(env.num_envs * league_fraction)
    n_sp = env.num_envs - n_league
    if (ppo_cfg.rollout_len * n_sp) % ppo_cfg.num_minibatches:
        raise ValueError(
            f"num_minibatches={ppo_cfg.num_minibatches} must divide the "
            f"red buffer rollout_len*self-play-envs="
            f"{ppo_cfg.rollout_len * n_sp}"
        )

    sp_init, sp_step, nets = make_selfplay_ppo(env, cfg, ppo_cfg, hidden)
    _, rollout, update_blue, update_red, blue_net, red_net = (
        sp_step._internals
    )

    def init_fn(key):
        sp = sp_init(key)
        pool = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x[None], (pool_size,) + x.shape
            ).copy(),
            sp.red_params,
        )
        return LeagueState(
            sp=sp, pool=pool,
            filled=jnp.int32(1), slot=jnp.int32(1 % pool_size),
        )

    def snapshot_fn(ls: LeagueState):
        pool = jax.tree_util.tree_map(
            lambda p, x: p.at[ls.slot].set(x), ls.pool, ls.sp.red_params
        )
        return LeagueState(
            sp=ls.sp, pool=pool,
            filled=jnp.minimum(ls.filled + 1, pool_size),
            slot=(ls.slot + 1) % pool_size,
        )

    def train_step(ls: LeagueState, key):
        sp = ls.sp
        key, k_opp, k_roll, k_bu, k_ru = jax.random.split(key, 5)
        opp = jax.random.randint(k_opp, (), 0, ls.filled)
        league_rp = jax.tree_util.tree_map(lambda x: x[opp], ls.pool)
        states, (tb, last_b), (tr, last_r), stats = rollout(
            sp.blue_params, sp.red_params, league_rp, n_sp, sp.states,
            k_roll,
        )
        bp, bo, mb = update_blue(sp.blue_params, sp.blue_opt, tb, last_b,
                                 k_bu)
        # tr already covers only the self-play slice (the rollout applies
        # the live red to envs [0, n_sp) exclusively)
        rp, ro, mr = update_red(sp.red_params, sp.red_opt, tr, last_r, k_ru)
        metrics = {f"blue_{k}": v for k, v in mb.items()}
        metrics.update({f"red_{k}": v for k, v in mr.items()})
        metrics.update(stats)
        metrics["league_opponent"] = opp
        # blue's reward split by opponent kind: live red vs frozen pool
        metrics["blue_reward_selfplay"] = tb.reward[:, :n_sp].mean()
        if n_league:
            metrics["blue_reward_league"] = tb.reward[:, n_sp:].mean()
        return (
            LeagueState(
                sp=SelfPlayState(
                    blue_params=bp, red_params=rp, blue_opt=bo,
                    red_opt=ro, states=states,
                ),
                pool=ls.pool, filled=ls.filled, slot=ls.slot,
            ),
            key,
            metrics,
        )

    return init_fn, train_step, snapshot_fn, nets
