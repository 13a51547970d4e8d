"""PPO learner over sharded in-graph rollouts.

Replaces the reference's host-side SB3 PPO training script
(scripts/main_mvn_ctf_rl.py) with a fully jitted train step: the env rollout
(lax.scan over a vmapped batch), GAE, and the clipped PPO update all compile
into one XLA program.  Under a mesh, the env batch shards over the 'data'
axis and gradients reduce with XLA-inserted collectives (psum over ICI).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gym_multigrid_tpu.rl.networks import ActorCritic, sample_actions

__all__ = [
    "PPOConfig", "RolloutCarry", "Transition", "make_obs_store",
    "make_update_fn", "make_ppo",
]


@dataclass(frozen=True)
class PPOConfig:
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    rollout_len: int = 32
    num_epochs: int = 1
    # SB3-style minibatch SGD: each epoch shuffles the (T*B) buffer and
    # takes one clipped gradient step per minibatch.  1 = full-batch
    # (previous behavior).  Must divide rollout_len * num_envs.
    num_minibatches: int = 1
    max_grad_norm: float = 0.5
    # Rollout-buffer compaction: store integer observations in this narrow
    # dtype inside the (T, B, obs_dim) buffer and cast back at update time.
    # Numerically identical whenever every obs value fits the dtype: the
    # network casts its input to bf16 before the first matmul either way
    # (networks.ActorCritic), and grid/coordinate encodings here are small
    # ints.  "int8" cuts the dominant PPO buffer 4x vs int32 — at 1M envs
    # that's what bounds rollout_len in HBM.  None keeps the env's dtype.
    obs_buffer_dtype: str | None = None
    # Data-parallel shard count of the env batch.  The per-epoch shuffle
    # draws an INDEPENDENT permutation per shard, so minibatch gathers stay
    # shard-local: without this, flattening the (T, B)-buffer for a global
    # shuffle makes GSPMD all-gather the entire rollout buffer onto every
    # device each epoch (tests/test_comm_audit.py pins the inventory).
    # Gradients still reduce over the full global minibatch; only the
    # shuffle is blockwise.  Distribution-parity note: a blockwise shuffle
    # over iid-sharded envs has the same minibatch marginals as SB3's
    # global shuffle.  Set to the mesh's 'data' axis size; 1 (default)
    # shuffles globally (single-chip semantics).
    dp_shards: int = 1
    # Shuffle granularity, independent of sharding: the epoch shuffle
    # runs as this many INDEPENDENT per-block permutations (each
    # minibatch still draws from every block, so samples from all blocks
    # mix in every gradient).  jax.random.permutation lowers to a sort
    # whose depth grows ~log^2(n) — at 1M envs the flat-buffer sorts
    # were ~25% of train-step device time (artifacts/sol_report.json
    # ppo_train) — and B blocks of n/B samples cut that depth while the
    # iid-envs argument above gives identical minibatch marginals.
    # None (default) = dp_shards (previous behavior).  Must be a
    # multiple of dp_shards so blocks stay shard-local under a mesh.
    shuffle_blocks: int | None = None


class RolloutCarry(NamedTuple):
    """Env batch + per-env running episode return.

    The running return must survive across train_step calls — episodes
    span rollout boundaries — so it travels with the env states through
    the (params, opt_state, states, key) training API.
    """

    env: Any
    run_return: jax.Array  # (num_envs,) f32


class Transition(NamedTuple):
    obs: jax.Array
    actions: jax.Array
    logp: jax.Array
    value: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    # Critic value of the post-step (pre-auto-reset) observation — the
    # bootstrap target at truncation boundaries.
    boot_value: jax.Array


def make_obs_store(cfg: PPOConfig):
    """The rollout-buffer obs compactor for ``cfg.obs_buffer_dtype``:
    validates the configured dtype is integral (at build time) and that
    the env's observations are integral (at trace time) before casting —
    a silent float→int cast would corrupt the whole buffer.  Shared by
    the single-sided and self-play learners."""
    obs_dtype = (
        jnp.dtype(cfg.obs_buffer_dtype) if cfg.obs_buffer_dtype else None
    )
    if obs_dtype is not None and not jnp.issubdtype(obs_dtype, jnp.integer):
        raise ValueError(
            f"obs_buffer_dtype must be an integer dtype, got {obs_dtype}"
        )

    def store_obs(obs):
        if obs_dtype is None or obs.dtype == obs_dtype:
            return obs
        if not jnp.issubdtype(obs.dtype, jnp.integer):
            raise ValueError(
                "obs_buffer_dtype compaction needs integer observations; "
                f"this env emits {obs.dtype} (e.g. Maze's float64 map quirk)"
            )
        return obs.astype(obs_dtype)

    return store_obs


def make_update_fn(net, tx, cfg: PPOConfig):
    """The PPO update as a standalone pure function:

        update(params, opt_state, traj: Transition, last_value, key)
            -> (params, opt_state, metrics)

    GAE + SB3-semantics minibatched clipped update + diagnostics, shared
    by the single-sided learner (``make_ppo``) and both sides of the
    self-play/league learners (rl/selfplay.py) so the update math exists
    exactly once.
    """

    def _gae(traj: Transition, last_value):
        def body(carry, tr):
            gae, next_value = carry
            done = jnp.maximum(tr.terminated, tr.truncated)
            # True terminals zero the bootstrap; truncations bootstrap from
            # the pre-reset final observation's value.
            nv = jnp.where(tr.truncated > 0, tr.boot_value, next_value)
            delta = (
                tr.reward
                + cfg.gamma * nv * (1.0 - tr.terminated)
                - tr.value
            )
            # Advantage accumulation never crosses an episode boundary.
            gae = delta + cfg.gamma * cfg.gae_lambda * (1.0 - done) * gae
            return (gae, tr.value), gae

        (_, _), advantages = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = advantages + traj.value
        return advantages, returns

    def _loss(params, mb):
        """Clipped PPO loss over one flat minibatch of (n,) samples."""
        obs, actions, old_logp, advantages, returns = mb
        logits, value = net.apply(params, obs)

        # logsumexp form: chosen logprob and entropy from (n, A) reduces
        # of the raw logits, without materializing the (n, A, actions)
        # log_softmax tensor (see networks.sample_actions).
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        chosen = jnp.take_along_axis(
            logits, actions[..., None], axis=-1
        ).squeeze(-1)
        logp = (chosen - lse).sum(axis=-1)

        ratio = jnp.exp(logp - old_logp)
        # Advantage normalization is per-minibatch, matching SB3's
        # normalize_advantage=True update semantics.
        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_loss = 0.5 * jnp.square(value - returns).mean()
        # H = E[-log p] = lse - sum(softmax * logits)
        probs = jax.nn.softmax(logits, axis=-1)
        entropy = (lse - (probs * logits).sum(-1)).mean()
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        # SB3-style update diagnostics (ppo.py logs these per update).
        approx_kl = ((ratio - 1.0) - jnp.log(ratio)).mean()
        clip_fraction = (
            (jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32).mean()
        )
        return loss, {
            "loss": loss,
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": entropy,
            "approx_kl": approx_kl,
            "clip_fraction": clip_fraction,
        }

    def update(params, opt_state, traj: Transition, last_value, key):
        """SB3 PPO update semantics (the reference training script's
        learner, reference scripts/main_mvn_ctf_rl.py:30-34): per epoch
        the (rollout_len × num_envs) buffer is shuffled and split into
        ``num_minibatches`` slices, one clipped gradient step each."""
        advantages, returns = _gae(traj, last_value)

        T, B = traj.reward.shape
        S = cfg.shuffle_blocks or cfg.dp_shards
        assert S % cfg.dp_shards == 0, (
            f"shuffle_blocks={S} must be a multiple of "
            f"dp_shards={cfg.dp_shards} (blocks must stay shard-local)"
        )
        assert B % S == 0, f"num_envs={B} not divisible by dp_shards={S}"
        n_local = T * (B // S)
        assert n_local % cfg.num_minibatches == 0, (
            f"rollout_len*num_envs/dp_shards={n_local} not divisible by "
            f"num_minibatches={cfg.num_minibatches}"
        )
        mb_local = n_local // cfg.num_minibatches

        def to_shard_major(x):
            # (T, B, ...) -> (S, T*B/S, ...): env-major flatten keeps the
            # dp-sharded env axis leading through the reshape, so every
            # shard's samples stay on their device (a T-major flatten
            # would interleave shards and force the all-gather this
            # layout exists to avoid).
            x = jnp.moveaxis(x, 1, 0)
            return x.reshape((S, n_local) + x.shape[2:])

        # Per-sample scalars ride ONE packed (n, A+3) f32 row —
        # [actions..., logp, advantage, return] — so each minibatch runs
        # two gathers (obs + this) instead of five.  Four separate
        # 4-8-byte-row random gathers were individually visible in the
        # 1M-env train-step profile (the five gather fusions together
        # ~32% of device time, artifacts/sol_report.json ppo_train).
        # Bit-exact: small int actions round-trip f32 exactly, the rest
        # are f32 already.
        A_dim = traj.actions.shape[-1]
        small = jnp.concatenate(
            [
                traj.actions.astype(jnp.float32),
                traj.logp[..., None],
                advantages[..., None],
                returns[..., None],
            ],
            axis=-1,
        )
        flat = jax.tree_util.tree_map(to_shard_major, (traj.obs, small))

        def one_epoch(carry, k_ep):
            params, opt_state = carry
            # Fresh shuffle per epoch, independent per shard; static
            # minibatch count -> scan over (num_minibatches, S, mb_local)
            # index slices.  Each minibatch gathers its own rows inside
            # the scan body, so peak HBM holds the flat buffer plus ONE
            # minibatch — materializing the whole shuffled copy up front
            # would double the dominant buffer.
            perm = jax.vmap(
                lambda k: jax.random.permutation(k, n_local)
            )(jax.random.split(k_ep, S))
            idxs = perm.reshape(
                (S, cfg.num_minibatches, mb_local)
            ).transpose(1, 0, 2)
            # NEGATIVE RESULT (round 5, measured): sorting each
            # minibatch's rows here (`jnp.sort(idxs, -1)` — membership
            # and hence the gradient unchanged up to float reduction
            # order) was meant to turn the per-minibatch buffer gathers
            # (~32% of the 1M-env train step) into near-sequential
            # walks; it measured 5.57M vs 5.55M env-steps/s — XLA's
            # TPU gather does not exploit sorted indices, so the sort
            # is pure extra work and is not kept.

            def one_minibatch(carry, idx):
                params, opt_state = carry
                # Per-shard row gather (idx row i indexes shard i only),
                # then a local flatten to the (S*mb_local,) minibatch.
                obs_mb, small_mb = jax.tree_util.tree_map(
                    lambda x: jax.vmap(lambda row, ii: row[ii])(
                        x, idx
                    ).reshape((S * mb_local,) + x.shape[2:]),
                    flat,
                )
                mb = (
                    obs_mb,
                    small_mb[:, :A_dim].astype(jnp.int32),
                    small_mb[:, A_dim],
                    small_mb[:, A_dim + 1],
                    small_mb[:, A_dim + 2],
                )
                (_, metrics), grads = jax.value_and_grad(
                    _loss, has_aux=True
                )(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                one_minibatch, (params, opt_state), idxs
            )
            # Mean over the epoch's minibatches.
            metrics = jax.tree_util.tree_map(lambda m: m.mean(), metrics)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            one_epoch,
            (params, opt_state),
            jax.random.split(key, cfg.num_epochs),
        )
        metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        metrics["reward_per_step"] = traj.reward.mean()
        # How much of the return variance the (pre-update) critic explains.
        ret_var = jnp.var(returns)
        metrics["explained_variance"] = 1.0 - jnp.var(
            returns - traj.value
        ) / (ret_var + 1e-8)
        return params, opt_state, metrics

    return update


def make_ppo(env, net: ActorCritic, cfg: PPOConfig):
    """Build (init_fn, train_step) for a BatchedEnv + ActorCritic.

    env: BatchedEnv (parallel.vector) — per-agent reward is summed into a
    team reward for the shared policy.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
    )
    _store_obs = make_obs_store(cfg)

    def init_fn(key: jax.Array):
        k_env, k_net = jax.random.split(key)
        env_states, obs = env.reset(k_env)
        params = net.init(k_net, obs[:1])
        opt_state = tx.init(params)
        states = RolloutCarry(
            env=env_states,
            run_return=jnp.zeros((env.num_envs,), jnp.float32),
        )
        return params, opt_state, states

    def _rollout(params, carry_in: RolloutCarry, key):
        def body(carry, _):
            states, key, run_ret, ep_sum, ep_cnt = carry
            key, k_act = jax.random.split(key)
            obs = jax.vmap(env.encode_one)(states)
            logits, value = net.apply(params, obs)
            actions, logp = sample_actions(k_act, logits)
            states, step_obs, rewards, term, trunc = env.step(states, actions)
            # Per-agent rewards (B, A) sum to a team reward; scalar team
            # rewards (B,) — e.g. CtF — pass through.
            team_reward = rewards.sum(axis=-1) if rewards.ndim > 1 else rewards
            # Per-episode return accounting across the auto-reset boundary
            # (same scheme as BatchedEnv.rollout) so training logs can
            # report mean episode return, the metric RL users watch.
            done = term | trunc
            run_ret = run_ret + team_reward
            ep_sum = ep_sum + jnp.where(done, run_ret, 0.0).sum()
            ep_cnt = ep_cnt + done.sum()
            run_ret = jnp.where(done, 0.0, run_ret)
            # Bootstrap value for truncation: the value of the post-step
            # observation BEFORE auto-reset (time limits are not true
            # terminals — zeroing the bootstrap there biases GAE on
            # fixed-horizon envs, where every episode ends by truncation).
            # Only consumed where trunc is set, so the extra forward is
            # gated behind a batch-level cond — on the (vast majority of)
            # steps where no env truncates it costs nothing.
            boot_value = jax.lax.cond(
                jnp.any(trunc),
                lambda o: net.apply(params, o)[1],
                lambda o: jnp.zeros(o.shape[:1], jnp.float32),
                step_obs,
            )
            tr = Transition(
                obs=_store_obs(obs),
                actions=actions,
                logp=logp,
                value=value,
                reward=team_reward,
                terminated=term.astype(jnp.float32),
                truncated=trunc.astype(jnp.float32),
                boot_value=boot_value,
            )
            return (states, key, run_ret, ep_sum, ep_cnt), tr

        init = (
            carry_in.env,
            key,
            carry_in.run_return,
            jnp.float32(0.0),
            jnp.int32(0),
        )
        (env_states, key, run_ret, ep_sum, ep_cnt), traj = jax.lax.scan(
            body, init, None, length=cfg.rollout_len
        )
        last_obs = jax.vmap(env.encode_one)(env_states)
        _, last_value = net.apply(params, last_obs)
        ep_stats = {
            "episodes": ep_cnt,
            "ep_return_mean": ep_sum / jnp.maximum(ep_cnt, 1),
        }
        carry_out = RolloutCarry(env=env_states, run_return=run_ret)
        return carry_out, traj, last_value, ep_stats

    update = make_update_fn(net, tx, cfg)

    def train_step(params, opt_state, states, key):
        """One PPO iteration: rollout + GAE + minibatched update
        (``make_update_fn`` — SB3 semantics).  Jittable."""
        key, k_roll, k_perm = jax.random.split(key, 3)
        states, traj, last_value, ep_stats = _rollout(params, states, k_roll)
        params, opt_state, metrics = update(
            params, opt_state, traj, last_value, k_perm
        )
        metrics.update(ep_stats)
        return params, opt_state, states, key, metrics

    return init_fn, train_step
