"""Shared PPO training loop: resume, metric logging, checkpointing.

Both training scripts (scripts/train.py, scripts/train_mvn_ctf_rl.py)
drive this one loop so resume/logging semantics cannot drift:

* Full-state resume (params + Adam moments + env states + RNG key) when
  the snapshot's env batch matches; params-only degradation when it
  doesn't; legacy snapshots (params-only dicts, raw pre-RolloutCarry env
  states) handled explicitly.
* The metrics step axis is coupled to the model resume: a resumed model
  continues the existing CSV/TensorBoard axis; a fresh model rotates any
  stale metrics file aside so curves never interleave two runs.
"""

from __future__ import annotations

import os
import time
from typing import Callable

import jax
import jax.numpy as jnp

from gym_multigrid_tpu.rl.ppo import PPOConfig, RolloutCarry, make_ppo
from gym_multigrid_tpu.utils.checkpoint import load_pytree, save_pytree
from gym_multigrid_tpu.utils.logging import MetricsLogger

LOG_KEYS = (
    "loss", "pg_loss", "v_loss", "entropy", "reward_per_step",
    "ep_return_mean", "episodes", "approx_kl", "clip_fraction",
    "explained_variance",
)


def _batch_of(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def _rotate_stale_logs(logdir: str) -> None:
    """Move a non-empty log DIRECTORY aside as <logdir>.oldN — the whole
    thing, because TensorBoard aggregates every event file in a dir as
    one run, so leaving stale event files behind would interleave curves
    just like appending to the CSV would."""
    if not (os.path.isdir(logdir) and os.listdir(logdir)):
        return
    n = 1
    while os.path.exists(f"{logdir}.old{n}"):
        n += 1
    os.rename(logdir, f"{logdir}.old{n}")


def resume_or_init(init_fn, model_path: str, num_envs: int):
    """(params, opt_state, states, key, resumed: bool) from a snapshot or
    fresh init.  Handles every historical snapshot layout.  The fresh
    init (a whole-batch env reset + net/optimizer init) only runs when
    the snapshot cannot supply the corresponding pieces — on the slow
    remote-compile backend that startup work is worth skipping."""
    ckpt = None
    if os.path.exists(model_path + ".npz"):
        ckpt = load_pytree(model_path)
        if isinstance(ckpt, dict) and "states" in ckpt:
            ck_states = ckpt["states"]
            raw = not isinstance(ck_states, RolloutCarry)
            ck_env = ck_states if raw else ck_states.env
            if _batch_of(ck_env) == num_envs:
                if raw:
                    # pre-RolloutCarry snapshot: wrap, returns restart at 0
                    ck_states = RolloutCarry(
                        env=ck_env,
                        run_return=jnp.zeros((num_envs,), jnp.float32),
                    )
                print(f"resumed full state from {model_path}.npz")
                return (
                    ckpt["params"], ckpt["opt_state"], ck_states,
                    ckpt["key"], True,
                )
            print(
                f"resumed params only from {model_path}.npz "
                f"(env batch {_batch_of(ck_env)} != {num_envs})"
            )
            ckpt = ckpt["params"]
        else:
            # params-only snapshot (a flax params dict IS a dict with a
            # 'params' key, so anything without 'states' is bare params)
            print(f"resumed params only from legacy {model_path}.npz")

    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    if ckpt is not None:
        return ckpt, opt_state, states, key, True
    return params, opt_state, states, key, False


def train_loop(
    env,
    net,
    ppo_cfg: PPOConfig,
    *,
    iters: int,
    out: str,
    model_name: str,
    log_subdir: str = "",
    use_tensorboard: bool = True,
    label: str = "",
    extra_metrics: Callable[[dict], dict] | None = None,
    iters_per_call: int = 1,
):
    """Run `iters` PPO iterations with resume + logging; returns
    (params, opt_state, states, key, last_metrics).

    iters_per_call > 1 scans that many whole PPO iterations inside ONE
    jitted call (per-iteration metrics still come back, stacked).  On
    the remote-dispatch TPU backend each host->device call costs
    10-20 ms, which dominates small train steps; batching iterations
    per dispatch removes it.  A trailing partial chunk compiles a
    second scan length, so pick iters_per_call | iters when compile
    time matters."""
    init_fn, train_step = make_ppo(env, net, ppo_cfg)
    model_path = os.path.join(out, "models", model_name)
    params, opt_state, states, key, resumed = resume_or_init(
        init_fn, model_path, env.num_envs
    )

    logdir = os.path.join(out, "logs", log_subdir) if log_subdir else os.path.join(out, "logs")
    if not resumed:
        # fresh model: never append to a stale curve (CSV or TB events)
        _rotate_stale_logs(logdir)
    logger = MetricsLogger(logdir, use_tensorboard=use_tensorboard)
    it0 = logger.last_step + 1 if resumed else 0

    chunk_fns: dict[int, Callable] = {}

    def run_chunk(params, opt_state, states, key, n: int):
        """n PPO iterations in one jitted dispatch; metrics stacked (n, ...)."""
        if n not in chunk_fns:

            def multi(p, o, s, k):
                def body(carry, _):
                    p, o, s, k = carry
                    p, o, s, k, m = train_step(p, o, s, k)
                    return (p, o, s, k), m

                (p, o, s, k), ms = jax.lax.scan(
                    body, (p, o, s, k), None, length=n
                )
                return p, o, s, k, ms

            chunk_fns[n] = jax.jit(multi, donate_argnums=(1, 2))
        return chunk_fns[n](params, opt_state, states, key)

    steps_per_iter = env.num_envs * ppo_cfg.rollout_len
    metrics = {}
    it, it_end = it0, it0 + iters
    while it < it_end:
        n = min(max(1, iters_per_call), it_end - it)
        t0 = time.perf_counter()
        params, opt_state, states, key, stacked = run_chunk(
            params, opt_state, states, key, n
        )
        # Honest sync: materialize the chunk's final loss on the host —
        # block_until_ready returns early on the remote-tunnel backend
        # (artifacts/measurement.md), which would inflate the logged
        # env_steps_per_sec.
        float(jax.device_get(stacked["loss"][-1]))
        # Per-dispatch throughput: the first chunk's number includes its
        # compile (cold chunks are obvious in the log); later chunks show
        # sustained training speed.
        sps = steps_per_iter * n / (time.perf_counter() - t0)
        for j in range(n):
            metrics = {k: v[j] for k, v in stacked.items()}
            row = {k: metrics[k] for k in LOG_KEYS}
            row["env_steps_per_sec"] = sps
            if extra_metrics is not None:
                row.update(extra_metrics(metrics))
            logger.log(it + j, row)
            if (it + j) % 10 == 0 or it + j == it_end - 1:
                tag = f"[{label}] " if label else ""
                print(
                    f"{tag}iter {it + j:4d}  "
                    f"loss {float(metrics['loss']):+.4f}  "
                    f"reward/step {float(metrics['reward_per_step']):+.4f}  "
                    f"ep_return {float(metrics['ep_return_mean']):+.3f}  "
                    f"entropy {float(metrics['entropy']):.3f}  "
                    f"env-steps/s {sps:,.0f}"
                )
        it += n
    logger.close()
    tb = " + tensorboard)" if logger.has_tensorboard else ")"
    print(f"metrics logged to {logger.logdir} (csv{tb}")
    save_pytree(
        model_path,
        {"params": params, "opt_state": opt_state, "states": states, "key": key},
    )
    print(f"saved full training state to {model_path}.npz")
    return params, opt_state, states, key, metrics
