"""PPO learner tests: the fully jitted rollout+GAE+minibatched update
(gym_multigrid_tpu/rl/ppo.py), replacing the reference's SB3 PPO
(reference scripts/main_mvn_ctf_rl.py:30-34).

The learning regression (reward improves over a random baseline) lives in
test_training.py; here we pin the update machinery itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_multigrid_tpu.envs.collect import CollectConfig
from gym_multigrid_tpu.parallel.vector import make_collect_batch
from gym_multigrid_tpu.rl.networks import ActorCritic
from gym_multigrid_tpu.rl.ppo import PPOConfig, make_ppo


def _setup(num_envs=8, **ppo_kwargs):
    cfg = CollectConfig(layout="quadrants_respawn", respawn=True, max_steps=50)
    env = make_collect_batch(cfg, num_envs)
    net = ActorCritic(num_actions=4, num_agents=cfg.num_agents, hidden=(32, 32))
    ppo_cfg = PPOConfig(rollout_len=8, **ppo_kwargs)
    init_fn, train_step = make_ppo(env, net, ppo_cfg)
    return init_fn, train_step


def _leaf_delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_train_step_updates_params_and_is_finite():
    init_fn, train_step = _setup(num_epochs=2, num_minibatches=2)
    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    p2, o2, s2, key, metrics = step(params, opt_state, states, jax.random.PRNGKey(1))
    for k in ("loss", "pg_loss", "v_loss", "entropy", "reward_per_step"):
        assert np.isfinite(float(metrics[k])), k
    assert _leaf_delta(params, p2) > 0  # params moved


def test_train_step_deterministic():
    init_fn, train_step = _setup(num_epochs=1, num_minibatches=4)
    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    pa, *_, ma = step(params, opt_state, states, jax.random.PRNGKey(1))
    pb, *_, mb = step(params, opt_state, states, jax.random.PRNGKey(1))
    assert _leaf_delta(pa, pb) == 0
    assert float(ma["loss"]) == float(mb["loss"])


def test_minibatch_count_must_divide_buffer():
    init_fn, train_step = _setup(num_envs=8, num_minibatches=7)  # 8*8=64 % 7 != 0
    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="not divisible"):
        jax.eval_shape(train_step, params, opt_state, states, jax.random.PRNGKey(1))


def test_minibatching_changes_update_path():
    """num_minibatches=2 takes two SGD steps per epoch -> different params
    than the single full-batch step, from the same rollout key."""
    init1, step1 = _setup(num_epochs=1, num_minibatches=1)
    init2, step2 = _setup(num_epochs=1, num_minibatches=2)
    params, opt_state, states = init1(jax.random.PRNGKey(0))
    p1, *_ = jax.jit(step1)(params, opt_state, states, jax.random.PRNGKey(1))
    p2, *_ = jax.jit(step2)(params, opt_state, states, jax.random.PRNGKey(1))
    assert _leaf_delta(p1, p2) > 0


def test_minibatches_cover_every_sample_once():
    """Per epoch the shuffled buffer is split exactly — num_minibatches
    slices of n/num_minibatches samples, no sample dropped or repeated.
    Verified structurally: a permutation of arange(n) reshaped to
    (mb, n//mb) is a partition of the buffer indices."""
    n, mb = 64, 4
    perm = jax.random.permutation(jax.random.PRNGKey(0), n)
    slices = perm.reshape(mb, n // mb)
    assert sorted(np.asarray(slices).ravel().tolist()) == list(range(n))


def test_obs_buffer_compaction_bit_identical():
    """obs_buffer_dtype="int8" must not change training at all: the net
    casts its input to bf16 before the first matmul either way, and every
    Collect obs value is a small int (object/color indices < 128), so the
    int32->int8->bf16 round trip is exact.  Same keys => bit-identical
    params and metrics, 4x less HBM for the (T, B, obs) buffer."""
    init1, step1 = _setup(num_epochs=2, num_minibatches=2)
    init2, step2 = _setup(
        num_epochs=2, num_minibatches=2, obs_buffer_dtype="int8"
    )
    params, opt_state, states = init1(jax.random.PRNGKey(0))
    s1 = jax.jit(step1)
    s2 = jax.jit(step2)
    k = jax.random.PRNGKey(1)
    p1, o1, st1, k1, m1 = s1(params, opt_state, states, k)
    p2, o2, st2, k2, m2 = s2(params, opt_state, states, k)
    assert _leaf_delta(p1, p2) == 0
    assert float(m1["loss"]) == float(m2["loss"])
    # second iteration too (buffer dtype feeds back through nothing)
    p1, *_ , m1 = s1(p1, o1, st1, k1)
    p2, *_ , m2 = s2(p2, o2, st2, k2)
    assert _leaf_delta(p1, p2) == 0


def test_obs_buffer_compaction_rejects_float_obs():
    """Maze's reference-quirk float64 map obs cannot be compacted — the
    learner must fail loudly at trace time, not silently truncate."""
    from gym_multigrid_tpu.envs.maze import MazeConfig
    from gym_multigrid_tpu.parallel.vector import make_maze_batch
    import os

    cfg = MazeConfig.from_map_path(
        os.path.join(os.path.dirname(__file__), "assets/board_maze.txt"),
        max_steps=20,
    )
    env = make_maze_batch(cfg, 4)
    net = ActorCritic(num_actions=5, num_agents=1, hidden=(16,))
    init_fn, train_step = make_ppo(
        env, net, PPOConfig(rollout_len=4, obs_buffer_dtype="int8")
    )
    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="integer observations"):
        jax.eval_shape(
            train_step, params, opt_state, states, jax.random.PRNGKey(1)
        )


def test_obs_buffer_dtype_must_be_integer():
    with pytest.raises(ValueError, match="integer dtype"):
        _setup(obs_buffer_dtype="float16")


def test_conv_actor_critic_shapes_and_ppo_on_map_obs():
    """ConvActorCritic: one-hot path on integer class maps (CtF 'map'
    observation option) and channel path on (B,H,W,C) grids; drops into
    the same PPO learner unchanged (rl/networks.py)."""
    from gym_multigrid_tpu.rl.families import make_family_batch
    from gym_multigrid_tpu.rl.networks import ConvActorCritic

    net = ConvActorCritic(num_actions=5, num_agents=2, features=(8,),
                          hidden=32)
    # integer class-map input
    obs_int = jnp.zeros((4, 10, 10), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), obs_int)
    logits, value = net.apply(params, obs_int)
    assert logits.shape == (4, 2, 5) and value.shape == (4,)
    # multi-channel input gets its own params (different torso input)
    obs_ch = jnp.zeros((4, 10, 10, 3), jnp.float32)
    params_ch = net.init(jax.random.PRNGKey(0), obs_ch)
    logits, value = net.apply(params_ch, obs_ch)
    assert logits.shape == (4, 2, 5) and value.shape == (4,)
    with pytest.raises(ValueError, match="ConvActorCritic"):
        net.init(jax.random.PRNGKey(0), jnp.zeros((4, 10), jnp.int32))

    # full PPO train step on the CtF map observation option
    env, cfg, num_actions, policy_agents = make_family_batch(
        "ctf", 8, obs_option="map"
    )
    cnet = ConvActorCritic(num_actions=num_actions,
                           num_agents=policy_agents, features=(8,),
                           hidden=32)
    init_fn, train_step = make_ppo(env, cnet, PPOConfig(
        rollout_len=4, num_minibatches=2))
    params, opt_state, states = init_fn(jax.random.PRNGKey(0))
    p2, o2, s2, key, metrics = jax.jit(train_step)(
        params, opt_state, states, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert _leaf_delta(params, p2) > 0


def test_family_obs_option_validation():
    from gym_multigrid_tpu.rl.families import make_family_batch

    with pytest.raises(ValueError, match="not trainable"):
        make_family_batch("ctf", 4, obs_option="positional")
    with pytest.raises(ValueError, match="fixed grid observation"):
        make_family_batch("wildfire", 4, obs_option="map")
    with pytest.raises(ValueError, match="not trainable"):
        make_family_batch("maze", 4, obs_option="positional")


def test_shuffle_blocks_partitions_and_trains():
    """shuffle_blocks=B runs the epoch shuffle as B independent per-block
    permutations (cheaper sorts at scale — artifacts/sol_report.json
    ppo_train); every minibatch draws from every block and the epoch
    still covers each sample exactly once."""
    # structural partition check mirroring the update's index algebra
    n_local, S, mb = 16, 4, 2
    perm = jax.vmap(lambda k: jax.random.permutation(k, n_local))(
        jax.random.split(jax.random.PRNGKey(0), S)
    )
    idxs = perm.reshape((S, mb, n_local // mb)).transpose(1, 0, 2)
    flat = [
        (s, int(i))
        for m in range(mb)
        for s in range(S)
        for i in np.asarray(idxs[m, s])
    ]
    assert sorted(flat) == [(s, i) for s in range(S) for i in range(n_local)]

    # end to end: blocked shuffle trains, finite loss, params move
    init_b, step_b = _setup(num_envs=8, num_minibatches=2, shuffle_blocks=4)
    params, opt_state, states = init_b(jax.random.PRNGKey(0))
    p2, _, _, _, metrics = jax.jit(step_b)(
        params, opt_state, states, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert _leaf_delta(params, p2) > 0

    # blocks must stay shard-local under a mesh
    init_bad, step_bad = _setup(num_envs=8, dp_shards=2, shuffle_blocks=3)
    params, opt_state, states = init_bad(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="multiple of"):
        jax.eval_shape(
            step_bad, params, opt_state, states, jax.random.PRNGKey(1)
        )
