"""Family registry for the RL stack: one place that knows how to build a
BatchedEnv + its action space for every env family.

Both the generic training CLI (scripts/train.py) and the evaluation CLI
(scripts/evaluate.py) drive this builder so the configs they construct can
never drift apart — evaluating a checkpoint against a *different* env than
it was trained on is the classic silent RL bug.

The reference has no equivalent layer (its one training script hardcodes
one CtF env, reference scripts/main_mvn_ctf_rl.py:15-21); this is the
TPU-native generalization to all four families.
"""

from __future__ import annotations

import os

FAMILIES = ("collect", "ctf", "maze", "wildfire")

# family -> (num_actions, policy_agents_fn(cfg))
_FAMILY_SPECS = {
    "collect": (4, lambda cfg: cfg.num_agents),
    "ctf": (5, lambda cfg: cfg.num_blue_agents),
    "maze": (5, lambda cfg: 1),
    "wildfire": (5, lambda cfg: cfg.num_agents),
}

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_ctf_cfg(
    map_path: str | None = None,
    opponents: tuple[str, ...] = ("rw", "rw"),
    obs_option: str | None = None,
):
    """The canonical trainable CtF config (2 blue, MvN, flattened obs on
    the test board by default) — the ONE definition shared by the family
    builder, the self-play scripts and the driver dryrun, so the config
    they train/validate can never drift apart."""
    from gym_multigrid_tpu.envs.ctf import CtfConfig, PolicySpec

    return CtfConfig.from_map_path(
        map_path or os.path.join(_REPO_ROOT, "tests/assets/board.txt"),
        num_blue_agents=2,
        num_red_agents=len(opponents),
        variant="mvn",
        enemy_policies=tuple(PolicySpec(k) for k in opponents),
        observation_option=obs_option or "flattened",
    )


def make_family_batch(
    family: str,
    num_envs: int,
    use_pallas: bool = False,
    *,
    # ctf/maze knobs
    map_path: str | None = None,
    opponents: tuple[str, ...] = ("rw", "rw"),
    # observation option for ctf ("flattened"/"map"/"positional"-dict is
    # not batchable for the MLP/conv learners; default "flattened") and
    # maze ("map"/"positional").  "map" pairs with
    # rl.networks.ConvActorCritic.
    obs_option: str | None = None,
    # wildfire knobs
    wf_size: int = 8,
    wf_fires: int = 1,
    wf_spread: float = 0.15,
    wf_max_steps: int = 50,
    burn_penalty: float = 1.0,
):
    """(BatchedEnv, cfg, num_actions, policy_agents) for a family.

    Defaults are the committed learning-artifact configs (artifacts/):
    CtF 2-blue on tests/assets/board.txt with flattened obs, the
    CONTROLLABLE wildfire (8x8, 1 fire, spread 0.15 — at spread 0.3 on
    16x16 the fire outruns two agents and training goes nowhere), the
    quadrants-respawn Collect and the 13x13 Maze board.
    """
    from gym_multigrid_tpu.parallel import vector as pv

    # Array-observation options only: the MLP/conv learners (and the
    # BatchedEnv buffer) need a single array per env, so dict options
    # ("positional") and families with a fixed encoding are rejected
    # here with a clear error instead of an opaque trace failure.
    _obs_allowed = {"ctf": ("flattened", "map"), "maze": ("map",)}
    if obs_option is not None:
        allowed = _obs_allowed.get(family, ())
        if obs_option not in allowed:
            raise ValueError(
                f"obs_option={obs_option!r} is not trainable for "
                f"{family!r}: "
                + (f"choose one of {allowed}" if allowed
                   else "this family has a fixed grid observation")
            )

    if family == "collect":
        from gym_multigrid_tpu.envs.collect import CollectConfig

        cfg = CollectConfig(
            layout="quadrants_respawn", respawn=True, max_steps=50
        )
        env = pv.make_collect_batch(cfg, num_envs, use_pallas=use_pallas)
    elif family == "ctf":
        cfg = make_ctf_cfg(map_path, opponents, obs_option)
        env = pv.make_ctf_batch(cfg, num_envs, use_pallas=use_pallas)
    elif family == "maze":
        from gym_multigrid_tpu.envs.maze import MazeConfig

        cfg = MazeConfig.from_map_path(
            map_path
            or os.path.join(_REPO_ROOT, "tests/assets/board_maze.txt"),
            max_steps=100,
            **({"observation_option": obs_option} if obs_option else {}),
        )
        env = pv.make_maze_batch(cfg, num_envs, use_pallas=use_pallas)
    elif family == "wildfire":
        from gym_multigrid_tpu.envs.wildfire import WildfireConfig

        # With the spec defaults (ext_reward 1.0 > burn_penalty 0.1) an
        # extinguished ignition nets +0.9, so "farm the fire" beats
        # containment; burn_penalty >= ext_reward makes every ignition a
        # net loss and fire-fighting the optimum (see artifacts/README.md).
        cfg = WildfireConfig(
            size=wf_size,
            num_initial_fires=wf_fires,
            p_spread=wf_spread,
            max_steps=wf_max_steps,
            burn_penalty=burn_penalty,
        )
        env = pv.make_wildfire_batch(cfg, num_envs, use_pallas=use_pallas)
    else:
        raise ValueError(
            f"unknown family {family!r}; expected one of {FAMILIES}"
        )
    num_actions, agents_fn = _FAMILY_SPECS[family]
    return env, cfg, num_actions, agents_fn(cfg)
