"""Reference-compatible CtF Env classes over the functional TPU core.

Mirrors the reference public API (class names, ctor kwargs, spaces,
obs/info/game_stats shapes — gym_multigrid/envs/ctf.py:50-654, 657-1433).
Scripted enemy policies compile into the jitted step when they are stock
policy classes; user-defined policy objects fall back to host-side ``act``
calls feeding ``step_actions_fn``.
"""

from __future__ import annotations

import gymnasium as gym
import jax
import numpy as np
from gymnasium import spaces

from gym_multigrid_tpu.core.actions import CtfActions
from gym_multigrid_tpu.core.world import CtfWorld
from gym_multigrid_tpu.envs.ctf import (
    CtfConfig,
    GameStats,
    MultiAgentObservationDict,
    Observation,
    ObservationDict,
    PolicySpec,
    cached_ctf,
)

__all__ = [
    "Ctf1v1Env", "CtFMvNEnv", "CtfAgentProxy",
    # typing surface re-exported for reference users who import the
    # observation/stats types from the env module (ctf.py:18-48)
    "ObservationDict", "MultiAgentObservationDict", "Observation",
    "GameStats",
]
from gym_multigrid_tpu.policy.ctf.heuristic import (
    CapturePolicy,
    FightPolicy,
    PatrolFightPolicy,
    PatrolPolicy,
    RwPolicy,
)
from gym_multigrid_tpu.utils.map import load_text_map

#: Exact-type mapping from stock policy classes to in-graph spec kinds.
#: Subclasses deliberately do NOT match (a custom get_target must run on
#: the host).
_POLICY_KINDS = {
    RwPolicy: "rw",
    FightPolicy: "fight",
    CapturePolicy: "capture",
    PatrolPolicy: "patrol",
    PatrolFightPolicy: "patrol_fight",
}


class CtfAgentProxy:
    """Stand-in for the reference Agent/PolicyAgent objects: exposes the
    attributes user code reads (pos/dir/terminated/collided/color/type)."""

    def __init__(self, index: int, type_: str, color: str, policy=None):
        self.index = index
        self.type = type_
        self.color = color
        self.bg_color = "light_blue" if type_ == "blue_agent" else "light_red"
        self.pos = None
        self.dir = 3
        self.terminated = False
        self.collided = False
        self.started = True
        self.paused = False
        self.carrying = None
        self.policy = policy


class _CtfBase(gym.Env):
    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 10}

    def __init__(
        self,
        map_path: str,
        num_blue_agents: int,
        num_red_agents: int,
        enemy_policies,
        variant: str,
        battle_range: float = 1.0,
        randomness: float = 0.75,
        flag_reward: float = 1.0,
        battle_reward_ratio: float = 0.25,
        obstacle_penalty_ratio: float = 0.0,
        step_penalty_ratio: float = 0.01,
        max_steps: int = 100,
        observation_option: str = "positional",
        observation_scaling: float = 1.0,
        render_mode: str = "rgb_array",
        uncached_object_types=("red_agent", "blue_agent"),
    ):
        self.num_blue_agents = num_blue_agents
        self.num_red_agents = num_red_agents
        self.battle_range = battle_range
        self.randomness = randomness
        self.flag_reward = flag_reward
        self.battle_reward = battle_reward_ratio * flag_reward
        self.obstacle_penalty = obstacle_penalty_ratio * flag_reward
        self.step_penalty = step_penalty_ratio * flag_reward
        self.observation_option = observation_option
        self.observation_scaling = observation_scaling
        self.max_steps = max_steps
        self.render_mode = render_mode
        self.uncached_object_types = list(uncached_object_types)
        self.world = CtfWorld
        self.actions_set = CtfActions

        self._map_path = map_path
        self._field_map = load_text_map(map_path)
        height, width = self._field_map.shape
        self.height, self.width = height, width

        fm = self._field_map
        idx = self.world.OBJECT_TO_IDX
        self.obstacle = list(zip(*np.where(fm == idx["obstacle"])))
        self.blue_flag = list(zip(*np.where(fm == idx["blue_flag"])))[0]
        self.red_flag = list(zip(*np.where(fm == idx["red_flag"])))[0]
        self.blue_territory = list(
            zip(*np.where(fm == idx["blue_territory"]))
        ) + [self.blue_flag]
        self.red_territory = list(zip(*np.where(fm == idx["red_territory"]))) + [
            self.red_flag
        ]

        # Normalize enemy policies to one object per red agent
        # (ctf.py:780-785) and bind env RNG + field map (ctf.py:787-826).
        if not isinstance(enemy_policies, list):
            enemy_policies = [enemy_policies for _ in range(num_red_agents)]
        assert len(enemy_policies) == num_red_agents
        # PolicySpec entries (the functional core's policy currency) are
        # accepted alongside the heuristic class instances: convert to
        # the matching class so both the in-graph detection and the
        # host-fallback .act path work.
        kind_classes = {v: k for k, v in _POLICY_KINDS.items()}
        enemy_policies = [
            (
                # RwPolicy has no randomness (reference heuristic.py:40-72;
                # the field is meaningless for uniform-random actions).
                kind_classes[p.kind]()
                if p.kind == "rw"
                else kind_classes[p.kind](randomness=p.randomness)
            )
            if isinstance(p, PolicySpec)
            else p
            for p in enemy_policies
        ]
        for policy in enemy_policies:
            if getattr(policy, "field_map", "missing") is None:
                policy.field_map = self._field_map
            if hasattr(policy, "random_generator"):
                policy.random_generator = self.np_random
            if hasattr(policy, "action_set"):
                policy.action_set = self.actions_set
        self.enemy_policies = enemy_policies

        self._in_graph = all(
            type(p) in _POLICY_KINDS for p in enemy_policies
        )

        def _spec_randomness(p) -> float:
            # Host-fallback custom policies may carry any `randomness`
            # attribute; the placeholder spec built for them is never
            # consumed in-graph, so sanitize rather than reject.
            r = getattr(p, "randomness", 0.75)
            return float(r) if isinstance(r, (int, float)) and 0 <= r <= 1 else 0.75

        specs = tuple(
            PolicySpec(
                kind=_POLICY_KINDS.get(type(p), "rw"),
                randomness=_spec_randomness(p),
            )
            for p in enemy_policies
        )

        self.cfg = CtfConfig(
            map_data=tuple(tuple(int(v) for v in row) for row in fm),
            num_blue_agents=num_blue_agents,
            num_red_agents=num_red_agents,
            variant=variant,
            enemy_policies=specs,
            battle_range=battle_range,
            randomness=randomness,
            flag_reward=flag_reward,
            battle_reward_ratio=battle_reward_ratio,
            obstacle_penalty_ratio=obstacle_penalty_ratio,
            step_penalty_ratio=step_penalty_ratio,
            max_steps=max_steps,
            observation_option=observation_option,
            observation_scaling=observation_scaling,
        )
        self._fns = cached_ctf(self.cfg)

        self.agents = [
            CtfAgentProxy(i, "blue_agent", "blue") for i in range(num_blue_agents)
        ] + [
            CtfAgentProxy(
                num_blue_agents + i, "red_agent", "red", policy=enemy_policies[i]
            )
            for i in range(num_red_agents)
        ]

        self.observation_space = self._set_observation_space()
        self.step_count = 0
        self.window = None
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._state = None

    # -- spaces -------------------------------------------------------------
    def _set_observation_space(self):
        shape = self._field_map.shape
        n_bt, n_rt = len(self.blue_territory), len(self.red_territory)
        n_ob = len(self.obstacle)
        nb, nr = self.num_blue_agents, self.num_red_agents

        def box_pts(n):
            return spaces.Box(
                low=np.zeros(2 * n),
                high=np.tile(np.asarray(shape), n).astype(float) - 1,
                dtype=np.int64,
            )

        if self.observation_option == "positional":
            if self._is_1v1():
                d = {
                    "blue_agent": spaces.Box(
                        low=np.array([-1, -1]),
                        high=np.array(shape) - 1,
                        dtype=np.int64,
                    ),
                    "red_agent": spaces.Box(
                        low=np.array([-1, -1]),
                        high=np.array(shape) - 1,
                        dtype=np.int64,
                    ),
                }
            else:
                d = {
                    "blue_agent": spaces.Box(
                        low=np.tile([-1, -1], nb),
                        high=np.tile(np.asarray(shape), nb) - 1,
                        dtype=np.int64,
                    ),
                    "red_agent": spaces.Box(
                        low=np.tile([-1, -1], nr),
                        high=np.tile(np.asarray(shape), nr) - 1,
                        dtype=np.int64,
                    ),
                }
            d.update(
                {
                    "blue_flag": spaces.Box(
                        low=np.array([0, 0]), high=np.array(shape) - 1, dtype=np.int64
                    ),
                    "red_flag": spaces.Box(
                        low=np.array([0, 0]), high=np.array(shape) - 1, dtype=np.int64
                    ),
                    "blue_territory": box_pts(n_bt),
                    "red_territory": box_pts(n_rt),
                    "obstacle": box_pts(n_ob),
                }
            )
            if self._is_1v1():
                d["is_red_agent_defeated"] = spaces.Discrete(2)
            else:
                d["terminated_agents"] = spaces.Box(
                    low=np.zeros(nb + nr), high=np.ones(nb + nr), dtype=np.int64
                )
            return spaces.Dict(d)

        if self.observation_option == "map":
            return spaces.Box(
                low=0,
                high=len(self.world.OBJECT_TO_IDX) - 1,
                shape=shape,
                dtype=np.int64,
            )

        if self.observation_option == "flattened":
            # Reference 1v1 hardcodes high's length as 8+200+1 (ctf.py:256-275)
            # which only matches the shipped board; we use the consistent MvN
            # formula (ctf.py:963-994) for both.
            n = 2 * (nb + nr) + 4 + 2 * n_ob + 2 * n_bt + 2 * n_rt + (nb + nr if not self._is_1v1() else 1)
            high = (
                np.ones(n) * (np.max(shape) - 1) / self.observation_scaling
            )
            tail = (nb + nr) if not self._is_1v1() else 1
            high[-tail:] = 1
            return spaces.Box(low=np.zeros(n), high=high, dtype=np.int64)

        raise ValueError(f"Invalid observation_option: {self.observation_option}")

    def _is_1v1(self) -> bool:
        return self.cfg.variant == "1v1"

    # -- host obs/info conversion ------------------------------------------
    def _np_obs(self, obs):
        if isinstance(obs, dict):
            return {
                k: (
                    int(v)
                    if k == "is_red_agent_defeated"
                    else np.asarray(v, dtype=np.int64)
                )
                for k, v in obs.items()
            }
        return np.asarray(obs, dtype=np.int64)

    def _get_dict_obs(self) -> ObservationDict | MultiAgentObservationDict:
        """Pre-move positional dict obs for host-side policy.act calls."""
        pos = np.asarray(self._state.pos, dtype=np.int64)
        term = np.asarray(self._state.terminated)
        nb = self.num_blue_agents
        base = {
            "blue_flag": np.asarray(self.blue_flag, dtype=np.int64),
            "red_flag": np.asarray(self.red_flag, dtype=np.int64),
            "blue_territory": np.asarray(self.blue_territory, dtype=np.int64).flatten(),
            "red_territory": np.asarray(self.red_territory, dtype=np.int64).flatten(),
            "obstacle": np.asarray(self.obstacle, dtype=np.int64).reshape(-1),
        }
        if self._is_1v1():
            base.update(
                blue_agent=pos[0],
                red_agent=pos[1],
                is_red_agent_defeated=int(term[1]),
            )
        else:
            base.update(
                blue_agent=pos[:nb].flatten(),
                red_agent=pos[nb:].flatten(),
                terminated_agents=term.astype(np.int64),
            )
        return base

    def _sync_proxies(self):
        pos = np.asarray(self._state.pos)
        dirs = np.asarray(self._state.dir)
        term = np.asarray(self._state.terminated)
        coll = np.asarray(self._state.collided)
        for i, a in enumerate(self.agents):
            a.pos = pos[i]
            a.dir = int(dirs[i])
            a.terminated = bool(term[i])
            a.collided = bool(coll[i])
            base = "blue" if a.type == "blue_agent" else "red"
            a.color = base if not a.terminated else f"{base}_grey"
        self.step_count = int(self._state.step_count)

    def _info_dict(self, info):
        return {
            k: float(info[k])
            for k in (
                "d_ba_ra", "d_ba_bf", "d_ba_rf", "d_ra_bf", "d_ra_rf",
                "d_bf_rf", "d_ba_bb", "d_ba_rb", "d_ra_bb", "d_ra_rb",
                "d_ba_ob",
            )
        }

    # -- gym API ------------------------------------------------------------
    def reset(self, *, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
            # Rebind host policy RNGs to the reseeded generator (the
            # reference's stale-reference behavior is a documented bug,
            # SURVEY.md §2.3).
            for p in self.enemy_policies:
                if hasattr(p, "random_generator"):
                    p.random_generator = self.np_random
        self._key, k = jax.random.split(self._key)
        self._state = self._fns.reset_fn(k)
        self._sync_proxies()

        nb, nr = self.num_blue_agents, self.num_red_agents
        pos = np.asarray(self._state.pos)
        if self._is_1v1():
            self.blue_traj = [pos[0]]
            self.red_traj = [pos[1]]
        else:
            self.blue_traj = [[pos[i]] for i in range(nb)]
            self.red_traj = [[pos[nb + i]] for i in range(nr)]
        self.game_stats: GameStats = {
            "blue_agent_defeated": [False] * nb,
            "red_agent_defeated": [False] * nr,
            "blue_flag_captured": False,
            "red_flag_captured": False,
        }

        obs = self._np_obs(self._fns.obs_fn(self._state))
        info = self._info_dict(self._fns.info_fn(self._state))
        return obs, info

    def step(self, action):
        nb = self.num_blue_agents
        blue_actions = np.asarray(
            np.round(np.asarray(action, dtype=float)), dtype=np.int32
        ).reshape(nb)

        if self._in_graph:
            out = self._fns.step_fn(self._state, blue_actions)
        else:
            dict_obs = self._get_dict_obs()
            red_actions = np.asarray(
                [
                    int(p.act(dict_obs, np.asarray(self._state.pos)[nb + i]))
                    for i, p in enumerate(self.enemy_policies)
                ],
                dtype=np.int32,
            )
            out = self._fns.step_actions_fn(
                self._state, np.concatenate([blue_actions, red_actions])
            )
        self._state, obs, reward, terminated, truncated, info = out
        self._sync_proxies()

        # game_stats + trajectories (ctf.py:43-48, 1058-1073, 1409-1418)
        st = self.game_stats
        st["red_flag_captured"] |= bool(info["red_flag_captured"])
        st["blue_flag_captured"] |= bool(info["blue_flag_captured"])
        bl = np.asarray(info["battle_blue_lost"])
        rl = np.asarray(info["battle_red_lost"])
        for i in range(nb):
            st["blue_agent_defeated"][i] |= bool(bl[i])
        for i in range(self.num_red_agents):
            st["red_agent_defeated"][i] |= bool(rl[i])
        pos = np.asarray(self._state.pos)
        if self._is_1v1():
            self.blue_traj.append(pos[0])
            self.red_traj.append(pos[1])
        else:
            for i in range(nb):
                self.blue_traj[i].append(pos[i])
            for i in range(self.num_red_agents):
                self.red_traj[i].append(pos[nb + i])

        return (
            self._np_obs(obs),
            float(reward),
            bool(terminated),
            bool(truncated),
            self._info_dict(info),
        )

    def render(self):
        from gym_multigrid_tpu.render.tiles import render_ctf

        img = render_ctf(self.cfg, self._state)
        if self.render_mode == "human":
            from gym_multigrid_tpu.render.window import Window

            if self.window is None:
                self.window = Window("gym_multigrid_tpu")
                self.window.show(block=False)
            self.window.show_img(img)
        return img

    def close(self):
        if self.window is not None:
            self.window.close()
            self.window = None


class Ctf1v1Env(_CtfBase):
    """1 blue (ego) vs 1 scripted red agent (reference ctf.py:50-654)."""

    def __init__(
        self,
        map_path: str,
        enemy_policy=None,
        battle_range: float = 1.0,
        randomness: float = 0.75,
        flag_reward: float = 1.0,
        battle_reward_ratio: float = 0.25,
        obstacle_penalty_ratio: float = 0.0,
        step_penalty_ratio: float = 0.01,
        max_steps: int = 100,
        observation_option: str = "positional",
        observation_scaling: float = 1.0,
        render_mode: str = "rgb_array",
        uncached_object_types=("red_agent", "blue_agent"),
    ):
        enemy_policy = enemy_policy if enemy_policy is not None else RwPolicy()
        super().__init__(
            map_path=map_path,
            num_blue_agents=1,
            num_red_agents=1,
            enemy_policies=[enemy_policy],
            variant="1v1",
            battle_range=battle_range,
            randomness=randomness,
            flag_reward=flag_reward,
            battle_reward_ratio=battle_reward_ratio,
            obstacle_penalty_ratio=obstacle_penalty_ratio,
            step_penalty_ratio=step_penalty_ratio,
            max_steps=max_steps,
            observation_option=observation_option,
            observation_scaling=observation_scaling,
            render_mode=render_mode,
            uncached_object_types=uncached_object_types,
        )
        self.action_space = spaces.Discrete(len(self.actions_set))
        self.ac_dim = self.action_space.n

    @property
    def _is_red_agent_defeated(self) -> bool:
        return bool(np.asarray(self._state.terminated)[1])

    def step(self, action):
        obs, reward, terminated, truncated, info = super().step([int(np.round(np.asarray(action, dtype=float).item()))])
        return obs, reward, terminated, truncated, info


class CtFMvNEnv(_CtfBase):
    """N blue vs M scripted red agents (reference ctf.py:657-1433)."""

    def __init__(
        self,
        map_path: str,
        num_blue_agents: int = 2,
        num_red_agents: int = 2,
        enemy_policies=None,
        battle_range: float = 1,
        randomness: float = 0.75,
        flag_reward: float = 1,
        battle_reward_ratio: float = 0.25,
        obstacle_penalty_ratio: float = 0,
        step_penalty_ratio: float = 0.01,
        max_steps: int = 100,
        observation_option: str = "positional",
        observation_scaling: float = 1,
        render_mode: str = "rgb_array",
        uncached_object_types=("red_agent", "blue_agent"),
    ):
        enemy_policies = (
            enemy_policies if enemy_policies is not None else RwPolicy()
        )
        super().__init__(
            map_path=map_path,
            num_blue_agents=num_blue_agents,
            num_red_agents=num_red_agents,
            enemy_policies=enemy_policies,
            variant="mvn",
            battle_range=battle_range,
            randomness=randomness,
            flag_reward=flag_reward,
            battle_reward_ratio=battle_reward_ratio,
            obstacle_penalty_ratio=obstacle_penalty_ratio,
            step_penalty_ratio=step_penalty_ratio,
            max_steps=max_steps,
            observation_option=observation_option,
            observation_scaling=observation_scaling,
            render_mode=render_mode,
            uncached_object_types=uncached_object_types,
        )
        self.action_space = spaces.MultiDiscrete(
            [len(self.actions_set) for _ in range(num_blue_agents)]
        )
        self.ac_dim = self.action_space.shape
