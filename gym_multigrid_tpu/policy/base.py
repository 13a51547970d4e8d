"""Base scripted-policy class (reference: gym_multigrid/policy/base.py:12-42)."""

from __future__ import annotations

import enum
from abc import ABC, abstractmethod
from typing import Type, TypeVar

import numpy as np
from numpy.random import Generator

AgentPolicyT = TypeVar("AgentPolicyT", bound="BaseAgentPolicy")
ObservationT = TypeVar("ObservationT")


class BaseAgentPolicy(ABC):
    """Host-side scripted agent policy.

    Matches the reference surface: ``name``, ``action_set``,
    ``random_generator`` (defaults to a fresh ``np.random.default_rng()``;
    envs rebind it to their own ``np_random`` at construction, reference
    policy/base.py:35-39, envs/ctf.py:820-826).

    The TPU build additionally lets each concrete policy expose a *static
    spec* (``spec_kind``) so the env can compile an equivalent pure-JAX
    policy into the jitted step function; ``act`` remains available for
    host-side stepping and API parity.
    """

    # In-graph equivalent id; None => host-only policy (env falls back to
    # calling .act() on the host each step).
    spec_kind: str | None = None

    def __init__(
        self,
        action_set: Type[enum.IntEnum] | None = None,
        random_generator: Generator | None = None,
    ) -> None:
        super().__init__()
        self.name: str = "base"
        self.action_set: Type[enum.IntEnum] | None = action_set
        self.random_generator: Generator = (
            random_generator
            if random_generator is not None
            else np.random.default_rng()
        )

    @abstractmethod
    def act(self, observation: ObservationT, curr_pos=None) -> int: ...
