"""Shared type aliases (reference: gym_multigrid/typing.py:6)."""

from __future__ import annotations

from typing import Any, TypeAlias

import jax
import numpy as np
from numpy.typing import NDArray

Position: TypeAlias = tuple[int, int] | NDArray[np.int_]
PRNGKey: TypeAlias = jax.Array
PyTree: TypeAlias = Any
