"""Load the upstream reference package (read-only) for differential tests.

The reference needs a numpy-2 shim (``np.float_``) and an sb3 stub
(SURVEY.md §2.2/§4).  Tests that use this helper skip cleanly when the
reference checkout is absent.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference():
    """Import and return the reference ``gym_multigrid`` package, or None."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        return None
    import numpy as np

    if not hasattr(np, "float_"):
        np.float_ = np.float64
    if "stable_baselines3" not in sys.modules:
        stub = types.ModuleType("stable_baselines3")
        stub.PPO = object
        sys.modules["stable_baselines3"] = stub
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import gym_multigrid  # noqa: F401
    except Exception:
        return None

    # The reference registers the same gymnasium ids on import; put ours
    # back so gym.make keeps resolving to gym_multigrid_tpu entry points.
    import warnings

    import gym_multigrid_tpu

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gym_multigrid_tpu.register_envs()
    return gym_multigrid
