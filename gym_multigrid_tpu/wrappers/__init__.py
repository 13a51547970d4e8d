"""Observation wrappers (reference gym_multigrid/wrappers/)."""

from gym_multigrid_tpu.wrappers.toroid import ToroidObservation, toroid_obs_fn

__all__ = ["ToroidObservation", "toroid_obs_fn"]
