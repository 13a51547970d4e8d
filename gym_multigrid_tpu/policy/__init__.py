"""Scripted agent policies (host classes + in-graph compilation)."""

from gym_multigrid_tpu.policy.base import BaseAgentPolicy

__all__ = ["BaseAgentPolicy"]
