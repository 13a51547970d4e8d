"""Batched lockstep execution + mesh sharding (the layer the reference lacks)."""

from gym_multigrid_tpu.parallel.mesh import (
    batch_sharding,
    batch_tree_shardings,
    distributed_initialize,
    fold_in_axis,
    make_mesh,
    param_tp_shardings,
    replicated,
    shard_batch_tree,
)
from gym_multigrid_tpu.parallel.shard import sharded_rollout
from gym_multigrid_tpu.parallel.vector import (
    BatchedEnv,
    make_collect_batch,
    make_ctf_batch,
    make_maze_batch,
    make_wildfire_batch,
)

__all__ = [
    "BatchedEnv",
    "make_collect_batch",
    "make_ctf_batch",
    "make_maze_batch",
    "make_wildfire_batch",
    "make_mesh",
    "batch_sharding",
    "batch_tree_shardings",
    "shard_batch_tree",
    "param_tp_shardings",
    "replicated",
    "distributed_initialize",
    "fold_in_axis",
    "sharded_rollout",
]
