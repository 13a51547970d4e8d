"""Device mesh + sharding helpers for multi-chip / multi-host runs.

The env batch is the data-parallel axis (SURVEY.md §2.4 P3): shard it over
'data'; the learner's weight matrices may additionally shard over 'model'
(tensor parallelism for a large policy net).  Collectives (grad psum, metric
reductions) are inserted by GSPMD from these sharding annotations and ride
ICI within a slice / DCN across hosts.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    assert n_devices % model_parallel == 0
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis 'data' sharding (env batch)."""
    return NamedSharding(mesh, P("data"))


def shard_batch_tree(tree: Any, mesh: Mesh) -> Any:
    """Shard every leaf's leading axis over 'data', rest replicated."""

    def spec(x):
        return NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec(x)), tree
    )


def batch_tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """Sharding pytree matching ``tree``: leading-axis 'data'."""

    def spec(x):
        return NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))

    return jax.tree_util.tree_map(spec, tree)


def param_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel shardings for an MLP/conv param tree.

    Kernels shard their output dim over 'model' when divisible — the last
    axis for both Dense (in, out) and Conv (kh, kw, cin, cout) kernels —
    everything else replicates.  GSPMD inserts the matching all-reduces.
    """
    tp = mesh.shape["model"]

    def spec(x):
        if x.ndim in (2, 4) and x.shape[-1] % tp == 0 and tp > 1:
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), "model")
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def opt_tp_shardings(opt_state: Any, mesh: Mesh) -> Any:
    """Shardings for an optimizer state matching :func:`param_tp_shardings`.

    Adam's mu/nu moments have the params' shapes, so the params' rule
    applies verbatim (one rule, one place — a drift between the two would
    silently reintroduce per-call moment resharding).  Without this the
    jitted step reshards the moments of tp-sharded kernels on every call.
    """
    return param_tp_shardings(opt_state, mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_initialize(**kwargs) -> None:
    """Multi-host bring-up: thin wrapper over jax.distributed.initialize.

    On a pod slice each host calls this before building the mesh; the env
    batch then spans all hosts' chips (process-local shards addressed by
    jax.local_devices()).  No-op if already initialized.

    The multi-process path is executed for real (N OS processes, one
    coordinator, gloo cross-process collectives as the DCN stand-in) by
    scripts/multihost_dryrun.py — run by tests/test_multihost.py on every
    suite run; committed records in artifacts/multihost_dryrun*.json show
    the sharded PPO train step matching a single-process run at the same
    global device count.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def fold_in_axis(key: jax.Array, axis_name: str) -> jax.Array:
    """Per-shard RNG derivation inside shard_map/pmap bodies."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
