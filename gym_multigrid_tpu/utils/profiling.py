"""Tracing / profiling helpers (SURVEY.md §5 — absent upstream).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (xplane) for any block of env/learner code.
* :func:`annotate` — ``jax.named_scope`` pass-through so step phases show
  up by name in traces.
* :func:`sol_report` — speed-of-light accounting for a batched env step:
  given measured throughput and the per-step HBM traffic of the state
  planes, report the bandwidth-bound ceiling and the achieved fraction.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax

#: Peak HBM bandwidth per chip, bytes/s (v5e ~819 GB/s; override per target).
HBM_BYTES_PER_S = {
    "v5e": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
}


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: ``with trace("/tmp/trace"): run(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for step phases (shows up in profiler timelines)."""
    return jax.named_scope(name)


@dataclass(frozen=True)
class SolEstimate:
    achieved_steps_per_s: float
    ceiling_steps_per_s: float
    sol_fraction: float
    bytes_per_step: int


def sol_report(
    env_steps_per_s: float,
    state_bytes: int,
    batch_size: int,
    chip: str = "v5e",
    rw_factor: float = 2.0,
) -> SolEstimate:
    """Bandwidth-bound speed-of-light for a lockstep env batch.

    ``state_bytes`` is the WHOLE batched state; one batched step must read
    and write it once (``rw_factor = 2``) — everything else should stay in
    VMEM (which the fused Pallas step achieves).  The SOL fraction compares
    measured batched-steps/s (= env_steps_per_s / batch_size) against
    ``bandwidth / (rw_factor * state_bytes)``.
    """
    bw = HBM_BYTES_PER_S.get(chip, HBM_BYTES_PER_S["v5e"])
    bytes_per_step = int(rw_factor * state_bytes)
    ceiling = bw / max(bytes_per_step, 1)
    batched_steps_per_s = env_steps_per_s / max(batch_size, 1)
    return SolEstimate(
        achieved_steps_per_s=batched_steps_per_s,
        ceiling_steps_per_s=ceiling,
        sol_fraction=batched_steps_per_s / ceiling,
        bytes_per_step=bytes_per_step,
    )


def state_nbytes(tree) -> int:
    """Total bytes of a (batched) state pytree."""
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(tree)
    )
