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
import os
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


def summarize_xplane(trace_dir: str, top: int = 5):
    """Op-level summary of a :func:`trace` capture (xplane protobufs).

    Parses the device timeline with the installed ``xprof`` converter and
    returns a dict with the observed totals the SOL record needs:

    * ``total_device_ms`` — sum of per-op self time on the device
    * ``bound_by`` — {resource: fraction of device time} as classified by
      the profiler's per-op roofline (VMEM Read/Write, HBM, Compute, ...)
    * ``top_ops`` — the ``top`` largest ops by self time: name, category,
      fraction, the profiler's bound-by label, and the framework source
      line the op was traced from

    Returns None if no xplane file exists or xprof is unavailable — the
    caller records estimates-only in that case.
    """
    import glob
    import json as _json
    import re

    xs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True))
    if not xs:
        return None
    try:
        from xprof.convert import raw_to_tool_data as _rtd

        data, _ = _rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", {})
        d = _json.loads(data)
        rows = d.get("rows", [])
        if not rows:
            return None

        def v(r, i):
            return r["c"][i].get("v")

        # hlo_stats columns (xprof 2.21): 2=category, 3=op name,
        # 6=occurrences, 9=total self time (us), 21=bound by, 25=source
        # info (html-wrapped).  Parsing stays inside the try: a schema
        # shift in a future xprof must degrade to estimates-only, not
        # crash the caller after the measured run completed.
        total = sum(v(r, 9) for r in rows) or 1.0
        bound = {}
        for r in rows:
            bound[v(r, 21)] = bound.get(v(r, 21), 0.0) + v(r, 9)
        rows_s = sorted(rows, key=lambda r: -v(r, 9))
        top_ops = [
            {
                "op": v(r, 3),
                "category": v(r, 2),
                "occurrences": int(v(r, 6)),
                "time_fraction": round(v(r, 9) / total, 4),
                "bound_by": v(r, 21),
                "source": re.sub(r"<[^>]+>", "", str(v(r, 25))).strip(),
            }
            for r in rows_s[:top]
        ]
        return {
            "total_device_ms": round(total / 1e3, 3),
            "bound_by": {
                k: round(t / total, 4)
                for k, t in sorted(bound.items(), key=lambda kv: -kv[1])
            },
            "top_ops": top_ops,
        }
    except Exception:
        return None
