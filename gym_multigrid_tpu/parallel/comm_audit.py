"""Collective-inventory audit of compiled sharded programs.

The weak-scaling claim (BASELINE.md: >=90% efficiency; SURVEY.md §5
"Distributed communication backend") rests on what actually crosses the
interconnect per step.  Prose claims rot; the compiled HLO doesn't.  This
module extracts every collective op (all-reduce / all-gather / all-to-all /
collective-permute / reduce-scatter, sync or async start/done form) from an
optimized XLA module, with operand shapes and byte counts, so tests can
assert the inventory (tests/test_comm_audit.py) and scripts can commit a
communication-volume model (artifacts/comm_volume.md).

Note on multiplicity: the inventory is *static* — an op inside a `while`
body (lax.scan) executes once per iteration.  Callers that model bytes/step
multiply by the known trip counts (e.g. num_epochs x num_minibatches for the
PPO update's grad all-reduces); the op records carry the surrounding
op_name metadata so loop membership is visible.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import numpy as np

__all__ = ["CollectiveOp", "collective_inventory", "audit_jitted"]

_KINDS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
)

# `%name = TYPE kind(...)` where TYPE is `f32[8,64]{...}` or a tuple of
# such.  Async collectives appear as `kind-start` (skip `-done`: same
# transfer, counted once).
_OP_RE = re.compile(
    r"=\s+(?P<type>\([^)]*\)|\S+)\s+"
    r"(?P<kind>" + "|".join(_KINDS) + r")(?P<async>-start|-done)?\(",
)
_SHAPE_RE = re.compile(r"(?P<dtype>[a-z][a-z0-9]{1,3})\[(?P<dims>[0-9,]*)\]")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}


@dataclass
class CollectiveOp:
    kind: str  # one of _KINDS
    shapes: list[tuple[str, tuple[int, ...]]]  # (dtype, dims) per operand
    bytes: int  # total result bytes (per executing device)
    op_name: str  # surrounding op_name metadata (loop membership visible)
    line: str = field(repr=False, default="")

    @property
    def max_elems(self) -> int:
        return max(
            (int(np.prod(d, dtype=np.int64)) for _, d in self.shapes),
            default=0,
        )


def _parse_shapes(type_str: str) -> list[tuple[str, tuple[int, ...]]]:
    out = []
    for m in _SHAPE_RE.finditer(type_str):
        dims = tuple(
            int(d) for d in m.group("dims").split(",") if d
        )
        out.append((m.group("dtype"), dims))
    return out


def collective_inventory(hlo_text: str) -> list[CollectiveOp]:
    """All collective ops in an optimized HLO module dump."""
    ops = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or m.group("async") == "-done":
            continue
        shapes = _parse_shapes(m.group("type"))
        nbytes = sum(
            _DTYPE_BYTES.get(dt, 4) * int(np.prod(dims, dtype=np.int64))
            for dt, dims in shapes
        )
        name = re.search(r'op_name="([^"]*)"', line)
        ops.append(
            CollectiveOp(
                kind=m.group("kind"),
                shapes=shapes,
                bytes=nbytes,
                op_name=name.group(1) if name else "",
                line=line.strip(),
            )
        )
    return ops


def audit_jitted(
    fn: Callable,
    args: Sequence[Any],
    in_shardings: Any = None,
    **jit_kwargs,
) -> tuple[list[CollectiveOp], str]:
    """Compile ``fn`` under jit and return (collective ops, hlo text)."""
    if in_shardings is not None:
        jit_kwargs["in_shardings"] = in_shardings
    jitted = jax.jit(fn, **jit_kwargs)
    hlo = jitted.lower(*args).compile().as_text()
    return collective_inventory(hlo), hlo
