"""Low-level jittable primitives (masked sampling, flat-grid access)."""

from gym_multigrid_tpu.ops.sampling import (
    get_flat,
    masked_uniform_choice,
    masked_uniform_choice_weighted,
    set_flat,
)

#: env families with a fused Pallas kernel path (ops/pallas_<family>.py)
_KERNEL_FAMILIES = frozenset({"collect", "ctf", "maze", "wildfire"})


def kernels_available(family: str) -> bool:
    """True if ``family`` has a fused Pallas kernel path."""
    return family in _KERNEL_FAMILIES


__all__ = [
    "get_flat",
    "kernels_available",
    "masked_uniform_choice",
    "masked_uniform_choice_weighted",
    "set_flat",
]
