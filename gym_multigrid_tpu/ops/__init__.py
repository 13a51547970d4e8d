"""Low-level jittable primitives (masked sampling, flat-grid access)."""

from gym_multigrid_tpu.ops.sampling import (
    get_flat,
    masked_uniform_choice,
    masked_uniform_choice_weighted,
    set_flat,
)

__all__ = [
    "get_flat",
    "masked_uniform_choice",
    "masked_uniform_choice_weighted",
    "set_flat",
]
