"""Vectorized sprite-bank renderer + matplotlib window."""

from gym_multigrid_tpu.render.tiles import (
    assemble,
    render_collect,
    render_ctf,
    render_maze,
    render_tile,
    render_wildfire,
)
from gym_multigrid_tpu.render.window import Window

__all__ = [
    "assemble",
    "render_collect",
    "render_ctf",
    "render_maze",
    "render_tile",
    "render_wildfire",
    "Window",
]
