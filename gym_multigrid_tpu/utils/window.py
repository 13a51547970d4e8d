"""Import-path parity shim: the reference exposes ``Window`` at
gym_multigrid/utils/window.py; ours lives with the rest of the rendering
stack in render/window.py."""

from gym_multigrid_tpu.render.window import Window

__all__ = ["Window"]
