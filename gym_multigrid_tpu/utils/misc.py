"""Misc host utilities (reference: gym_multigrid/utils/misc.py:9-34)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 42) -> None:
    """Seed every host RNG the framework may touch.

    Mirrors the reference (misc.py:9-19: numpy, stdlib random, torch + cudnn
    knobs, PYTHONHASHSEED) and additionally nothing jax-side — jax RNG is
    explicit via keys, the TPU-native design has no hidden stream.
    torch seeding is applied only if torch is importable (it is an
    undeclared dependency upstream, SURVEY.md §2).
    """
    np.random.seed(seed)
    random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
        torch.cuda.manual_seed(seed)
        torch.backends.cudnn.deterministic = True
        torch.backends.cudnn.benchmark = False
    except ImportError:
        pass
    os.environ["PYTHONHASHSEED"] = str(seed)
    print(f"Random seed set as {seed}")


def save_frames_as_gif(frames, path: str = "./", filename: str = "collect-", ep: int = 0) -> None:
    """Write an episode's frames to ``<path><filename><ep>.gif``
    (reference misc.py:22-34; imageio writer instead of the imagemagick
    matplotlib backend, which is not installed in most environments)."""
    import imageio

    out = os.path.join(path, f"{filename}{ep}.gif")
    imageio.mimsave(out, [np.asarray(f, dtype=np.uint8) for f in frames], fps=60)
