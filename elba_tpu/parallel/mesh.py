"""2D device mesh construction (the CommGrid equivalent).

The reference requires perfect-square process counts (main.cpp:430); we
support any count by factoring into the most-square (pr, pc) grid.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def grid_shape(n: int) -> Tuple[int, int]:
    """Most-square factorization pr x pc = n with pr <= pc."""
    pr = int(math.isqrt(n))
    while n % pr:
        pr -= 1
    return pr, n // pr


def make_mesh2d(devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    pr, pc = grid_shape(len(devices))
    arr = np.asarray(devices)[: pr * pc].reshape(pr, pc)
    return Mesh(arr, axis_names=("r", "c"))
