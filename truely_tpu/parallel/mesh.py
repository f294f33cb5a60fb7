"""Mesh construction helpers.

The reference has zero distributed execution (SURVEY.md §2.3); scaling here
is mesh-native: a 1-D/2-D ``jax.sharding.Mesh`` over ICI with XLA inserting
the collectives from sharding annotations (no NCCL/MPI translation).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default shape puts everything on 'data' (frame-batch DP — the natural
    axis for this workload, SURVEY.md §2.3) with 'model' = 1; pass an
    explicit shape for TP experiments (e.g. (2, 2) on 4 chips).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))
