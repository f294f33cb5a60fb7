"""Static image-pyramid schedule.

The reference's MTCNN builds its pyramid dynamically per image (variable
number of scales, variable sizes) — poison for XLA.  Here the schedule is a
pure function of the *static* frame resolution and config, computed at trace
time in Python, so each resolution bucket compiles once with a fully
unrolled, fixed set of scales.
"""

from __future__ import annotations

from typing import List, NamedTuple


class PyramidLevel(NamedTuple):
    scale: float
    height: int
    width: int


def pyramid_schedule(
    height: int,
    width: int,
    min_face_size: int = 20,
    factor: float = 0.709,
) -> List[PyramidLevel]:
    """Scales and resampled sizes, matching the upstream loop exactly:
    scale_0 = 12/min_face_size, scale_{i+1} = scale_i * factor while
    min(h, w) * scale >= 12; level size = int(dim * scale + 1)."""
    m = 12.0 / min_face_size
    minl = min(height, width) * m
    scale = m
    levels = []
    while minl >= 12.0:
        hs = int(height * scale + 1)
        ws = int(width * scale + 1)
        levels.append(PyramidLevel(scale=scale, height=hs, width=ws))
        scale *= factor
        minl *= factor
    return levels
