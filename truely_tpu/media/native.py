"""Loader + numpy fallbacks for the native framepack extension.

``scripts/build_native.sh`` drops ``framepack*.so`` into this package; when
absent (fresh checkout), the numpy fallbacks keep everything working with
identical semantics (tested against each other in test_native.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

try:  # built by scripts/build_native.sh
    from truely_tpu.media import framepack as _ext  # type: ignore
except ImportError:
    try:
        import framepack as _ext  # type: ignore
    except ImportError:
        _ext = None

HAVE_NATIVE = _ext is not None


def pack_frames(dst: np.ndarray, frames: Sequence[np.ndarray],
                offsets: Sequence[int]) -> None:
    """Copy each HxWx3 uint8 frame into row ``offsets[i]`` of (B, H, W, 3)
    ``dst`` (the device-batch staging buffer)."""
    if _ext is not None:
        _ext.pack_frames(
            dst, [np.ascontiguousarray(f) for f in frames], list(offsets)
        )
        return
    for frame, off in zip(frames, offsets):
        dst[off] = frame


def draw_rect(frame: np.ndarray, x1: int, y1: int, x2: int, y2: int,
              color_bgr, thickness: int = 2) -> None:
    """Rectangle outline on an HxWx3 uint8 frame, clamped to the image."""
    h, w = frame.shape[0], frame.shape[1]
    b, g, r = (int(c) for c in color_bgr)
    if _ext is not None and frame.flags["C_CONTIGUOUS"]:
        _ext.draw_rect(frame, h, w, int(x1), int(y1), int(x2), int(y2),
                       b, g, r, int(thickness))
        return
    color = np.asarray([b, g, r], np.uint8)
    for t in range(thickness):
        o = t - thickness // 2
        ys, ye = y1 - o, y2 + o
        xs, xe = x1 - o, x2 + o
        cy_s, cy_e = max(0, ys), min(h - 1, ye)
        cx_s, cx_e = max(0, xs), min(w - 1, xe)
        if 0 <= ys < h and cx_s <= cx_e:
            frame[ys, cx_s:cx_e + 1] = color
        if 0 <= ye < h and cx_s <= cx_e:
            frame[ye, cx_s:cx_e + 1] = color
        if 0 <= xs < w and cy_s <= cy_e:
            frame[cy_s:cy_e + 1, xs] = color
        if 0 <= xe < w and cy_s <= cy_e:
            frame[cy_s:cy_e + 1, xe] = color


def bgr_to_rgb(frame: np.ndarray) -> None:
    """In-place BGR<->RGB channel swap."""
    if _ext is not None and frame.flags["C_CONTIGUOUS"]:
        _ext.bgr_to_rgb(frame)
        return
    frame[..., [0, 2]] = frame[..., [2, 0]]
