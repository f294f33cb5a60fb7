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


def i420_to_bgr_host(packed: np.ndarray, *, rgb: bool = False) -> np.ndarray:
    """Host-side exact yuv420p -> BGR/RGB conversion of one I420 picture
    ((H*3//2, W) uint8 -> (H, W, 3) uint8).

    Byte-identical to cv2.VideoCapture's BGR decode of the same stream
    (it is the same closed-form integer function as the on-device
    ops/yuv.i420_to_bgr — see there for provenance); used to produce host
    frames for the annotated re-encode path when ingestion is native YUV.
    The numpy fallback computes the identical function (tested equal)."""
    rows, w = packed.shape
    h = rows * 2 // 3
    out = np.empty((h, w, 3), np.uint8)
    if _ext is not None and packed.flags["C_CONTIGUOUS"]:
        _ext.i420_to_bgr(packed, out, int(w), int(h), bool(rgb))
        return out
    y = packed[:h].astype(np.int32)
    u = packed[h: h + h // 4].reshape(h // 2, w // 2).astype(np.int32)
    v = packed[h + h // 4:].reshape(h // 2, w // 2).astype(np.int32)
    u = np.repeat(np.repeat(u, 2, 0), 2, 1)
    v = np.repeat(np.repeat(v, 2, 0), 2, 1)
    q = (76305 * y - 1219995) >> 16
    b = q + ((132193 * u - 16920704) >> 16)
    g = q + ((-25673 * u + 3286144) >> 16) + ((-53281 * v + 6819968) >> 16)
    r = q + ((104593 * v - 13387904) >> 16)
    chans = (r, g, b) if rgb else (b, g, r)
    out[...] = np.clip(np.stack(chans, axis=-1), 0, 255)
    return out


def bgr_to_rgb(frame: np.ndarray) -> None:
    """In-place BGR<->RGB channel swap."""
    if _ext is not None and frame.flags["C_CONTIGUOUS"]:
        _ext.bgr_to_rgb(frame)
        return
    frame[..., [0, 2]] = frame[..., [2, 0]]
