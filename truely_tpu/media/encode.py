"""Host-side video encode (annotated output, reference model.py:35-36,77).

The reference requests H.264 from cv2.VideoWriter; cv2's bundled FFmpeg
in this image has no usable H.264 encoder (h264_v4l2m2m fails to
configure, printing errors on every open) so cv2 degrades to mp4v.  The
first-party native writer (native/videoenc.cpp, libx264 via the SYSTEM
libavcodec) is preferred when built — actual H.264 output like the
reference asks for, at mp4v-comparable speed (15 ms/frame at 1080p,
ultrafast/crf 23) and far better quality per bit.  Falls back to the cv2
fourcc chain (avc1 → H264 → mp4v) when the extension isn't built.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import cv2

try:  # built by scripts/build_native.sh
    from truely_tpu.media import videoenc as _venc
except ImportError:
    _venc = None

_CODEC_PREFERENCE: Sequence[str] = ("avc1", "H264", "mp4v")


class VideoWriter:
    def __init__(self, path: str, fps: float, width: int, height: int,
                 *, preset: Optional[str] = None, crf: Optional[int] = None,
                 threads: Optional[int] = None,
                 slices: Optional[int] = None):
        """``preset``/``crf``/``threads``/``slices`` tune the native x264
        encoder (native writer only; the cv2 fallback ignores them) — the
        ladder scripts/bench_x264.py measures.  Defaults: ultrafast /
        crf 23 / auto frame-threads / no slicing."""
        self.path = path
        self._writer: Optional[cv2.VideoWriter] = None
        self._native = None
        self.codec: Optional[str] = None
        if (
            _venc is not None
            and width % 2 == 0
            and height % 2 == 0
            and float(fps) > 0
        ):
            try:
                # integer-rational fps (cv2 metadata reports float)
                fps_num, fps_den = (
                    (int(round(fps)), 1)
                    if abs(fps - round(fps)) < 1e-6
                    else (int(round(fps * 1001)), 1001)
                )
                self._native = _venc.open(
                    path, width, height, fps_num, fps_den,
                    preset or "ultrafast",
                    23 if crf is None else int(crf),
                    0 if threads is None else int(threads),
                    0 if slices is None else int(slices),
                )
                self.codec = "h264"
                return
            except Exception:
                self._native = None
        for codec in _CODEC_PREFERENCE:
            fourcc = cv2.VideoWriter_fourcc(*codec)
            w = cv2.VideoWriter(path, fourcc, fps, (width, height))
            if w.isOpened():
                self._writer = w
                self.codec = codec
                break
            w.release()
        if self._writer is None:
            raise IOError(f"no working video encoder for {path}")

    def write(self, frame: np.ndarray) -> None:
        if self._native is not None:
            _venc.write(self._native, np.ascontiguousarray(frame))
            return
        self._writer.write(frame)

    def write_i420(self, packed: np.ndarray) -> None:
        """Encode one packed (H*3//2, W) uint8 I420 picture.

        With the native writer the planes copy straight into the encoder
        frame — no colorspace conversion at all, so frames that were
        decoded as yuv420p and never annotated round-trip without the
        yuv→BGR→yuv loss (and without its CPU cost).  The cv2 fallback
        converts to BGR first (cv2.VideoWriter has no planar input)."""
        if self._native is not None:
            _venc.write_i420(self._native, np.ascontiguousarray(packed))
            return
        from truely_tpu.media.native import i420_to_bgr_host

        self._writer.write(i420_to_bgr_host(packed))

    def close(self) -> None:
        if self._native is not None:
            native, self._native = self._native, None
            _venc.close(native)
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        # Match the reference's empty-output detection (server/server.py:618).
        if not exc[0] and (not os.path.exists(self.path) or os.path.getsize(self.path) == 0):
            raise IOError(f"encoder produced empty output: {self.path}")
