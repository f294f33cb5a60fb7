"""Host-side video encode (annotated output, reference model.py:35-36,77).

Tries H.264 fourccs first (what the reference requests) and falls back to
mp4v where no H.264 encoder is present (e.g. this build container).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import cv2

_CODEC_PREFERENCE: Sequence[str] = ("avc1", "H264", "mp4v")


class VideoWriter:
    def __init__(self, path: str, fps: float, width: int, height: int):
        self.path = path
        self._writer: Optional[cv2.VideoWriter] = None
        self.codec: Optional[str] = None
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
        self._writer.write(frame)

    def close(self) -> None:
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
