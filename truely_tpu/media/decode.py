"""Host-side video decode into fixed-size sampled-frame batches.

TPUs have no video ASIC, so decode stays on the host (reference used
cv2.VideoCapture per frame inside the hot loop, server/model.py:23,42-45).
Here decode runs on a background thread that stays ahead of device compute,
yielding *segments*: the raw frames (needed for annotated re-encode) plus a
padded (B, H, W, 3) uint8 stack of the ~7 Hz-sampled frames ready for one
device step.  Frames come out BGR (cv2 convention) to preserve
reference-compat channel order; ``rgb=True`` flips for corrected mode.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np
import cv2


@dataclass(frozen=True)
class VideoMeta:
    width: int
    height: int
    fps: int           # int(cap.get(FPS)) — reference truncates (model.py:28)
    fps_exact: float
    frame_count: int   # container estimate; authoritative count comes from EOF


@dataclass
class Segment:
    """A contiguous chunk of the video covering one device batch."""

    frames: List[np.ndarray]        # raw frames, in order (BGR HWC uint8)
    frame_indices: List[int]        # global indices of ``frames``
    sampled: np.ndarray             # (B, H, W, 3) uint8, padded
    sampled_indices: List[int]      # global indices of valid sampled rows
    n_valid: int                    # number of valid rows in ``sampled``


class VideoReader:
    """Iterates decode segments with background prefetch."""

    def __init__(self, path: str, *, rgb: bool = False, prefetch: int = 2):
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise IOError(f"could not open video: {path}")
        self._rgb = rgb
        self._prefetch = prefetch
        self._active_stop: Optional[threading.Event] = None
        self._active_thread: Optional[threading.Thread] = None
        self.meta = VideoMeta(
            width=int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=int(self._cap.get(cv2.CAP_PROP_FPS)),
            fps_exact=float(self._cap.get(cv2.CAP_PROP_FPS)),
            frame_count=int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )
        if self.meta.width <= 0 or self.meta.height <= 0 or self.meta.fps <= 0:
            self._cap.release()
            raise IOError(
                f"invalid video properties: width={self.meta.width} "
                f"height={self.meta.height} fps={self.meta.fps}"
            )

    def close(self) -> None:
        # Stop any in-flight prefetch producer BEFORE releasing the
        # capture: cv2.VideoCapture is not safe against a concurrent
        # read()/release() (the error path closed the reader while the
        # producer thread could still be decoding).
        stop, t = self._active_stop, self._active_thread
        if stop is not None:
            stop.set()
        if t is not None and t.is_alive():
            t.join(timeout=10.0)
            if t.is_alive():
                # The producer is still blocked inside _cap.read(); releasing
                # now would recreate the concurrent read()/release() crash
                # this guard exists for.  Leak the capture instead — the
                # daemon thread plus process exit bounds it.
                import logging

                logging.getLogger(__name__).warning(
                    "decode producer did not exit within 10s; leaking the "
                    "cv2 capture rather than releasing under a live reader"
                )
                return
        self._cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------

    def frames(self) -> Iterator[Tuple[int, np.ndarray]]:
        """Iterate (frame_index, frame) pairs to EOF."""
        return self._decode_all()

    def _decode_all(self) -> Iterator[Tuple[int, np.ndarray]]:
        idx = 0
        while True:
            ret, frame = self._cap.read()
            if not ret:
                break
            if self._rgb:
                frame = frame[..., ::-1]
            yield idx, frame
            idx += 1

    def segments(
        self, sample_interval: int, batch: int
    ) -> Iterator[Segment]:
        """Yield segments where each contains exactly ``batch`` sampled
        frames (except the last, padded to ``batch``), decoding on a
        background thread so host decode overlaps device compute."""
        q: "queue.Queue[Optional[Segment]]" = queue.Queue(maxsize=self._prefetch)
        err: List[BaseException] = []
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone: a plain
            q.put deadlocked the producer forever (holding hundreds of MB
            of frames) whenever the consumer abandoned the generator on an
            error path."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                h, w = self.meta.height, self.meta.width
                cur_frames: List[np.ndarray] = []
                cur_idx: List[int] = []
                sampled: List[np.ndarray] = []
                sampled_idx: List[int] = []

                def flush() -> bool:
                    if not cur_frames:
                        return True
                    n_valid = len(sampled)
                    stack = np.zeros((batch, h, w, 3), np.uint8)
                    if n_valid:
                        # GIL-released native memcpy into the staging buffer
                        # (numpy fallback when the extension isn't built).
                        from truely_tpu.media import native

                        native.pack_frames(stack, sampled, list(range(n_valid)))
                    ok = put(
                        Segment(
                            frames=list(cur_frames),
                            frame_indices=list(cur_idx),
                            sampled=stack,
                            sampled_indices=list(sampled_idx),
                            n_valid=n_valid,
                        )
                    )
                    cur_frames.clear()
                    cur_idx.clear()
                    sampled.clear()
                    sampled_idx.clear()
                    return ok

                for idx, frame in self._decode_all():
                    if stop.is_set():
                        return
                    cur_frames.append(frame)
                    cur_idx.append(idx)
                    if idx % sample_interval == 0:
                        sampled.append(frame)
                        sampled_idx.append(idx)
                        if len(sampled) == batch:
                            if not flush():
                                return
                flush()
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        self._active_stop, self._active_thread = stop, t
        t.start()
        try:
            while True:
                try:
                    seg = q.get(timeout=0.5)
                except queue.Empty:
                    if not t.is_alive():
                        # The producer can flush its final Segment (and the
                        # None sentinel) and exit in the window between the
                        # get timeout expiring and this liveness check —
                        # drain before concluding EOF, or the last segment's
                        # frames silently vanish from the analysis.
                        while True:
                            try:
                                seg = q.get_nowait()
                            except queue.Empty:
                                break
                            if seg is None:
                                break
                            yield seg
                        break
                    continue
                if seg is None:
                    break
                yield seg
            t.join()
            if err:
                raise err[0]
        finally:
            # Generator closed early (consumer error/break) or finished:
            # unblock and retire the producer before the capture can be
            # released out from under it.
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.05)
            self._active_stop = self._active_thread = None
