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

    frames: List[np.ndarray]        # raw frames, in order (BGR HWC uint8,
                                    # or packed I420 (H*3//2, W) when
                                    # ``frames_i420``); EMPTY in YUV mode
                                    # without host_frames
    frame_indices: List[int]        # global indices of the segment's frames
    sampled: np.ndarray             # (B, H, W, 3) uint8 padded, or packed
                                    # I420 (B, H*3//2, W) in YUV mode
    sampled_indices: List[int]      # global indices of valid sampled rows
    n_valid: int                    # number of valid rows in ``sampled``
    n_frames: int = 0               # total frames covered (== len(frames)
                                    # in BGR mode)
    frames_i420: bool = False       # True when ``frames`` holds packed
                                    # I420 pictures instead of BGR/RGB


# swscale tag values for which the on-device conversion (ops/yuv.py) is
# proven exact: untagged or BT.601-family colorspace, limited ("tv") or
# untagged range.  Anything else (bt709 tags, full range, >8-bit) falls
# back to cv2 decode — conservative, since cv2's own conversion ignores
# the colorspace tag, but bit-exactness beats the upload win.
_YUV_OK_SPACES = frozenset({"unknown", "bt470bg", "smpte170m"})
_YUV_OK_RANGES = frozenset({"unknown", "tv"})


def _probe_yuv(path: str, meta: "VideoMeta"):
    """Open a native yuv420p decode of ``path`` if the extension is built
    and the stream is eligible for the exact on-device conversion.
    Returns (videodec_module, handle) or None."""
    try:
        from truely_tpu.media import videodec
    except ImportError:
        return None
    try:
        hnd, w, h, _fn, _fd, _nb = videodec.open(path)
    except Exception:
        return None
    try:
        space, rng = videodec.colorinfo(hnd)
        if (
            videodec.pixfmt(hnd) == "yuv420p"
            and w == meta.width
            and h == meta.height
            and w % 2 == 0
            # H % 4, not just % 2: the packed-I420 (H*3//2, W) layout only
            # tiles the chroma planes into whole rows when H/4 is integral
            # (ops/yuv.i420_to_bgr's reshape requires it); e.g. a valid
            # 480x270 yuv420p stream must take the cv2 BGR path.
            and h % 4 == 0
            and space in _YUV_OK_SPACES
            and rng in _YUV_OK_RANGES
        ):
            return videodec, hnd
        videodec.close(hnd)
        return None
    except Exception:
        videodec.close(hnd)
        return None


class VideoReader:
    """Iterates decode segments with background prefetch.

    ``yuv=True`` requests native-YUV segments: frames decode through the
    first-party videodec extension straight into packed I420 staging
    buffers (half the bytes of BGR, no host colorspace conversion), and
    ``Segment.frames`` stays empty.  Callers that need host pixels (the
    annotated re-encode path) pass ``host_frames=True``: each segment then
    carries the packed I420 picture of EVERY frame (``frames_i420=True``)
    so the writer can re-encode without any host colorspace conversion at
    all — the consumer converts only the few frames it draws on.  Falls
    back to the cv2 BGR path (``yuv_active == False``) when the extension
    is missing or the stream is ineligible for the exact on-device
    conversion.
    """

    def __init__(self, path: str, *, rgb: bool = False, prefetch: int = 2,
                 yuv: bool = False, host_frames: bool = False):
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
        self._vd = _probe_yuv(path, self.meta) if yuv else None
        self.yuv_active = self._vd is not None
        # In YUV mode, also produce host BGR/RGB frames per segment (for
        # the annotated re-encode path) via the exact native conversion —
        # byte-identical to cv2's decode, ~2.7x faster than cv2's
        # decode+swscale on this host and the upload still halves.
        self._host_frames = host_frames and self.yuv_active

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
                    "capture rather than releasing under a live reader"
                )
                return
        self._cap.release()
        if self._vd is not None:
            vd, hnd = self._vd
            self._vd = None
            vd.close(hnd)

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

    def yuv_frames(
        self, sample_interval: int = 1
    ) -> Iterator[Tuple[int, Optional[np.ndarray]]]:
        """Iterate (frame_index, packed_i420) pairs to EOF (YUV mode only;
        packed is (H*3//2, W) uint8).  Frames whose index is not a multiple
        of ``sample_interval`` are decoded into a reused scratch buffer and
        yielded as (index, None) — the caller keeps an honest frame count
        without paying an allocation per discarded frame."""
        if not self.yuv_active:
            raise RuntimeError("yuv_frames() requires yuv_active")
        vd, hnd = self._vd
        rows, w = self.meta.height * 3 // 2, self.meta.width
        # Unsampled frames decode without exporting their planes (native
        # skip): inter-frame refs force the decode, but the ~1.5*W*H-byte
        # copy is pure waste for the 7/8 of frames the sampling law drops
        # at 1080p60 interval 8 (measured: scripts/probe_sample_decode.py).
        skip = getattr(vd, "skip", None)
        scratch = None if skip is not None else np.empty((rows, w), np.uint8)
        idx = 0
        while True:
            if idx % sample_interval == 0:
                buf = np.empty((rows, w), np.uint8)
                if not vd.read(hnd, buf):
                    return
                yield idx, buf
            elif skip is not None:
                if not skip(hnd):
                    return
                yield idx, None
            else:  # older extension without skip(): scratch-read
                if not vd.read(hnd, scratch):
                    return
                yield idx, None
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

        def yuv_producer():
            vd, hnd = self._vd
            h, w = self.meta.height, self.meta.width
            rows = h * 3 // 2
            host = self._host_frames
            # Without host_frames, unsampled frames never leave the
            # decoder: native skip() avoids their plane export entirely
            # (the score path's sample-only decode).
            skip = None if host else getattr(vd, "skip", None)
            try:
                scratch = (
                    None if skip is not None
                    else np.empty((rows, w), np.uint8)
                )  # unsampled frames (host mode / older extension)
                stack = np.zeros((batch, rows, w), np.uint8)
                cur_frames: List[np.ndarray] = []
                cur_idx: List[int] = []
                sampled_idx: List[int] = []

                def flush() -> bool:
                    nonlocal stack
                    if not cur_idx:
                        return True
                    ok = put(
                        Segment(
                            frames=list(cur_frames),
                            frame_indices=list(cur_idx),
                            sampled=stack,
                            sampled_indices=list(sampled_idx),
                            n_valid=len(sampled_idx),
                            n_frames=len(cur_idx),
                            frames_i420=host,
                        )
                    )
                    # the flushed Segment owns the buffer; stage a fresh one
                    stack = np.zeros((batch, rows, w), np.uint8)
                    cur_frames.clear()
                    cur_idx.clear()
                    sampled_idx.clear()
                    return ok

                idx = 0
                while not stop.is_set():
                    if idx % sample_interval == 0:
                        # decode straight into the staging row: zero-copy
                        buf = stack[len(sampled_idx)]
                        if not vd.read(hnd, buf):
                            break
                        sampled_idx.append(idx)
                        if host:
                            # a view — the Segment keeps ``stack`` alive
                            cur_frames.append(buf)
                    elif skip is not None:
                        if not skip(hnd):
                            break
                    else:
                        buf = (
                            np.empty((rows, w), np.uint8) if host else scratch
                        )
                        if not vd.read(hnd, buf):
                            break
                        if host:
                            cur_frames.append(buf)
                    cur_idx.append(idx)
                    idx += 1
                    if len(sampled_idx) == batch:
                        if not flush():
                            return
                flush()
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                put(None)

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
                            n_frames=len(cur_frames),
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

        t = threading.Thread(
            target=yuv_producer if self.yuv_active else producer, daemon=True
        )
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
