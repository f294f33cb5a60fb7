"""Annotation overlay: red/green boxes + status text on flagged frames.

Reproduces the drawing of reference server/model.py:66-74: a red box with
"AI Detected - Frame N" (top-left, scale 1) once the run-length threshold
trips, else a green box with "Real Frame" above the face.  Drawing happens
only on sampled frames on the way to the encoder and is off the TPU hot
path by design (SURVEY.md §2.2 N4); rectangles come from cv2 when present
(pixel-identical look to the reference) and the native framepack extension
otherwise.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # headless minimal installs: native rectangles, no text
    cv2 = None

RED = (0, 0, 255)
GREEN = (0, 255, 0)
CYAN = (255, 255, 0)


def _order(color, rgb: bool):
    """Color constants above are BGR (cv2 convention); reverse for RGB
    frames (corrected-mode decode) so red boxes stay red after the
    RGB->BGR flip at encode time."""
    return color[::-1] if rgb else color


def draw_landmarks(
    frame: np.ndarray,
    landmarks_xy: np.ndarray,
    *,
    color=CYAN,
    radius: int = 1,
    rgb: bool = False,
) -> np.ndarray:
    """Draw 68-point landmarks (image coordinates) as dots (BASELINE
    config 2: landmark head + suspicious-frame rendering)."""
    color = _order(color, rgb)
    h, w = frame.shape[0], frame.shape[1]
    for x, y in landmarks_xy:
        xi, yi = int(x), int(y)
        if 0 <= xi < w and 0 <= yi < h:
            cv2.circle(frame, (xi, yi), radius, color, -1, cv2.LINE_AA)
    return frame


def _rect(frame, x1, y1, x2, y2, color):
    if cv2 is not None:
        cv2.rectangle(frame, (x1, y1), (x2, y2), color, 2)
    else:
        from truely_tpu.media import native

        native.draw_rect(frame, x1, y1, x2, y2, color, thickness=2)


def annotate_frame(
    frame: np.ndarray,
    box_xyxy,
    *,
    flagged: bool,
    frame_index: int,
    rgb: bool = False,
) -> np.ndarray:
    """Draw in place and return the frame.  ``rgb`` declares the frame's
    channel order (corrected-mode decode is RGB); colors are swapped so
    the rendered hue is identical either way."""
    red, green = _order(RED, rgb), _order(GREEN, rgb)
    x1, y1, x2, y2 = [int(v) for v in box_xyxy]
    if flagged:
        _rect(frame, x1, y1, x2, y2, red)
        if cv2 is not None:
            cv2.putText(
                frame, f"AI Detected - Frame {frame_index}", (10, 30),
                cv2.FONT_HERSHEY_SIMPLEX, 1, red, 2, cv2.LINE_AA,
            )
    else:
        _rect(frame, x1, y1, x2, y2, green)
        if cv2 is not None:
            cv2.putText(
                frame, "Real Frame", (x1, y1 - 10),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, green, 2, cv2.LINE_AA,
            )
    return frame
