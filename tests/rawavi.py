"""Byte-level writer for uncompressed I420 AVI files.

Lets tests push *chosen* yuv420p pixel values through cv2's own
decoder+converter (no encoder in the image can do that: mp4v is lossy),
which is how the exact on-device conversion in ops/yuv.py is validated —
the YUV planes we write ARE the decoder's ground-truth output
(round-tripped exactly by both cv2 and the native videodec extension).
"""

import struct

import numpy as np


def write_i420_avi(path, frames, w, h, fps=30):
    """``frames``: list of flat (w*h*3//2,) uint8 planar I420 buffers."""
    n = len(frames)
    frame_bytes = w * h * 3 // 2

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(tag, payload):
        return chunk(b"LIST", tag + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), frame_bytes * fps, 0, 0x10,
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"I420", 0, 0, 0, 0, 1, fps, 0, n,
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 12, b"I420", frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(
        chunk(b"00dc", np.ascontiguousarray(f, np.uint8).tobytes())
        for f in frames
    ))
    payload = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(payload)) + payload)
