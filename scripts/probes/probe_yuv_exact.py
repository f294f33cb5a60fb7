#!/usr/bin/env python3
"""Reproduce the exact cv2/swscale yuv420p->bgr24 closed form (ops/yuv.py).

Method (2026-08-18, round 3): no encoder in this image can write chosen
YUV values losslessly, but an uncompressed I420 AVI can be synthesized
byte-by-byte (tests/rawavi.py) and cv2's own decoder hands the planes back
verbatim — so every one of the 16.7M (y,u,v) triples can be pushed through
cv2's actual converter.  One 512x512 frame per y value (a 256x256 grid of
2x2 blocks, block (v,u) carrying that chroma pair) covers the full cube in
256 frames.  Findings this script re-derives and verifies:

1. cv2's conversion is a pure per-pixel function of (y,u,v) with 2x2
   chroma replication (no interpolation) — block-consistency assert.
2. The function is additive with integer offsets: out_c =
   clip(q[y] + ju_c[u] + jv_c[v]) with a shared luma ramp q.
3. Every table has an exact fixed-point affine form (m*x + b) >> 16:
       q  = (76305*y  - 1219995) >> 16
       B  = clip(q + ((132193*u - 16920704) >> 16))
       G  = clip(q + ((-25673*u + 3286144) >> 16)
                   + ((-53281*v + 6819968) >> 16))
       R  = clip(q + ((104593*v - 13387904) >> 16))
   verified equal on all 16,777,216 inputs, and against the H.264
   fixture decode (0 mismatched bytes over sampled frames).

Classic-formula fits (BT.601/709 float or the legacy swscale table init)
do NOT reproduce this exactly — the empirical fit is what ships.

Runtime: ~2 min on the 1-core host, ~300 MB RAM.  Run from the repo root:
    python scripts/probes/probe_yuv_exact.py
"""

import sys

import numpy as np
import cv2

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from tests.rawavi import write_i420_avi  # noqa: E402

CONSTS = {
    "q": (76305, -1219995),
    "bu": (132193, -16920704),
    "gu": (-25673, 3286144),
    "gv": (-53281, 6819968),
    "rv": (104593, -13387904),
}


def learn_lut(tmp="/tmp/yuv_chunk.avi"):
    W = H = 512
    lut = np.zeros((256, 256, 256, 3), np.uint8)
    uplane = np.repeat(np.arange(256, dtype=np.uint8)[None, :], 256, 0)
    vplane = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 256, 1)
    uv = np.concatenate([uplane.ravel(), vplane.ravel()])
    for chunk in range(0, 256, 32):
        frames = []
        for y in range(chunk, chunk + 32):
            f = np.empty(W * H * 3 // 2, np.uint8)
            f[: W * H] = y
            f[W * H:] = uv
            frames.append(f)
        write_i420_avi(tmp, frames, W, H)
        cap = cv2.VideoCapture(tmp)
        for y in range(chunk, chunk + 32):
            ok, bgr = cap.read()
            assert ok
            sub = bgr[0::2, 0::2]
            if y % 64 == 0:  # pure-function check: all 4 block pixels equal
                assert np.array_equal(sub, bgr[1::2, 1::2])
                assert np.array_equal(sub, bgr[0::2, 1::2])
            lut[y] = sub.transpose(1, 0, 2)  # -> [u, v]
        cap.release()
        print(f"learned y {chunk}..{chunk+31}", flush=True)
    return lut


def closed_form(y, u, v):
    q = (CONSTS["q"][0] * y + CONSTS["q"][1]) >> 16
    b = q + ((CONSTS["bu"][0] * u + CONSTS["bu"][1]) >> 16)
    g = (q + ((CONSTS["gu"][0] * u + CONSTS["gu"][1]) >> 16)
         + ((CONSTS["gv"][0] * v + CONSTS["gv"][1]) >> 16))
    r = q + ((CONSTS["rv"][0] * v + CONSTS["rv"][1]) >> 16)
    return np.clip(np.stack([b, g, r], -1), 0, 255).astype(np.uint8)


def main():
    lut = learn_lut()
    yy, uu, vv = np.meshgrid(
        np.arange(256, dtype=np.int64), np.arange(256, dtype=np.int64),
        np.arange(256, dtype=np.int64), indexing="ij",
    )
    pred = closed_form(yy, uu, vv)
    bad = int((pred != lut).sum())
    print(f"closed form vs exhaustive LUT: {bad} mismatched bytes "
          f"of {lut.size}")
    assert bad == 0, "the shipped constants no longer match this cv2 build!"
    print("EXACT — ops/yuv.py constants verified against this cv2/FFmpeg.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
