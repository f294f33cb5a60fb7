#!/usr/bin/env python3
"""Where does the on-device I420->BGR conversion's time go?

bench.py's 1080p_yuv_ingest line measured the packed-ingestion step ~29%
slower than the BGR step (3,443 vs 4,830 video fps at b128) — ~42 ms/step
for an elementwise conversion whose memory-bound floor is ~3 ms
(reads 1.5 B/px + writes 3 B/px at HBM rate).  This probe times the
conversion alone and XLA variants of it.

Usage: timeout 560 python scripts/probes/probe_yuv_step.py
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import jax
import jax.numpy as jnp

from truely_tpu.utils.profiling import measure_forced

B, H, W = 128, 1080, 1920

_LUMA = (76305, -1219995)
_B_U = (132193, -16920704)
_G_U = (-25673, 3286144)
_G_V = (-53281, 6819968)
_R_V = (104593, -13387904)


def _aff(x, mb):
    return (x * mb[0] + mb[1]) >> 16


def split(packed):
    b, h32, w = packed.shape
    h = h32 * 2 // 3
    ch, cw = h // 2, w // 2
    y = packed[:, :h, :].astype(jnp.int32)
    u = packed[:, h: h + h // 4, :].reshape(b, ch, cw).astype(jnp.int32)
    v = packed[:, h + h // 4:, :].reshape(b, ch, cw).astype(jnp.int32)

    def up2(p):
        return jnp.broadcast_to(
            p[:, :, None, :, None], (b, ch, 2, cw, 2)
        ).reshape(b, h, w)

    return y, up2(u), up2(v)


def v_current(packed):
    from truely_tpu.ops.yuv import i420_to_bgr

    return i420_to_bgr(packed)


def v_u8stack(packed):
    """clip+cast each channel to uint8 BEFORE the stack."""
    y, u, v = split(packed)
    q = _aff(y, _LUMA)
    bb = jnp.clip(q + _aff(u, _B_U), 0, 255).astype(jnp.uint8)
    gg = jnp.clip(q + _aff(u, _G_U) + _aff(v, _G_V), 0, 255).astype(jnp.uint8)
    rr = jnp.clip(q + _aff(v, _R_V), 0, 255).astype(jnp.uint8)
    return jnp.stack([bb, gg, rr], axis=-1)


def v_planar(packed):
    """planar (B, 3, H, W) output (no minor-dim-3 layout)."""
    y, u, v = split(packed)
    q = _aff(y, _LUMA)
    bb = jnp.clip(q + _aff(u, _B_U), 0, 255).astype(jnp.uint8)
    gg = jnp.clip(q + _aff(u, _G_U) + _aff(v, _G_V), 0, 255).astype(jnp.uint8)
    rr = jnp.clip(q + _aff(v, _R_V), 0, 255).astype(jnp.uint8)
    return jnp.stack([bb, gg, rr], axis=1)


def v_planar_then_transpose(packed):
    return jnp.transpose(v_planar(packed), (0, 2, 3, 1))


def v_f32(packed):
    """float path (VPU f32): same >>16 via floor division semantics is NOT
    exact for negatives in float — this is a TIMING variant only."""
    y, u, v = split(packed)
    y = y.astype(jnp.float32)
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    q = jnp.floor((76305.0 * y - 1219995.0) * (1.0 / 65536.0))
    bb = q + jnp.floor((132193.0 * u - 16920704.0) * (1.0 / 65536.0))
    gg = (q + jnp.floor((-25673.0 * u + 3286144.0) * (1.0 / 65536.0))
          + jnp.floor((-53281.0 * v + 6819968.0) * (1.0 / 65536.0)))
    rr = q + jnp.floor((104593.0 * v - 13387904.0) * (1.0 / 65536.0))
    out = jnp.stack([bb, gg, rr], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def main():
    rng = np.random.default_rng(0)
    packed = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8))
    )

    def tap(out):
        return out[0, 0, 0] if out.ndim == 3 else out.reshape(-1)[0]

    def mix(arg, t):
        return arg.at[0, 0, 0].set(t.astype(arg.dtype))

    gb = (B * H * W * 1.5 + B * H * W * 3) / 1e9
    for name, fn in [
        ("current (int32 stack last)", v_current),
        ("u8-per-channel stack last", v_u8stack),
        ("planar (B,3,H,W)", v_planar),
        ("planar + transpose", v_planar_then_transpose),
        ("f32 math (timing only)", v_f32),
    ]:
        jfn = jax.jit(fn)
        try:
            sec = measure_forced(jfn, packed, tap=tap, mix=mix)
            print(f"{name}: {sec*1000:.2f} ms/step  "
                  f"({gb/sec:.0f} GB/s effective)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
