"""Can the per-step 3 ms input retile copy (copy.1847: u8 frames default
layout -> T(4,128) {2,3,1,0}) be removed by uploading frames in the
executable's preferred input layout (jax.experimental.layout)?

Measures the production frame step with (a) default device_put, (b)
device_put into Format(auto-resolved input layout), on the real chip.
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.config import DetectorConfig  # noqa: E402
from truely_tpu.pipeline.detector import Detector, _frame_step  # noqa: E402

B, H, W = 128, 1080, 1920


def timeit(jf, params, x):
    def chain(n):
        t0 = time.perf_counter()
        xi = x
        for _ in range(n):
            out = jf(params, xi)
            s = out.embedding[0, 0]
            xi = x ^ (s.astype(jnp.int32) % 2).astype(jnp.uint8)
        float(s)
        return time.perf_counter() - t0

    chain(2)
    return min((chain(5) - chain(2)) / 3 for _ in range(3))


if __name__ == "__main__":
    from jax.experimental.layout import Format, Layout

    cfg = DetectorConfig(frame_batch=B)
    det = Detector(cfg)
    dtype = jnp.dtype(cfg.compute_dtype)
    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, (B, H, W, 3), np.uint8)

    fn = partial(_frame_step, cfg=cfg, compute_dtype=dtype)
    jf = jax.jit(fn)
    x = jax.device_put(jnp.asarray(host))
    t_def = timeit(jf, det.params, x)
    print(f"default layout: {t_def*1e3:6.1f} ms/step", flush=True)

    # auto input layout: ask the compiler what it wants for arg 1
    jf2 = jax.jit(fn, in_shardings=(None, Format(Layout.AUTO)))
    lowered = jf2.lower(det.params, jnp.asarray(host))
    compiled = lowered.compile()
    fmts = compiled.input_formats
    args_fmts = fmts[0] if isinstance(fmts, tuple) else fmts
    frames_fmt = args_fmts[1]  # (params_pytree_fmt, frames_fmt)
    print("preferred frames format:", frames_fmt, flush=True)
    x2 = jax.device_put(jnp.asarray(host), frames_fmt)
    print("placed layout:", x2.format, flush=True)
    t_auto = timeit(compiled, det.params, x2)
    print(f"auto layout:    {t_auto*1e3:6.1f} ms/step", flush=True)
