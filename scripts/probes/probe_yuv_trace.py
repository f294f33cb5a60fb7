"""Per-op device attribution of the PACKED-I420 production frame step at 1080p
b128: jax.profiler trace around chained steps, parse the Chrome trace,
print top device ops.  Optionally dump the compiled HLO so fusion.N names
map to source lines (pass --hlo)."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

if __name__ == "__main__":
    from truely_tpu.config import DetectorConfig
    from truely_tpu.pipeline.detector import Detector, _frame_step_yuv

    print("devices:", jax.devices(), flush=True)
    B, H, W = 128, 1080, 1920
    cfg = DetectorConfig(frame_batch=B)
    det = Detector(cfg)
    dtype = jnp.dtype(cfg.compute_dtype)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2, W), np.uint8)))
    jax.block_until_ready(x)

    jf = jax.jit(partial(_frame_step_yuv, det.params, cfg=cfg, compute_dtype=dtype))

    if "--hlo" in sys.argv:
        txt = jf.lower(x).compile().as_text()
        with open("/tmp/yuvstep_hlo.txt", "w") as f:
            f.write(txt)
        print("wrote /tmp/yuvstep_hlo.txt", len(txt), flush=True)

    def chain(n):
        xi = x
        for _ in range(n):
            out = jf(xi)
            s = out.embedding[0, 0]
            xi = x ^ (s.astype(jnp.int32) % 2).astype(jnp.uint8)
        float(s)

    chain(2)  # compile + warm
    tdir = "/tmp/yuvstep_trace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    chain(6)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"wall for 6 chained steps: {wall*1e3:.1f} ms", flush=True)

    paths = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    ev = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        pid_ok = set()
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if "TPU" in str(e.get("args", {}).get("name", "")):
                    pid_ok.add(e["pid"])
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("pid") in pid_ok:
                ev.append(e)
    agg = {}
    for e in ev:
        name = e.get("name", "?")
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += e.get("dur", 0) / 1e3
        agg[name][1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    tot = sum(v[0] for v in agg.values())
    print(f"total device op time: {tot:.1f} ms over {len(ev)} events "
          f"(/6 steps = {tot/6:.1f} ms/step)")
    for name, (ms, n) in top:
        print(f"  {ms:9.2f} ms  x{n:4d}  {name[:90]}")
