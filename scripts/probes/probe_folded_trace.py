"""Per-op device attribution for the folded P-Net trunk: capture a
jax.profiler trace around chained steps, parse the Chrome-format
trace.json.gz, and print top device ops by total time (the methodology
CLAUDE.md records: filter events whose pid maps to /device:TPU:0)."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np
import jax
import jax.numpy as jnp

from probe_folded import np_params, B, H, W, DT  # noqa: E402

if __name__ == "__main__":
    from truely_tpu.models.mtcnn_nets import apply_pnet_trunk_folded
    from truely_tpu.ops.fold import fold_width
    from truely_tpu.pipeline.mtcnn import PNET_FOLD, _normalize

    which = sys.argv[1] if len(sys.argv) > 1 else "folded"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    params = np_params()
    x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    jax.block_until_ready(x)

    if which == "folded":
        def fn(frames):
            prob, feat = apply_pnet_trunk_folded(
                params, _normalize(fold_width(frames, PNET_FOLD)), W,
                fold=PNET_FOLD, dtype=DT, precision=None,
            )
            return prob, feat
    else:
        from truely_tpu.models.mtcnn_nets import apply_pnet_trunk

        def fn(frames):
            prob, feat = apply_pnet_trunk(
                params, _normalize(frames), dtype=DT, precision=None
            )
            return prob, feat.astype(DT)

    jf = jax.jit(fn)

    def chain(n):
        xi = x
        s = jnp.float32(0)
        for _ in range(n):
            prob, _f = jf(xi)
            s = prob[0, 0, 0]
            xi = x + s.astype(jnp.uint8) * 0
        float(s)

    chain(2)  # compile + warm
    tdir = "/tmp/folded_trace_" + which
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
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]
    tot = sum(v[0] for v in agg.values())
    print(f"total device op time: {tot:.1f} ms over {len(ev)} events")
    for name, (ms, n) in top:
        print(f"  {ms:9.2f} ms  x{n:4d}  {name[:90]}")
