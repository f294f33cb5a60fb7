"""Mosaic capability + rate probes for a P-Net trunk megakernel.

Questions:
  A. Does in-kernel dot_general with a 3D rhs (einsum 'mk,kxb->mxb')
     compile, and at what rate for conv2-like shapes (m=16, k=90)?
  B. VPU broadcast-FMA rate on (W, B)-shaped bf16 tiles (conv1 candidate).
  C. Sublane stride-2 slicing (s2d) support.
  D. Chained per-tap 2D dots (m=cout, k=cin, n=B) rate.

Layout under test: planar batch-in-lanes (C, H, W, B): lanes=B=128,
sublanes=W.  Timing: forced execution (scalar fetch chain), slope between
two chain lengths.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128
DT = jnp.bfloat16


def timeit(name, jf, *args):
    try:
        out = jax.block_until_ready(jf(*args))
    except Exception as e:  # noqa
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None

    def chain(n):
        t0 = time.perf_counter()
        s = jnp.float32(0)
        a = args
        for _ in range(n):
            out = jf(*a)
            first = out[0] if isinstance(out, tuple) else out
            s = first[(0,) * first.ndim].astype(jnp.float32)
            a = (args[0] + s.astype(args[0].dtype) * 0,) + args[1:]
        float(s)
        return time.perf_counter() - t0

    chain(1)
    per = min((chain(5) - chain(2)) / 3 for _ in range(3))
    print(f"{name}: {per*1e3:7.2f} ms", flush=True)
    return per


rng = np.random.default_rng(0)

# ---- A: 3D-rhs dot at conv2 shapes --------------------------------------
# rhs (K=90, X2T, B), lhs (16, 90): one output row-strip of conv2.
X2T = 512
K2 = 90
xim = jnp.asarray(rng.normal(size=(K2, X2T, B)), DT)
w2 = jnp.asarray(rng.normal(size=(16, K2)), DT)


def k_dot3(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        w_ref[:], x_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(DT)


def dot3(x, w):
    return pl.pallas_call(
        k_dot3,
        out_shape=jax.ShapeDtypeStruct((16, X2T, B), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)


# reps inside the kernel to amortize grid/launch: loop R times
R = 32


def k_dot3r(x_ref, w_ref, o_ref):
    acc = jnp.zeros((16, X2T, B), jnp.float32)
    for i in range(R):
        acc += jax.lax.dot_general(
            w_ref[:], x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc.astype(DT)


def dot3r(x, w):
    return pl.pallas_call(
        k_dot3r,
        out_shape=jax.ShapeDtypeStruct((16, X2T, B), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)


# ---- B: VPU FMA rate ----------------------------------------------------
# conv1-ish: 27 taps x 10 cout broadcast FMAs on a (Wt, B) tile.
WT = 512
xv = jnp.asarray(rng.normal(size=(3, 8, WT + 8, B)), DT)
w1 = jnp.asarray(rng.normal(size=(10, 3, 3, 3)), jnp.float32)


def k_vpu(x_ref, o_ref):
    for co in range(10):
        acc = jnp.zeros((WT, B), jnp.float32)
        for c in range(3):
            for ky in range(3):
                for kx in range(3):
                    acc += float(np.float32(0.1 * (co + c + ky + kx))) * \
                        x_ref[c, ky, kx:kx + WT, :].astype(jnp.float32)
        o_ref[co] = acc.astype(DT)


def vpu(x):
    return pl.pallas_call(
        k_vpu,
        out_shape=jax.ShapeDtypeStruct((10, WT, B), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# ---- C: sublane stride-2 ------------------------------------------------
def k_s2(x_ref, o_ref):
    o_ref[:] = x_ref[0, 0, 0:2 * WT:2, :]


def s2(x):
    return pl.pallas_call(
        k_s2,
        out_shape=jax.ShapeDtypeStruct((WT, B), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


xs2 = jnp.asarray(rng.normal(size=(1, 1, 2 * WT + 8, B)), DT)

# ---- D: per-tap 2D dots (m=cout, k=cin-only) ----------------------------
# out (32, X2T*?, ...) — 2D dot where rhs is (K, B) per x: hopeless; instead
# 2D dot (32, 144) x (144, B) repeated X2T times is the per-pixel lower
# bound; probe one strip as (144, X2T*B) flat IF reshape works.


def k_dot2flat(x_ref, w_ref, o_ref):
    x = x_ref[:].reshape(K2, X2T * B)
    o_ref[:] = jnp.dot(w_ref[:], x, preferred_element_type=jnp.float32
                       ).astype(DT).reshape(16, X2T, B)


def dot2flat(x, w):
    return pl.pallas_call(
        k_dot2flat,
        out_shape=jax.ShapeDtypeStruct((16, X2T, B), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)


# ---- E: lane roll -------------------------------------------------------
def k_roll(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[0, 0, 0:WT, :], 1, 1)


def roll(x):
    return pl.pallas_call(
        k_roll,
        out_shape=jax.ShapeDtypeStruct((WT, B), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t = timeit("A  dot3 (16,90)x(90,512,128) single", jax.jit(dot3), xim, w2)
    tr = timeit(f"A' dot3 x{R} in-kernel", jax.jit(dot3r), xim, w2)
    if tr is not None:
        per = tr / R
        macs = 16 * K2 * X2T * B
        print(f"   per-dot {per*1e6:.0f} us -> {macs/per/1e12:.2f} TMAC/s "
              f"(padded-eff {128*128*X2T*B/per/1e12:.2f})", flush=True)
    tv = timeit("B  vpu 27x10 FMA strip", jax.jit(vpu), xv)
    if tv is not None:
        fma = 10 * 27 * WT * B
        print(f"   {fma/tv/1e12:.2f} TFMA/s", flush=True)
    timeit("C  sublane stride-2 slice", jax.jit(s2), xs2)
    timeit("D  reshape+dot2 flat", jax.jit(dot2flat), xim, w2)
    timeit("E  lane roll", jax.jit(roll), xs2)
